package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/**
 * Deterministic sampling for training-data pipelines.
 *
 * Both operators key on a CONTENT hash (md5-derived [[Hashing.h60]]),
 * never on `rand()` or row position: the sample is a pure function of
 * the data, so it is identical across reruns, engines (DuckDB-oracle
 * verified), partitionings and cluster sizes — the property that makes
 * held-out splits and debug subsets trustworthy at 100 TB. Changing
 * `salt` draws an independent sample (e.g. train/val/test splits from
 * three salts).
 *
 * Scale posture: `hashSample` is a pure narrow filter (pushes below
 * everything Catalyst can move it past; no shuffle). `stratifiedCap`
 * selects winners with a bounded n-heap aggregation (map-side
 * partials; strata are typically FEW and HUGE, so a stratum-
 * partitioned rank window would sort each whole stratum on one
 * reducer) and keeps their rows via a broadcast-sized semi join —
 * the big side never sorts and never shuffles beyond the winner agg.
 */
object Sampling {

  private def splitHash(salt: String, key: Column): Column =
    Hashing.h60(concat(lit(salt), key.cast("string")))

  /** Keep a row iff h60(salt‖key) mod 10⁴ < rate·10⁴ — a deterministic
   *  Bernoulli(rate) sample with 0.01% rate granularity. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
      salt: String): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(splitHash(salt, keyCol) % 10000L < math.round(rate * 10000).toInt)
  }

  def hashSampleSqlPredicate(keyExpr: String, rate: Double, salt: String): String =
    s"${Hashing.h60Sql(s"'$salt' || CAST($keyExpr AS VARCHAR)")} % 10000 < ${math.round(rate * 10000)}"

  /** At most `n` rows per stratum, chosen in hash order (hash order ≡
   *  reshuffle-proof pseudo-random order; keyCol as tiebreak makes the
   *  pick total even under h60 ties — (hash, key) is unique per row,
   *  so the winner SET is identical to the rank-window formulation the
   *  oracle runs). Winners = k smallest (hash, key) pairs per stratum
   *  via [[graft.functions.TopKAggregate.longMinK]] (exact 64-bit
   *  compares; n×strata rows total), joined back broadcast-semi.
   *  `keyCol` must be integral (it rides the long tie slot). */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
      n: Int, salt: String): DataFrame = {
    val hashed = df.withColumn("__h", splitHash(salt, col(keyCol)))
    // winner columns are RENAMED before the join: both frames share a
    // lineage, and `hashed(c) === winners(c)` can silently resolve
    // both sides to the same attribute (Spark logs "trivially true
    // equals predicate") — here that was masked by (hash, key) being
    // globally unique, but a caller whose key repeats across strata
    // would get cross-stratum matches
    val winners = hashed
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopKAggregate.longMinK(
        col("__h"), col(keyCol).cast("long"), n).as("w"))
      .select(col(stratumCol).as("__ws"), explode(col("w")).as("e"))
      .select(col("__ws"), col("e.key").as("__wh"), col("e.tie").as("__wk"))
    hashed.join(
        broadcast(winners),
        col(stratumCol) === col("__ws") &&
          col("__h") === col("__wh") &&
          col(keyCol).cast("long") === col("__wk"),
        "left_semi")
      .drop("__h")
  }
}
