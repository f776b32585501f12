package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
 * is one shuffle on the stratum key + a per-partition sort; at
 * extreme per-stratum cardinality swap the window for a size-n
 * per-partition heap aggregation — n is small by construction.
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
   *  pick total even under h60 ties). */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
      n: Int, salt: String): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(splitHash(salt, col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
