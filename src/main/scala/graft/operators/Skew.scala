package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities for the 100 TB posture. AQE's skew-join
 * splitting (on by default in [[graft.core.GraftSession]]) handles
 * most cases at runtime; these are the EXPLICIT tools for the two
 * shapes AQE cannot fix:
 *
 *  - a hot GROUP BY key (AQE can't split one key's hash bucket):
 *    [[saltedAggregate]] does a two-phase aggregation through a
 *    random-salt pre-partial;
 *  - a hot JOIN key against a small-but-not-broadcastable side:
 *    [[saltedJoin]] salts the big side and EXPLODES the small side
 *    across all salts, so one hot key spreads over `salts` tasks.
 *
 * Salting uses a deterministic per-row hash (not rand()) so retries,
 * speculative tasks, and replays reproduce identical partitioning —
 * nondeterministic salting breaks exactly-once recovery semantics.
 */
object Skew {

  /** Deterministic salt in [0, salts) derived from the full row. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /**
   * Two-phase skew-proof aggregation:
   * `df.groupBy(key).agg(sum(valueCol))` with a salted pre-phase.
   * Phase 1 aggregates (key, salt) — the hot key's rows split over
   * `salts` reducers; phase 2 merges the ≤`salts` partials per key.
   */
  def saltedAggregate(df: DataFrame, keyCol: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))

  /**
   * Skew-proof equi-join of a big, skewed frame against a smaller
   * frame (too big to broadcast, small enough to replicate `salts`×):
   * big side gets a deterministic salt, small side is exploded across
   * every salt value, join key becomes (key, salt).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    // SHUFFLE_HASH pins the shuffled path: this operator exists for
    // the "too big to broadcast" regime, and letting the optimizer
    // broadcast a small test-scale side would leave the salting dead
    // code in the executed plan (a broadcast join has no reducer-side
    // skew to fix in the first place).
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
      .hint("SHUFFLE_HASH")
    saltedBig.join(replicated,
      saltedBig(bigKey) === replicated(smallKey) &&
        saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
