package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — the classic operator Spark has no
 * built-in for, composed from existing ops per the engine charter
 * (compose first; custom plans only when composition can't express
 * the semantics — here it can, optimally).
 *
 * For every left row, attach the payload of the right row with the
 * greatest rightTime ≤ leftTime within the same key (inclusive — the
 * semantics of DuckDB's `ASOF LEFT JOIN ... ON l.t >= r.t`, which is
 * the correctness oracle); NULL when no such row exists.
 *
 * Scale posture: this is deliberately NOT a range/cross join with a
 * per-row candidate scan. Both sides are unioned and shuffled ONCE on
 * the key; within each key partition a single ordered window pass
 * carries the latest snapshot forward (`last(..., ignoreNulls)` over
 * an unbounded-preceding frame). Cost is one shuffle + one sort —
 * O(n log n) rows, zero candidate blowup, and AQE-splittable on skewed
 * keys. This union-sort-carry shape is the standard large-scale
 * formulation of point-in-time correctness joins in feature-store
 * pipelines.
 */
object AsOf {

  /** Left as-of join. `right` must be unique on (keyCol, timeCol) —
   *  otherwise the payload picked at a tied timestamp is undefined.
   *  Ties between a left row and a snapshot at the SAME time are
   *  inclusive: the snapshot sorts first and is visible. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCol: String, outCol: String): DataFrame = {
    val pType = right.schema(payloadCol).dataType
    val l = left
      .withColumn(outCol, lit(null).cast(pType))
      .withColumn("__is_left", lit(1))
    val r = right
      .select(col(keyCol), col(timeCol), col(payloadCol).as(outCol))
      .withColumn("__is_left", lit(0))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol, last(col(outCol), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left")
  }
}
