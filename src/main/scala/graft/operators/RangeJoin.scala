package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval (range) join without a nested loop.
 *
 * Spark plans a bare non-equi condition (`p BETWEEN lo AND hi`) as a
 * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons and a
 * broadcast of one whole side, which is exactly what cannot run at
 * 100 TB. The standard scalable formulation: quantize the value
 * domain into fixed-width buckets, explode each interval into the
 * buckets it covers, equi-join points to intervals ON THE BUCKET
 * (hash-partitionable, AQE-splittable), then apply the exact range
 * predicate to the candidates. A point lives in exactly one bucket,
 * so every qualifying (point, interval) pair meets exactly once — no
 * dedup pass.
 *
 * `bucketWidth` trades shuffle fanout (intervals explode into
 * width/bucketWidth rows) against candidate precision (points share a
 * bucket with intervals they miss); set it near the typical interval
 * width so both stay O(1) per row.
 */
object RangeJoin {

  /** Inner join of `points` to `intervals` on
   *  loCol ≤ pointCol ≤ hiCol (closed bounds), bucketized. All three
   *  columns must be numeric; empty intervals (hi < lo) match
   *  nothing. Output: every column of both inputs, candidates
   *  verified exactly. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val iv = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
