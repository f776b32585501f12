package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers — the shuffle-ELIMINATION tool for repeated
 * large⋈large joins (broadcast covers small⋈large; AQE covers skew;
 * bucketing covers "both sides huge, joined every day on the same
 * key"). Writing both sides bucketed by the join key into `n` buckets
 * makes subsequent sort-merge joins read co-located buckets with NO
 * exchange on either side — at 100 TB this converts the dominant
 * recurring shuffle into a one-time write cost.
 *
 * Uses datasource (non-Hive) bucketing: bucket metadata lives in the
 * session catalog; on a cluster this would be a shared metastore.
 */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int): Unit =
    df.write
      .bucketBy(n, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: plans as a
   *  sort-merge join with ZERO Exchange operators. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
