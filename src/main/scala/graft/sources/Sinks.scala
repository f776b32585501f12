package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Batch sink surface — the lake-layout counterpart of [[Sources]]
 * (SURVEY §2.2 H5 names only console/exit sinks; a real deployment
 * lands results back in the lake).
 *
 * `partitionBy` is the scale lever: writing fact tables partitioned
 * by a frequently-filtered low-cardinality column (lang, source,
 * date) turns later reads' filters into PARTITION PRUNING — the scan
 * never opens non-matching directories, which at 100 TB is the
 * difference between reading 1/50th of the data and all of it. The
 * spec asserts the pruned plan, not just the values. Formats: any
 * Spark DataSource (parquet default; orc/json/csv/xml tested —
 * Spark 4 bundles the XML source, `rowTag` via `options`).
 */
object Sinks {

  def write(df: DataFrame, path: String, format: String = "parquet",
      partitionCols: Seq[String] = Nil, mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format(format).mode(mode).options(options)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)
}
