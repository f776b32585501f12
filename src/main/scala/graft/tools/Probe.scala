package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch-pad main for plan inspection and quick experiments.
 *  Not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    println("schema: " + df.schema.simpleString)
    try println("pruned count: " +
      df.select("event_id").filter("event_id >= 0").count())
    catch { case e: Throwable =>
      println("PRUNED FAILS: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
