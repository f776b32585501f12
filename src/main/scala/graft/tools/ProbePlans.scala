package graft.tools
import graft.SparkEntry
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"########## $name")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
