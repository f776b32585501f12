package graft.tools
import graft.SparkEntry

/** Dump `explain("formatted")` for named queries to files — the
 *  round-13 optimization-round evidence trail (plans/r13/<q>_<tag>.txt).
 *  Usage: runMain graft.tools.DumpPlans <outDir> <tag> <sfDir> q1,q2,...
 *  A query name of ALL dumps every declared query. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names: Seq[String] =
      if (args(3) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(',').toSeq
    new java.io.File(outDir).mkdirs()
    val spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        System.err.println(s"[plans] wrote ${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
