package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: computes EVERY column (count() would let Catalyst prune
    // the derived expressions away and bench nothing but the scan).
    def exhaust(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Untimed warmup: one cheap query through the full parquet-scan →
    // codegen → shuffle → noop-sink path, so the first TIMED query
    // measures the engine, not JVM/classloading/codegen-compiler
    // startup (which was billed to whichever query sorted first).
    try exhaust(SparkEntry.queries("q1_sum_fields")(spark, sfDir).limit(1000))
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // codec-path warmup (10 synthetic images): the FIRST touch of
    // javax.imageio/java.awt loads the plugin registry + color stack —
    // measured 4-5 s of one-time class init that otherwise lands on
    // whichever single query touches codecs first (q54), swamping its
    // actual per-record cost. Same classloading-startup category the
    // q1 warmup exists to exclude.
    try {
      val tiny = spark.range(10).selectExpr("id AS doc_id", "100 AS n_chars")
      exhaust(graft.multimodal.Media.extractFeatures(
        graft.multimodal.Media.imagesFromDocuments(tiny)).toDF())
    } catch { case e: Throwable => System.err.println(s"[bench] codec warmup failed: ${e.getMessage}") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { exhaust(fn(spark, sfDir)); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are self-contained: drop any intermediate a query
      // persisted so later queries aren't squeezed by stale cache
      // (the persist+compute cost stays inside the owning query's dt)
      spark.catalog.clearCache()
      // a failed query records sentinel -1.0 (never a plausible time)
      // and is excluded from the total, so it can't shrink the 2x gate
      name -> (if (ok) dt else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
