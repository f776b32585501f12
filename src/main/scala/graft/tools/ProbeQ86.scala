package graft.tools
import org.apache.spark.sql.functions._

/** Dev probe: posting volume of the q86 1000-query batch at an SF —
 *  Σ df(t) over the distinct query terms (the posting join's row
 *  count), to explain the sf0.1 > sf1 runtime inversion. */
object ProbeQ86 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Sources.table(spark, dir, "documents")
    val lex = graft.operators.Retrieval.materializeLexicon(
      docs, "text",
      java.nio.file.Files.createTempDirectory("probe_lex").toString)
    val ranked = lex.termDf.orderBy(col("df").desc, col("t"))
      .limit(4096).collect().map(r => (r.getString(0), r.getLong(1)))
    val v = ranked.length
    val qTerms = (0L until 1000L).flatMap { q =>
      (0 until 3).map(j => ((q * 7 + j * 13) % v).toInt)
    }.distinct.map(ranked)
    val nDocs = docs.count()
    val postings = qTerms.map(_._2).sum
    println(s"PROBE dir=$dir vocabTop=$v distinctQueryTerms=${qTerms.size} " +
      s"docs=$nDocs postingRows=$postings " +
      f"avgDfFrac=${postings.toDouble / qTerms.size / nDocs}%.4f")
    spark.stop()
  }
}
