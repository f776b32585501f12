package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: kernel vs posting-join BM25 wall-clock at growing
 *  query-batch sizes (crossover measurement for PLANS/SURVEY). */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lexDir = graft.streaming.Streams.scratchDir("graft_probe_lex_")
    val lex = graft.operators.Retrieval.materializeLexicon(docs, "text", lexDir)
    val ranked = lex.termDf.orderBy(col("df").desc, col("t"))
      .limit(4096).collect().map(_.getString(0))
    val v = ranked.length
    def queries(nq: Int) = (0L until nq.toLong).map { q =>
      q -> (0 until 3).map(j => ranked(((q * 7 + j * 13) % v).toInt))
        .distinct.mkString(" ")
    }
    def time(f: => Long): Double = {
      val t0 = System.nanoTime; val n = f
      val s = (System.nanoTime - t0) / 1e9
      System.err.println(f"   rows=$n")
      s
    }
    for (nq <- Seq(10, 100, 1000)) {
      val qs = queries(nq)
      // measured: at nq=1000 the kernel form OOMs the driver during
      // planning/codegen (1000 explode arms) — not even a slow run
      val tk =
        if (nq >= 1000) "OOM(planning)"
        else scala.util.Try(time(graft.operators.Retrieval
          .bm25TopK(docs, "text", "doc_id", qs, 3).count()))
          .map(t => f"$t%7.2fs").getOrElse("  CRASH")
      val tp = time(graft.operators.Retrieval
        .bm25TopKPostings(docs, "text", "doc_id", lex, qs, 3).count())
      println(f"nq=$nq%5d  kernel=$tk  postings=$tp%7.2fs")
    }
    spark.stop()
  }
}
