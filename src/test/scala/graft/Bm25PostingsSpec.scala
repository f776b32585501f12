package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.streaming.Streams

/** The two BM25 formulations must be RESULT-IDENTICAL: the kernel
 *  form folds every query term (absent terms add +0.0 — an IEEE
 *  no-op on the non-negative partials), the posting form folds only
 *  the shared terms in the same ascending-term order. Any divergence
 *  means the posting join dropped/duplicated a term or broke the
 *  fold order. */
class Bm25PostingsSpec extends SparkTestBase {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))

  test("posting-join batch form == TermCounts kernel form, scores bit-identical") {
    import spark.implicits._
    val corpus = (0L until 60L).map { i =>
      val extra = if (i % 4 == 0) " alpha alpha beta" else ""
      (i, s"common token$i filler gamma${i % 7} delta words here$extra")
    }.toDF("doc_id", "text")
    val queries = Seq(
      1L -> "alpha delta",
      2L -> "gamma3 common beta",
      3L -> "delta zzzmissing alpha", // OOV term: contributes nothing
      4L -> "common common filler")   // duplicate term collapses
    val dir = Streams.scratchDir("graft_bm25p_")
    val lex = Retrieval.materializeLexicon(corpus, "text", dir)
    val kernel = Retrieval.bm25TopK(corpus, "text", "doc_id", queries, 5)
      .collect().map(key).toSet
    val indexed = Retrieval.bm25TopKIndexed(corpus, "text", "doc_id",
      lex, queries, 5).collect().map(key).toSet
    val postings = Retrieval.bm25TopKPostings(corpus, "text", "doc_id",
      lex, queries, 5).collect().map(key).toSet
    assert(kernel === indexed)
    assert(postings === kernel,
      "posting-join form diverged from the kernel form")
    assert(kernel.nonEmpty)
  }
}
