package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** X91 cross-document repeated-span removal (the Lee et al. 2021
 *  exact-substring-dedup shape at fixed k-token granularity). */
class SpanDedupSpec extends SparkTestBase {

  import spark.implicits._

  private val k = 4

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Dedup.cutRepeatedSpans(rows.toDF("doc_id", "text"), "text", "doc_id", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a shared run is cut from non-owners, the owner keeps it") {
    val shared = "all rights reserved by the original author"  // 7 tokens > k
    val out = run(Seq(
      1L -> s"alpha beta gamma delta $shared",
      2L -> s"epsilon zeta eta theta $shared iota kappa lambda mu",
      3L -> "completely unrelated words here with nothing shared at all"))
    // owner (doc 1) keeps everything
    assert(out(1L) == ((11L, 0L, s"alpha beta gamma delta $shared")))
    // doc 2 loses EXACTLY the shared run, prefix and suffix survive
    assert(out(2L) == ((15L, 7L,
      "epsilon zeta eta theta iota kappa lambda mu")))
    // untouched doc: zero cut, text normalized (lowered, re-joined)
    assert(out(3L)._2 == 0L && out(3L)._3.startsWith("completely"))
  }

  test("two disjoint shared runs cut as two islands; overlaps merge") {
    val runA = "first shared legal notice text"
    val runB = "second shared footer boilerplate text"
    val out = run(Seq(
      1L -> s"$runA and also $runB",
      2L -> s"unique opening words then $runA more unique middle then $runB closing"))
    assert(out(1L)._2 == 0L)
    // both runs vanish from doc 2; everything between/around survives
    assert(out(2L)._3 ==
      "unique opening words then more unique middle then closing")
    assert(out(2L)._2 == 10L)
  }

  test("an exact duplicate document is fully cut to empty, never dropped") {
    val text = "this entire document is duplicated verbatim somewhere else"
    val out = run(Seq(1L -> text, 2L -> text,
      3L -> "a lone unrelated document body"))
    assert(out(1L)._3.nonEmpty, "owner keeps the canonical copy")
    assert(out(2L) == ((8L, 8L, "")), "copy is cut to empty, row kept")
    assert(out.contains(3L))
  }

  test("within-doc repetition alone is NOT cut (cross-doc only)") {
    val rep = "repeat me again and"
    val out = run(Seq(
      1L -> s"$rep $rep $rep something else entirely",
      2L -> "no overlap with the first document at all"))
    assert(out(1L)._2 == 0L, s"within-doc repeats must survive: ${out(1L)}")
  }
}
