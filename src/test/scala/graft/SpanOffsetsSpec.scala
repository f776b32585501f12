package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** X92 lossless span cuts (round-9 item 10): repeated spans as
 *  character offsets into the ORIGINAL text, and the apply step whose
 *  kept + cut slices reproduce the input byte-for-byte. */
class SpanOffsetsSpec extends SparkTestBase {

  import spark.implicits._

  private val k = 4

  test("token char offsets index the original text exactly — tabs, newlines, leading runs") {
    val text = " \talpha  Beta\ngamma\t\tDELTA epsilon "
    val offs = Dedup.tokenCharOffsets(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("tpos").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(offs.map(_._2).toSeq ===
      Seq("alpha", "Beta", "gamma", "DELTA", "epsilon"))
    for ((tpos, tok, s, e) <- offs) {
      assert(text.substring(s.toInt, e.toInt) === tok,
        s"token $tpos: [$s,$e) must slice to '$tok'")
    }
    // empty and whitespace-only docs produce no offset rows
    assert(Dedup.tokenCharOffsets(
      Seq((2L, ""), (3L, " \t\n")).toDF("doc_id", "text"),
      "text", "doc_id").count() === 0L)
  }

  test("vertical tab U+000B is a separator — the Java \\s set the oracle class mirrors") {
    // RE2's \s lacks VT; the oracle twin spells Java's set explicitly
    // ([ \t\n\f\r\x0B]) so a VT doc offsets identically cross-engine.
    // Pin the Spark side: VT separates tokens and counts in offsets.
    val text = "alpha\u000Bbeta \u000B gamma"
    val offs = Dedup.tokenCharOffsets(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("tpos").collect()
      .map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
    assert(offs.map(_._1).toSeq === Seq("alpha", "beta", "gamma"))
    for ((tok, s, e) <- offs)
      assert(text.substring(s.toInt, e.toInt) === tok)
  }

  test("spans cover the shared run in original casing; owner untouched") {
    val shared = "All Rights  RESERVED by the original author" // 7 tokens
    val docs = Seq(
      1L -> s"alpha beta gamma delta ${shared.toLowerCase}",
      2L -> s"epsilon zeta eta theta $shared iota kappa",
      3L -> "completely unrelated words here with nothing shared at all")
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpanOffsets(docs, "text", "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // the lowered keys matched across casing; only non-owner doc 2 is cut
    assert(spans.map(_._1).toSeq === Seq(2L))
    val (_, s, e, cut) = spans.head
    val t2 = s"epsilon zeta eta theta $shared iota kappa"
    assert(cut === shared, s"cut slice must be the ORIGINAL bytes: '$cut'")
    assert(t2.substring(s.toInt, e.toInt) === shared)
  }

  test("kept + cut slices interleave back to the input byte-for-byte") {
    val lic = "  Licensed UNDER the Apache License,  Version 2.0 see " +
      "the NOTICE file\tdistributed WITH this Work"
    val docs = Seq(
      10L -> s"alpha beta gamma delta$lic",
      11L -> s"own words first$lic then more trailing content here",
      12L -> s"$lic", // entirely the span (non-owner → fully cut)
      13L -> "nothing shared in this document at all truly")
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpanOffsets(docs, "text", "doc_id", k)
    val out = Dedup.cutCharSpans(docs, "text", "doc_id", spans)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    val originals = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val spanRows = spans.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc present; reconstruction: re-inserting each cut slice at
    // its recorded offset rebuilds the original exactly
    assert(out.keySet === originals.keySet)
    for ((id, (kept, cut)) <- out) {
      val ss = spanRows.filter(_._1 == id).sortBy(_._2)
      // removing the recorded spans from the original must give kept,
      // and their in-order concat must give cut — together the two
      // outputs partition the input's bytes exactly
      val expectedKept = {
        val b = new StringBuilder
        var pos = 0
        for ((_, s, e) <- ss) {
          b.append(originals(id).substring(pos, s.toInt)); pos = e.toInt
        }
        b.append(originals(id).substring(pos)); b.toString
      }
      val expectedCut =
        ss.map { case (_, s, e) => originals(id).substring(s.toInt, e.toInt) }
          .mkString
      assert(kept === expectedKept, s"doc $id kept mismatch")
      assert(cut === expectedCut, s"doc $id cut mismatch")
      assert(kept.length + cut.length === originals(id).length,
        s"doc $id must partition its bytes")
    }
    // the owner (lowest id, 10) keeps the license tail...
    assert(out(10L)._2 === "")
    // ...non-owners 11/12 lose exactly its token run (a span starts at
    // the first flagged token's first char, so lic's leading spaces
    // stay with the kept text), 13 is untouched
    assert(out(11L)._2 === lic.trim)
    assert(out(12L)._1.forall(_.isWhitespace))
    assert(out(13L) === ((originals(13L), "")))
  }

  test("oracle twin: identical spans and kept/cut text cross-engine shape") {
    // the SQL twin is exercised end-to-end by the driver (q121/q122);
    // here pin that the Spark chain is deterministic across runs
    val docs = Seq(
      1L -> "shared boiler plate text one two three unique a",
      2L -> "prefix shared boiler plate text one two three suffix",
      3L -> "shared boiler plate text one two three unique b")
      .toDF("doc_id", "text")
    val a = Dedup.repeatedSpanOffsets(docs, "text", "doc_id", k)
      .orderBy("doc_id", "s_char").collect().toSeq
    val b = Dedup.repeatedSpanOffsets(docs, "text", "doc_id", k)
      .orderBy("doc_id", "s_char").collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(0)).distinct === Seq(2L, 3L)) // doc 1 owns
  }
}
