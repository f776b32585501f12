package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** X142 byte-level BPE with byte fallback: the round trip must be
 *  byte-exact on ANY input (the property q161's [a-z0-9] form cannot
 *  give), a boundary-fusion artifact must DECOMPOSE to byte ids
 *  instead of an UNK, and single-byte ids must BE the byte values. */
class BpeByteSpec extends SparkTestBase {

  import spark.implicits._

  private def mc(b: Int): String = (0x100 + b).toChar.toString

  private def run(texts: Seq[(Long, String)],
      merges: Seq[(String, String)]): Map[Long, (Long, Long, Long, Boolean)] =
    Bpe.byteRoundTrip(texts.toDF("doc_id", "text"), "text", "doc_id", merges)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("round trip is byte-exact on ANY input: emoji, CJK, controls, quotes, mixed case, empty") {
    val texts = Seq(
      0L -> "plain lowercase words",
      1L -> "MiXeD CaSe And PUNCT!?",
      2L -> "café 😀 日本語 Ünïcode",
      3L -> "tabs\tand\r\nCRLF and  vertical",
      4L -> "quotes ' \" and \\ backslash",
      5L -> "",
      6L -> "   ",
      7L -> "😀😀😀")
    val merges = Bpe.trainBytes(texts.toDF("doc_id", "text"), "text", 8)
    val got = run(texts, merges)
    for ((id, t) <- texts) {
      val (nIds, _, nBytes, exact) = got(id)
      assert(exact, s"doc $id must round-trip exactly")
      assert(nBytes === t.getBytes("UTF-8").length.toLong, s"doc $id bytes")
      assert(nIds <= nBytes, s"doc $id: merges only shrink the id stream")
      if (t.nonEmpty) assert(nIds >= 1L)
    }
  }

  test("a boundary-fusion artifact takes the BYTE FALLBACK: decomposed ids, still exact, counted") {
    // 'abc' → mapped A␟B␟C; merge 1 (A,B) → AB␟C; merge 2's pattern
    // B␟C then TAIL-MATCHES inside the fused symbol: AB␟C → ABC — a
    // symbol that is NO merge's concatenation (vocab holds AB and
    // BC), the one out-of-vocabulary case the fold can produce. The
    // [a-z0-9] form decodes it as UNK (q161 counts the loss); the
    // byte form must decompose it to the three byte ids and stay
    // EXACT.
    val (a, b, c) = (mc('a'), mc('b'), mc('c'))
    val merges = Seq((a, b), (b, c))
    val got = run(Seq(0L -> "abc"), merges)
    val (nIds, nFallback, nBytes, exact) = got(0L)
    assert(exact, "byte fallback must keep the round trip exact")
    assert(nFallback === 1L, "the fused symbol must be counted as fallback")
    assert(nIds === 3L && nBytes === 3L,
      "the artifact decomposes to its three byte ids")
  }

  test("single-byte ids ARE the byte values; merge ids are 255 + min step") {
    // vocabIds is shared with the [a-z0-9] form; byte ids occupy
    // 0–255 exactly, so the spaces are disjoint by construction
    val (x, y) = (mc('x'), mc('y'))
    val ids = Bpe.vocabIds(Seq((x, y)))
    assert(ids(x + y) === 256)
    val inv = Bpe.decodeVocabBytes(Seq((x, y)))
    assert(inv(97) === mc('a') && inv(0) === mc(0) && inv(255) === mc(255))
    assert(inv(256) === x + y)
  }

  test("trainBytes is deterministic and learns frequent byte pairs (incl. the attached leading space)") {
    val texts = (0L until 30L).map(i => i -> "the the the zz")
    val m1 = Bpe.trainBytes(texts.toDF("doc_id", "text"), "text", 4)
    val m2 = Bpe.trainBytes(texts.toDF("doc_id", "text"), "text", 4)
    assert(m1 === m2)
    // "the" appears with and without a leading space; 't'+'h' (or a
    // pair containing the mapped space) must surface early
    val syms = m1.map { case (l, r) => l + r }
    assert(syms.exists(s => s.contains(mc('t')) || s.contains(mc(' '))),
      s"learned merges look wrong: $m1")
  }
}
