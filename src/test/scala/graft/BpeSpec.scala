package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** X97 learned BPE tokenizer (round-10 item 2): train() must replay
 *  textbook BPE exactly — pinned against an independent in-spec
 *  reference implementation over word lists (no string-replace
 *  machinery shared with the operator), plus greedy-merge edge
 *  semantics, encode arithmetic, and train→encode determinism. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  // ---- independent reference implementation (lists, not strings)

  private def refMergeSeq(s: List[String], l: String,
      r: String): List[String] = {
    val b = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += s(i); i += 1 }
    }
    b.toList
  }

  private def refTrain(texts: Seq[String],
      n: Int): Seq[(String, String)] = {
    val words = texts
      .flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong)
    var segs: Map[List[String], Long] =
      words.toSeq.groupMapReduce(
        { case (w, _) => w.map(_.toString).toList })(_._2)(_ + _)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (acc.size < n && !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs if syms.size >= 2;
           Seq(a, b) <- syms.sliding(2))
        pc((a, b)) = pc.getOrElse((a, b), 0L) + c
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), _) = pc.toSeq
          .sortBy { case ((pl, pr), c) => (-c, pl, pr) }.head
        acc += ((l, r))
        segs = segs.toSeq
          .groupMapReduce({ case (s, _) => refMergeSeq(s, l, r) })(_._2)(_ + _)
      }
    }
    acc.toSeq
  }

  private def refEncode(text: String,
      merges: Seq[(String, String)]): List[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toList.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toList) {
        case (s, (l, r)) => refMergeSeq(s, l, r)
      }
    }

  // --------------------------------------------------------- cases

  private val sennrich = Seq(
    "low low lower", "newest newest newest widest", "low lowest")

  test("train replays textbook BPE: merge list equals the reference on two fixtures") {
    val df1 = sennrich.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    assert(Bpe.train(df1, "text", 8) === refTrain(sennrich, 8))
    val mixed = Seq("Hunting-huts; hug hugs hug!", "bug bugs hug hugging",
      "The 7 bugs hugged 77 bugs")
    val df2 = mixed.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    assert(Bpe.train(df2, "text", 10) === refTrain(mixed, 10))
  }

  test("merges are greedy left-to-right: aaa under (a,a) becomes [aa, a]") {
    val docs = Seq((1L, "aa aa aa aaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 1)
    assert(merges === Seq(("a", "a")))
    val out = Bpe.encode(docs, "text", "doc_id", merges).head()
    // words: aa→1, aa→1, aa→1, aaa→2 (aa,a), aaaa→2 (aa,aa)
    assert(out.getLong(1) === 5L)  // n_words
    assert(out.getLong(2) === 7L)  // n_bpe_tokens
    assert(out.getLong(3) === 2L)  // distinct: {aa, a}
  }

  test("encode counts match the reference per document; token-free docs encode to zeros") {
    val texts = Seq("the lowest newest low", "newest widest lower low low",
      "--- ;;; !!!", "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 6)
    assert(merges === refTrain(texts, 6))
    val got = Bpe.encode(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val enc = refEncode(t, merges)
      val nWords = "[a-z0-9]+".r.findAllIn(t.toLowerCase).size.toLong
      assert(got(i.toLong) ===
        ((nWords, enc.size.toLong, enc.distinct.size.toLong)),
        s"doc $i '$t' encoded $enc")
    }
    assert(got(2L) === ((0L, 0L, 0L)))
    assert(got(3L) === ((0L, 0L, 0L)))
  }

  test("chunking packs words at fixed BPE-token boundaries") {
    // merge (a,a): words aaaa→[aa,aa](2), aaa→[aa,a](2), b→[b](1)
    val docs = Seq((1L, "aaaa aaa b aaaa"), (2L, "b b")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 1)
    assert(merges === Seq(("a", "a")))
    // budget 4: doc 1 word-costs 2,2,1,2 → cum 2,4,5,7 → preceding
    // 0,2,4,5 → chunks 0,0,1,1; doc 2: costs 1,1 → chunk 0
    val got = Bpe.chunkByBpeTokens(docs, "text", "doc_id", merges, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      (1L, 0L) -> ((2L, 4L)), (1L, 1L) -> ((2L, 3L)),
      (2L, 0L) -> ((2L, 2L))))
  }

  test("encodeIds emits the reference symbol stream as ids: code points for chars, 255+min-step for merges") {
    val texts = Seq("the lowest newest low", "newest widest lower low", "?!")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 6)
    val ids = Bpe.vocabIds(merges)
    val expected = texts.zipWithIndex.flatMap { case (t, d) =>
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
        .flatMap(w => refEncode(w, merges))
        .zipWithIndex.map { case (sym, p) =>
          (d.toLong, p.toLong,
            if (sym.length == 1) sym.head.toInt else ids(sym))
        }
    }.toSet
    val got = Bpe.encodeIds(docs, "text", "doc_id", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
    assert(!got.exists(_._1 == 2L)) // token-free doc emits nothing
  }

  test("vocabIds keys on the merged string with a min-step tie-break") {
    // steps 3 and 4 both concatenate to "abcd" → id 255 + 3 = 258
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"), ("abc", "d"))
    assert(Bpe.vocabIds(merges) ===
      Map("ab" -> 256, "cd" -> 257, "abcd" -> 258))
  }

  test("training is deterministic and stops cleanly when pairs run out") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // only 2 distinct pairs exist; asking for 10 merges returns 2
    val m1 = Bpe.train(docs, "text", 10)
    val m2 = Bpe.train(docs, "text", 10)
    assert(m1 === m2)
    assert(m1 === Seq(("a", "b"), ("c", "d")))
  }

  test("boundary-fusion artifacts encode to the UNK id, never NULL") {
    // merge1 (a,b) [count 5]; merge2 ties (x,b)=(b,c)=3 → tie-break
    // picks (b,c), whose pattern `b␟c` tail-matches inside `ab␟c`:
    // "abc" fuses to ONE symbol that is no merge's concatenation
    val docs = Seq((1L, "ab ab ab ab xbc xbc xbc"), (2L, "abc"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 2)
    assert(merges === Seq(("a", "b"), ("b", "c")))
    val got = Bpe.encodeIds(docs, "text", "doc_id", merges)
      .filter(col("doc_id") === 2L).orderBy("pos")
      .collect().map(_.getInt(2)).toSeq
    assert(got === Seq(Bpe.UnkId))
  }

  // ------------------------------------ X104 fixed-length packing

  /** Plain-Scala reference packing: EOS-joined doc streams in id
   *  order, split into L-windows, per-window (n, first, last,
   *  positional checksum). */
  private def refPack(ids: Seq[(Long, Long, Int)], L: Int,
      eos: Int): Map[Long, (Long, Int, Int, Long)] = {
    val stream = ids.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, rows) => rows.sortBy(_._2).map(_._3) :+ eos
    }
    stream.zipWithIndex.groupBy(_._2 / L).map { case (s, w) =>
      s.toLong -> ((w.size.toLong, w.head._1, w.last._1,
        w.map { case (id, g) => (g % L + 1).toLong * id }.sum))
    }
  }

  test("packIdSequences matches the reference packing and its invariants") {
    // handcrafted id stream: 3 docs of 5, 3, 7 ids; L=4, eos=0
    val rows = Seq(
      (10L, 0L, 100), (10L, 1L, 101), (10L, 2L, 102), (10L, 3L, 103),
      (10L, 4L, 104),
      (20L, 0L, 200), (20L, 1L, 201), (20L, 2L, 202),
      (30L, 0L, 300), (30L, 1L, 301), (30L, 2L, 302), (30L, 3L, 303),
      (30L, 4L, 304), (30L, 5L, 305), (30L, 6L, 306))
    val ids = rows.toDF("doc_id", "pos", "token_id")
    val got = Bpe.packIdSequences(ids, "doc_id", 4, 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got === refPack(rows, 4, 0))
    // stream length = ids + one EOS per doc
    assert(got.values.map(_._1).sum === rows.size + 3L)
    // every window full except possibly the last
    val last = got.keys.max
    assert(got.filter(_._1 != last).values.forall(_._1 === 4L))
  }

  test("packing is invariant to the input's partitioning") {
    val rows = (0L until 50L).flatMap(d =>
      (0L until (d % 5 + 1)).map(p => (d, p, (d * 10 + p).toInt % 1000)))
    val base = rows.toDF("doc_id", "pos", "token_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.packIdSequences(df, "doc_id", 8, 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(run(base.repartition(13)) === run(base.repartition(1)))
  }

  // ------------------------------ X130 packed-sequence doc spans

  /** Plain-Scala reference spans: the same EOS-joined stream keyed by
   *  the owning doc (EOS belongs to the doc it terminates), grouped
   *  by (window, doc) → (first slot, token count). */
  private def refSpans(ids: Seq[(Long, Long, Int)], L: Int)
      : Set[(Long, Long, Long, Long)] = {
    val stream = ids.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (d, rows) => rows.sortBy(_._2).map(_ => d) :+ d
    }
    stream.zipWithIndex.groupBy { case (d, g) => (g / L, d) }
      .map { case ((s, d), w) =>
        (s.toLong, d, (w.map(_._2).min % L).toLong, w.size.toLong) }
      .toSet
  }

  test("packDocSpans matches the reference and tiles each window") {
    val rows = Seq(
      (10L, 0L, 100), (10L, 1L, 101), (10L, 2L, 102), (10L, 3L, 103),
      (10L, 4L, 104),
      (20L, 0L, 200), (20L, 1L, 201), (20L, 2L, 202),
      (30L, 0L, 300), (30L, 1L, 301), (30L, 2L, 302), (30L, 3L, 303),
      (30L, 4L, 304), (30L, 5L, 305), (30L, 6L, 306))
    val ids = rows.toDF("doc_id", "pos", "token_id")
    val got = Bpe.packDocSpans(ids, "doc_id", 4, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === refSpans(rows, 4))
    // doc 10 (5 ids + EOS) crosses the L=4 boundary: one span per
    // window, never a merged cross-window span
    assert(got.count(_._2 === 10L) === 2)
    // spans tile each window: starts ∪ lens partition [0, n_tokens)
    val packed = Bpe.packIdSequences(ids, "doc_id", 4, 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((s, n) <- packed) {
      val spans = got.filter(_._1 === s).toSeq.sortBy(_._3)
      assert(spans.map(_._4).sum === n)
      assert(spans.head._3 === 0L)
      for (Seq(a, b) <- spans.sliding(2) if spans.size >= 2)
        assert(b._3 === a._3 + a._4)
    }
  }

  test("packDocSpans is invariant to the input's partitioning") {
    val rows = (0L until 50L).flatMap(d =>
      (0L until (d % 5 + 1)).map(p => (d, p, (d * 10 + p).toInt % 1000)))
    val base = rows.toDF("doc_id", "pos", "token_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.packDocSpans(df, "doc_id", 8, 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sorted.toSeq
    assert(run(base.repartition(13)) === run(base.repartition(1)))
    assert(run(base.repartition(13)) === refSpans(rows, 8).toSeq.sorted)
  }

  // ----------------------- round-11: vocab-scale encode + training

  import graft.functions.BpeOps

  test("kernel encode equals the literal replace fold on tail-match fixtures") {
    // merge (b,c) tail-matches inside the fused `ab`; (a,a) resume
    // semantics on runs; a merge whose l is multi-char and a pattern
    // re-created by an earlier deletion in the SAME pass
    val fixtures = Seq(
      (Seq(("a", "b"), ("b", "c")), Seq("abc", "aabc", "abcbc", "babcb")),
      (Seq(("a", "a")), Seq("a", "aa", "aaa", "aaaa", "aaaaa", "baaab")),
      (Seq(("a", "a"), ("aa", "a")), Seq("aaaaaa", "aaaaaaa")),
      (Seq(("a", "b"), ("ab", "ab")), Seq("abab", "ababab", "aabb")),
      (Seq(("b", "b"), ("a", "bb"), ("abb", "c")), Seq("abbc", "babbcb")))
    for ((merges, words) <- fixtures; w <- words) {
      val codec = new BpeOps.BpeCodec(merges)
      assert(BpeOps.encodeWord(w, codec) === BpeOps.foldLiteral(w, codec),
        s"word '$w' under $merges")
    }
  }

  test("kernel encode equals the literal replace fold on randomized trained vocabularies") {
    val rnd = new scala.util.Random(421L)
    for (trial <- 0 until 40) {
      // small alphabets force dense pair collisions and tail-matches
      val alpha = "ab0" + ("cdefg".take(rnd.nextInt(3)))
      val corpus = Seq.fill(30 + rnd.nextInt(40))(
        Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length)))
          .mkString)
      val merges = Bpe.trainLocal(
        corpus.groupBy(identity).map { case (w, g) =>
          (w.map(_.toString).mkString(Bpe.Sep), g.size.toLong) }.toArray,
        4 + rnd.nextInt(20))
      val codec = new BpeOps.BpeCodec(merges)
      val probes = corpus ++ Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(16))(alpha(rnd.nextInt(alpha.length)))
          .mkString)
      for (w <- probes)
        assert(BpeOps.encodeWord(w, codec) === BpeOps.foldLiteral(w, codec),
          s"trial $trial word '$w' under $merges")
    }
  }

  test("kernel Column path equals the nested-replace fold Column path") {
    val texts = Seq("the lowest newest low", "newest widest lower low",
      "ab ab ab ab xbc xbc xbc abc", "aaa aaaa aa")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 8)
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val viaKernel = docs.select(col("doc_id"),
        Bpe.encodeTokens(toks, merges).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaFold = docs.select(col("doc_id"),
        transform(toks, t => Bpe.encodeTokenFold(t, merges)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaKernel === viaFold)
  }

  test("indexed trainer: merge sequences equal the reference fold on randomized vocabularies") {
    // the round-12 incremental trainer (pair-occurrence index + lazy
    // max-heap) must be sequence-equal to the naive full-recount
    // fold, including count ties (small alphabets force them) and
    // tail-match artifacts
    val rnd = new scala.util.Random(1231L)
    for (trial <- 0 until 40) {
      val alpha = "ab0" + ("cdefg".take(rnd.nextInt(4)))
      val corpus = Seq.fill(30 + rnd.nextInt(60))(
        Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length)))
          .mkString)
      val table = corpus.groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).mkString(Bpe.Sep), g.size.toLong) }.toArray
      val n = 4 + rnd.nextInt(24)
      assert(Bpe.trainLocalIndexed(table.clone(), n) ===
        Bpe.trainLocal(table.clone(), n), s"trial $trial")
    }
    // exhaustion parity: both stop at the same point past the stock
    val tiny = Array(("a" + Bpe.Sep + "b", 3L), ("b" + Bpe.Sep + "a", 2L))
    assert(Bpe.trainLocalIndexed(tiny.clone(), 100) ===
      Bpe.trainLocal(tiny.clone(), 100))
  }

  test("driver-side and distributed training derive the same merge list") {
    val texts = Seq("low low lower", "newest newest newest widest",
      "low lowest", "ab ab ab ab xbc xbc xbc abc")
    val docs = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val local = Bpe.train(docs, "text", 12)
    val dist = Bpe.train(docs, "text", 12, driverFoldMaxWords = 0L)
    assert(local === dist)
  }

  test("vocab-scale: a >=1k-merge vocabulary trains driver-side and encodes through the fixed-size kernel") {
    // deliberately diverse random words: most merges bind few
    // occurrences, so the vocabulary supports >1000 merges
    val rnd = new scala.util.Random(97L)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val words = Seq.fill(1600)(
      Seq.fill(8 + rnd.nextInt(7))(alpha(rnd.nextInt(alpha.length)))
        .mkString).distinct
    val docs = words.grouped(8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 1200)
    assert(merges.size >= 1000, s"vocabulary exhausted at ${merges.size}")
    // the kernel path encodes the whole corpus under the 1.2k-merge
    // vocabulary in one projection (the nested-replace fold at this
    // merge count would overrun codegen's 64 KB method budget and an
    // analysis tree 1200 replaces deep)
    val codec = new BpeOps.BpeCodec(merges)
    val got = Bpe.encode(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val expected = docs.collect().map { r =>
      val enc = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
        .map(w => BpeOps.foldLiteral(w, codec))
      val syms = enc.flatMap(_.split(java.util.regex.Pattern.quote(Bpe.Sep), -1))
      r.getLong(0) -> ((syms.size.toLong, syms.distinct.size.toLong))
    }.toMap
    assert(got === expected)
    // ids stream too: every merged symbol resolves to a learned or UNK id
    val nIds = Bpe.encodeIds(docs, "text", "doc_id", merges)
      .filter(col("token_id") >= 256 || col("token_id") === Bpe.UnkId ||
        (col("token_id") >= 48 && col("token_id") < 128))
      .count()
    assert(nIds === expected.values.map(_._1).sum)
  }

  // ----------------------------- fertility + packing stats (X120/X121)

  test("fertilityByGroup: hand-checked integer ratios, zero-token NULL guard") {
    // merges (a,b),(ab,c): "abc" -> 1 token, "ab" -> 1, "ad" -> 2
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "g1", "abc abc"), // 2 words, 2 tokens, 7 chars
      (2L, "g1", "ab ad"),   // 2 words, 3 tokens, 5 chars
      (3L, "g2", "zzzz"),    // 1 word, 4 tokens (no merges apply), 4 chars
      (4L, "g3", "?!"))      // 0 alphabet words: NULL ratios
      .toDF("doc_id", "grp", "text")
    val got = Bpe.fertilityByGroup(docs, "text", "doc_id", "grp", merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    assert(got("g1") === ((2L, 4L, 5L, 12L, 1250000L, 2400000L)))
    assert(got("g2") === ((1L, 1L, 4L, 4L, 4000000L, 1000000L)))
    assert(got("g3") === ((1L, 0L, 0L, 2L, -1L, -1L)))
  }

  test("packingStats: fill arithmetic, full-window count, empty packing") {
    val packed = Seq((0L, 64L), (1L, 64L), (2L, 30L))
      .toDF("seq", "n_tokens")
    val got = Bpe.packingStats(packed, 64).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ===
      ((3L, 2L, 158L, 158L * 1000000L / 192L)))
    val empty = Bpe.packingStats(
      packed.filter(lit(false)), 64).collect().head
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2)) ===
      ((0L, 0L, 0L)) && empty.isNullAt(3))
  }

  test("packingStats agrees with a replayed q134 packing on the real corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 20 === 0)
    val merges = Bpe.train(docs, "text", 8)
    val packed = Bpe.packIdSequences(
      Bpe.encodeIds(docs, "text", "doc_id", merges), "doc_id", 64, 0)
    val got = Bpe.packingStats(packed, 64).collect().head
    val rows = packed.select(col("n_tokens")).collect().map(_.getLong(0))
    assert(got.getLong(0) === rows.length.toLong)
    assert(got.getLong(1) === rows.count(_ == 64L).toLong)
    assert(got.getLong(2) === rows.sum)
    assert(got.getLong(3) === rows.sum * 1000000L / (rows.length * 64L))
  }

  // ---- X135 decode + round-trip certificate (q161)

  test("decodeVocab inverts vocabIds, covers the base alphabet and UNK") {
    // steps 3 and 4 both concatenate to "abcd" → one id 258, so 259
    // must NOT exist in the inverse (no phantom ids)
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"), ("abc", "d"))
    val inv = Bpe.decodeVocab(merges)
    assert(inv(256) === "ab" && inv(257) === "cd" && inv(258) === "abcd")
    assert(!inv.contains(259))
    assert(inv(97) === "a" && inv(122) === "z" &&
      inv(48) === "0" && inv(57) === "9")
    assert(inv(Bpe.UnkId) === Bpe.UnkSym)
  }

  test("decodeRoundTrip: exact on UNK-free docs, counted loss on fusions") {
    // (b,c) tail-matches inside the fused `ab`: "abc" becomes ONE
    // artifact symbol with no learned id → UNK → certified lossy
    val merges = Seq(("a", "b"), ("b", "c"))
    val docs = Seq(
      (1L, "ab ab ab ab xbc xbc xbc"), // ab→[256], xbc→[x, bc] — exact
      (2L, "abc"),                     // boundary fusion → UNK
      (3L, "Hello, WORLD 42!"),        // normalization: helloworld42
      (4L, "??!!")                     // token-free: 0 ids, exact
    ).toDF("doc_id", "text")
    val got = Bpe.decodeRoundTrip(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got === Array(
      (1L, 10L, 0L, 17L, true),  // 4x[ab] + 3x[x,bc] = 10 ids
      (2L, 1L, 1L, 1L, false),   // one UNK decodes to "#": length 1 vs 3
      (3L, 12L, 0L, 12L, true),
      (4L, 0L, 0L, 0L, true)))
  }

  test("decodeRoundTrip on the real corpus: exact iff UNK-free") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val merges = Bpe.train(docs, "text", 12)
    val rows = Bpe.decodeRoundTrip(docs, "text", "doc_id", merges)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(2) == 0L),
        s"doc ${r.getLong(0)}: roundtrip_exact must hold iff n_unk == 0")
    }
  }

  // ---- X136 tokenizer at rest (q162)

  test("storeTokenizer/loadTokenizer: identity, fingerprint guard, idempotent re-store") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val merges = Bpe.train(docs, "text", 12)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tok_spec_").toString
    try {
      Bpe.storeTokenizer(spark, dir, merges, "fpA")
      // round-trip identity: order AND content
      assert(Bpe.loadTokenizer(spark, dir, Some("fpA")) === merges)
      // foreign fingerprint rejected, never silently re-keyed
      val err = intercept[IllegalArgumentException] {
        Bpe.loadTokenizer(spark, dir, Some("fpB"))
      }
      assert(err.getMessage.contains("different corpus"))
      // unguarded load (caller owns the pinning) still round-trips
      assert(Bpe.loadTokenizer(spark, dir) === merges)
      // idempotent re-store: overwrite with the same content
      Bpe.storeTokenizer(spark, dir, merges, "fpA")
      assert(Bpe.loadTokenizer(spark, dir, Some("fpA")) === merges)
      // encode through the LOADED list equals encode through the
      // trained list — the fidelity the judged row rides on
      val direct = Bpe.encode(docs, "text", "doc_id", merges)
        .orderBy("doc_id").collect().toSeq
      val loaded = Bpe.encode(docs, "text", "doc_id",
        Bpe.loadTokenizer(spark, dir, Some("fpA")))
        .orderBy("doc_id").collect().toSeq
      assert(loaded === direct)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}
