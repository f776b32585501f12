package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Cdc, Curation, Similarity}

/** Round-7 extension operators: text normalization (X59), URL/domain
 *  curation (X60), CDC merge (X61), int8-quantized ANN (X62). */
class NormalizeCdcSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------- X59 normalize

  test("normalizeText composes NFC, strips controls, collapses whitespace") {
    val dirty = " café \t niño \n  Åland  end "
    val out = Seq(dirty).toDF("t")
      .select(TextFunctions.normalizeText(col("t")).as("c"))
      .head().getString(0)
    // composed codepoints, single spaces, no controls, trimmed edges
    assert(out == "café niño Åland end",
      out.map(c => f"${c.toInt}%04x").mkString(","))
  }

  test("normalizeText is idempotent and a no-op on already-clean text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val once = docs.select(col("doc_id"),
      TextFunctions.normalizeText(col("text")).as("c"))
    val twice = once.select(col("doc_id"),
      TextFunctions.normalizeText(col("c")).as("c"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("NfcNormalize null flows through; \\t \\n \\r survive as collapse fodder") {
    val rows = Seq[(java.lang.Long, String)]((1L, null), (2L, "a\tb\nc\rd"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.normalizeText(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(1L).isEmpty)
    assert(rows(2L).contains("a b c d"))
  }

  // --------------------------------------------------- X80 html extract

  test("htmlToText drops script/style contents, strips tags, decodes entities") {
    val html = "<html><style>p {x}</style><script>if (1 < 2) alert(1)" +
      "</script><body><h1>Title</h1><p>a&nbsp;b &quot;q&quot; " +
      "&#39;s&#39; 5 &lt; 6 &amp; 7</p><br>tail</body></html>"
    val out = Seq(html).toDF("t")
      .select(TextFunctions.htmlToText(col("t")).as("c"))
      .head().getString(0)
    assert(out == "Title a b \"q\" 's' 5 < 6 & 7 tail", out)
  }

  test("htmlToText: a </style> inside script text does not leak script code") {
    // the common document.write('<style>…</style>') idiom: with a
    // mixed <(script|style)>…</(script|style)> pattern the inner
    // close tag would terminate the script block early and leak
    // the trailing JS into the text
    val out = Seq("<script>document.write('<style>x</style>')</script>ok")
      .toDF("t").select(TextFunctions.htmlToText(col("t")).as("c"))
      .head().getString(0)
    assert(out == "ok", out)
  }

  test("htmlToText: &amp;lt; single-decodes to literal &lt;, never to <") {
    // &amp; decodes LAST, so the pre-decoded &lt; fragment must
    // survive as text — the single-pass contract
    val out = Seq("<p>x &amp;lt; y</p>").toDF("t")
      .select(TextFunctions.htmlToText(col("t")).as("c"))
      .head().getString(0)
    assert(out == "x &lt; y", out)
  }

  // --------------------------------------------------- X81 C4 line clean

  test("c4LineClean applies each rule; survivors keep document order") {
    val doc = Seq(
      "A first proper sentence stays.",
      "Home | About | Contact",              // no terminal punctuation
      "Nice!",                               // < 3 words
      "this page uses Lorem Ipsum filler.",  // lorem ipsum (ci)
      "if (x) { return; }",                  // brace
      "And a second proper sentence stays?").mkString("\n")
    val out = Seq(doc).toDF("t")
      .select(graft.operators.Curation.c4LineClean(col("t"), 3).as("c"))
      .head().getString(0)
    assert(out == "A first proper sentence stays.\n" +
      "And a second proper sentence stays?", out)
  }

  // ----------------------------------------------------- X60 url/domain

  test("domainStats extracts registered domains and honors the blocklist") {
    val df = Seq(
      (1L, "see https://www.a.example.com/x and http://b.example.com/y"),
      (2L, "also https://www.a.example.com/z plus https://spam.bad.net/p"),
      (3L, "no urls here")).toDF("doc_id", "text")
    val out = Curation.domainStats(df, "text", "doc_id", Seq("bad.net"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // example.com: 3 urls over docs {1, 2}; bad.net blocked away
    assert(out == Set(("example.com", 3L, 2L)))
  }

  test("domainStats blocklist rides a broadcast anti join") {
    val df = Seq((1L, "https://x.keep.org/a")).toDF("doc_id", "text")
    val plan = Curation.domainStats(df, "text", "doc_id", Seq("drop.org"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  // -------------------------------------------------------- X61 CDC merge

  private lazy val cdcBase = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")

  test("applyChanges: latest-wins update, delete, insert, untouched") {
    val changes = Seq(
      // two competing updates for key 1 — seq 12 must win
      (1L, 11L, "u", Option("old"), Option(11.0)),
      (1L, 12L, "u", Option("new"), Option(12.0)),
      // delete key 2; a LATER delete also beats an earlier update
      (2L, 21L, "u", Option("zombie"), Option(0.0)),
      (2L, 22L, "d", Option.empty[String], Option.empty[Double]),
      // insert a fresh key 9
      (9L, 1L, "u", Option("ins"), Option(90.0))
    ).toDF("k", "seq", "op", "s", "v")
    val out = Cdc.applyChanges(cdcBase, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "new", 12.0),  // latest update applied
      (3L, "c", 30.0), (4L, "d", 40.0), // untouched base rows
      (9L, "ins", 90.0))) // insert; key 2 deleted
  }

  test("applyChanges reduces the log with a hash agg, never a window sort") {
    val changes = Seq((1L, 1L, "u", "x", 1.0)).toDF("k", "seq", "op", "s", "v")
    val plan = Cdc.applyChanges(cdcBase, changes, "k", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by") || plan.contains("HashAggregate"), plan)
  }

  test("an empty change log returns base unchanged") {
    val changes = Seq.empty[(Long, Long, String, String, Double)]
      .toDF("k", "seq", "op", "s", "v")
    val out = Cdc.applyChanges(cdcBase, changes, "k", "seq", "op")
    assert(out.exceptAll(cdcBase).isEmpty && cdcBase.exceptAll(out).isEmpty)
  }

  // --------------------------------------------------------- X62 sq8 ANN

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("sq8 code formula: floor(x*127 + 0.5), negatives included") {
    val out = Seq((0L, Seq(0.9999f, -0.9999f, 0.004f, -0.004f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(expr("transform(embedding, " +
        "x -> cast(floor(cast(x as double) * 127.0D + 0.5D) as double))").as("q"))
      .head().getSeq[Double](0)
    // round-half-up toward +inf on both signs (the floor(+0.5) form):
    // -0.004·127 = -0.508 sits below the -0.5 midpoint → code -1
    assert(out == Seq(127.0, -127.0, 1.0, -1.0, 0.0))
  }

  test("sq8TopK with exhaustive rerank equals exact knnBrute") {
    // k·rerank ≥ corpus ⇒ the candidate cut keeps everything and the
    // exact re-rank IS brute force — the approximation collapses to
    // exact by construction
    val n = emb.count().toInt
    val exact = Similarity.knnBrute(emb, 3, 5).orderBy("q_id", "rank").collect()
    val sq8 = Similarity.sq8TopK(emb, 3, 5, rerank = n / 5 + 1)
      .orderBy("q_id", "rank").collect()
    assert(sq8.toSeq == exact.toSeq)
  }

  // ------------------------------------------ X64 paragraph dedup

  test("dedupParagraphs keeps first corpus-wide occurrence, reassembles in order") {
    val docs = Seq(
      (1L, "body one\n\nFOOTER\n\nmore one"),
      (2L, "body two\n\nFOOTER"),
      (3L, "FOOTER\n\nbody three"),
      (4L, "FOOTER")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupParagraphs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // FOOTER's first occurrence is (doc 1, pos 1); everywhere else gone
    assert(out(1L) == "body one\n\nFOOTER\n\nmore one")
    assert(out(2L) == "body two")
    assert(out(3L) == "body three")
    assert(out(4L) == "") // fully-boilerplate doc collapses to empty
  }

  test("dedupParagraphs winner election shuffles hashes, not paragraph text") {
    val docs = Seq((1L, "a\n\nb")).toDF("doc_id", "text")
    val plan = graft.operators.Dedup.dedupParagraphs(docs, "text", "doc_id")
      .queryExecution.optimizedPlan.toString
    // the winner aggregate's grouping expressions must be the h60
    // hash, never the para string itself
    assert(plan.contains("Aggregate [h#") || plan.contains("Aggregate [h "), plan)
  }

  // ----------------------------------- X63 cosine threshold pairs

  test("losslessGridLevel: coarsest level whose cell width covers d·sqrt(dim)") {
    // tau=0.99, dim=64: d=0.1414, d·8=1.131, 8/1.131=7.07 → level 2
    assert(Similarity.losslessGridLevel(0.99, 64) == 2)
    // tau=0.5: d=1, d·8=8 → exactly one cell of width 8 → level 0
    assert(Similarity.losslessGridLevel(0.5, 64) == 0)
    // very tight threshold → finer cells
    assert(Similarity.losslessGridLevel(0.9999, 64) == 6)
    // the guarantee itself: w = 8/2^level ≥ d·sqrt(dim) at the chosen
    // level (unless clamped to 0)
    for (tau <- Seq(0.6, 0.9, 0.99, 0.999); dim <- Seq(16, 64)) {
      val lvl = Similarity.losslessGridLevel(tau, dim)
      val d = math.sqrt(2.0 - 2.0 * tau)
      if (lvl > 0)
        assert(8.0 / math.pow(2.0, lvl) >= d * math.sqrt(dim.toDouble),
          s"tau=$tau dim=$dim lvl=$lvl")
    }
  }

  test("cosineNearDupPairs equals the unpruned all-pairs result") {
    val aug = emb.unionByName(emb.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> " +
        "cast(cast(x as double) * (case when i = cast(vec_id % 64 as int) " +
        "then 2.0D else 1.0D end) as float))").as("embedding"),
      col("label")))
    // both configurations: loose/4-probe and the q91 tight/5-probe
    val pruned = Similarity.cosineNearDupPairs(aug, 64, 0.99, 4)
      .orderBy("id_a", "id_b").collect().toSeq
    val pruned5 = Similarity.cosineNearDupPairs(aug, 64, 0.999, 5)
      .orderBy("id_a", "id_b").collect().toSeq
    // brute force over the same corpus — the completeness check
    val e = aug.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorExpressions.dot(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (graft.functions.VectorExpressions.dot(col("va"), col("vb"))
          / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= 0.99)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(brute.nonEmpty, "fixture produced no qualifying pairs")
    assert(pruned == brute)
    val brute999 = brute.filter(_.getDouble(2) >= 0.999)
    assert(brute999.nonEmpty, "no pairs at the tight threshold")
    assert(pruned5 == brute999)
  }

  test("sq8TopK default rerank keeps high recall on the real corpus") {
    val exact = Similarity.knnBrute(emb, 8, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.sq8TopK(emb, 8, 5, rerank = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // deterministic data + deterministic quantization ⇒ a pinnable
    // bound; measured 1.0 at sf0.001, assert with headroom
    assert(recall >= 0.9, s"recall $recall")
  }
}
