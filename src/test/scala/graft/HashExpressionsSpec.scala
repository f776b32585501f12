package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, Hashing, TextFunctions}

/** The fused codegen kernels (H60Array / MinHashSig / SimHash32 /
 *  LangIdOf) must be bit-identical to the interpreted HOF
 *  formulations they replaced — asserted per-row on real testdata. */
class HashExpressionsSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private val h60Lambda = "cast(conv(substring(md5(s), 1, 15), 16, 10) as long)"

  test("H60Array ≡ transform(md5-conv) HOF, with and without mod") {
    val toks = TextFunctions.lowerTokens(col("text"))
    val rows = docs.select(
      HashExpressions.h60Array(toks).as("fused"),
      expr(s"transform(${"split(trim(lower(text)), '\\\\s+')"}, s -> $h60Lambda)").as("hof"),
      HashExpressions.h60Array(toks, Hashing.P).as("fused_mod"),
      expr(s"transform(split(trim(lower(text)), '\\\\s+'), s -> $h60Lambda % ${Hashing.P})").as("hof_mod"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("ShingleHashes ≡ sort_array(h60(distinct word-shingle strings))") {
    val cmp = docs.select(col("text"),
        TextFunctions.lowerTokens(col("text")).as("toks"))
      .select(
        HashExpressions.shingleHashes(col("text"), 3).as("fused"),
        sort_array(HashExpressions.h60Array(
          TextFunctions.wordShingles("toks", 3))).as("hof"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("ShingleHashes split-edge parity: tabs, leading/trailing ws, empty text") {
    import spark.implicits._
    val edgy = Seq("", "   ", "\tfoo bar", "foo bar\n", "a  b\t c", "one")
      .toDF("text")
    val cmp = edgy.select(col("text"),
        TextFunctions.lowerTokens(col("text")).as("toks"))
      .select(
        HashExpressions.shingleHashes(col("text"), 3).as("fused"),
        sort_array(HashExpressions.h60Array(
          TextFunctions.wordShingles("toks", 3))).as("hof"),
        HashExpressions.simhash32(col("text")).as("sh_fused"))
      .collect()
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("MinHashSig ≡ per-perm array_min over affine-permuted hashes") {
    val perms = 16
    val toks = TextFunctions.lowerTokens(col("text"))
    val cmp = docs.select(toks.as("toks"))
      .select(TextFunctions.wordShingles("toks", 3).as("sh"))
      .withColumn("hs", expr(s"transform(sh, s -> $h60Lambda % ${Hashing.P})"))
      .select(
        HashExpressions.minhashSig(
          HashExpressions.h60Array(col("sh")), perms).as("fused"),
        array((0 until perms).map(i => array_min(expr(
          s"transform(hs, h -> (${Hashing.permA(i)} * h + ${Hashing.permB(i)}) % ${Hashing.P})"))): _*).as("hof"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("MinHashSig on an empty array yields all-null elements (array_min parity)") {
    val r = spark.sql("SELECT array() ").toDF("e")
      .select(HashExpressions.minhashSig(col("e").cast("array<bigint>"), 4))
      .collect()(0).getSeq[Any](0)
    assert(r == Seq(null, null, null, null))
  }

  test("SimHash32 ≡ nested-HOF bit-majority formulation") {
    val hofSim =
      expr("aggregate(transform(sequence(0, 31), b -> " +
        "IF(aggregate(transform(split(trim(lower(text)), '\\\\s+'), " +
        s"t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as long)), 0L, " +
        "(acc, h) -> acc + ((shiftright(h, b) % 2) * 2 - 1)) > 0, " +
        "shiftleft(1L, b), 0L)), 0L, (acc, x) -> acc + x)")
    val rows = docs.limit(100).select(
      HashExpressions.simhash32(col("text")).as("fused"), hofSim.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SortedIntersectCount ≡ size(array_intersect) on sorted distinct arrays") {
    val withHs = docs.select(HashExpressions.shingleHashes(col("text"), 3).as("hs"),
      monotonically_increasing_id().as("i"))
    val a = withHs.select(col("hs").as("hs_a"), col("i"))
    val b = withHs.select(col("hs").as("hs_b"), (col("i") + 1).as("i"))
    val rows = a.join(b, "i").select(
      HashExpressions.sortedIntersectCount(col("hs_a"), col("hs_b")).as("fused"),
      size(array_intersect(col("hs_a"), col("hs_b"))).as("builtin"),
      HashExpressions.sortedIntersectCount(col("hs_a"), col("hs_a")).as("self"),
      size(col("hs_a")).as("sz")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
      assert(r.getInt(2) == r.getInt(3))
    }
  }

  test("langIdFast ≡ the HOF langId fold (first-wins argmax)") {
    val rows = docs.select(
      TextFunctions.langIdFast(col("text")).as("fused"),
      TextFunctions.langId(col("text")).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("property: byte-walking tokenizer ≡ split pipeline on random whitespace-heavy strings") {
    import spark.implicits._
    // adversarial generator: words, every ASCII whitespace char, unicode
    val rnd = new scala.util.Random(42)
    val pieces = Seq("foo", "Bar", "the", "der", "的", "a", "", " ", "\t",
      "\n", "", "\f", "\r", "  ", "x1", "é", "ABC")
    val strings = (0 until 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
    }.distinct
    val df = strings.toDF("text")
      .select(col("text"), TextFunctions.lowerTokens(col("text")).as("toks"))
    val rows = df.select(
      HashExpressions.shingleHashes(col("text"), 3).as("sh_fused"),
      sort_array(HashExpressions.h60Array(
        TextFunctions.wordShingles("toks", 3))).as("sh_hof"),
      TextFunctions.langIdFast(col("text")).as("lang_fused"),
      TextFunctions.langId(col("text")).as("lang_hof"),
      HashExpressions.simhash32(col("text")).as("sim_fused"),
      expr("aggregate(transform(sequence(0, 31), b -> " +
        "IF(aggregate(transform(split(trim(lower(text)), '\\\\s+'), " +
        "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as long)), 0L, " +
        "(acc, h) -> acc + ((shiftright(h, b) % 2) * 2 - 1)) > 0, " +
        "shiftleft(1L, b), 0L)), 0L, (acc, x) -> acc + x)").as("sim_hof"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"shingles: ${r.getString(6).map(_.toInt)}")
      assert(r.getString(2) == r.getString(3), s"lang: ${r.getString(6).map(_.toInt)}")
      assert(r.getLong(4) == r.getLong(5), s"simhash: ${r.getString(6).map(_.toInt)}")
    }
  }

  test("property: TokenCounts kernel ≡ split/regexp_extract_all formulations") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pieces = Seq("foo", "Bar9", "the", "的", "a", "", " ", "\t", "\n",
      "", "\f", "\r", "  ", "x1", "é", "ABC", "!?", ".", "--", "😀")
    val strings = Seq("", " ", "\t", "a b", " a ", "\ta\t") ++ (0 until 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
    }
    val rows = strings.distinct.toDF("text").select(
      graft.functions.TokenCounts(col("text")).as("tc"),
      TextFunctions.tokenCountWs(col("text")).cast("long").as("ws_re"),
      TextFunctions.tokenCountRegex(col("text")).cast("long").as("re_re"),
      col("text")).collect()
    rows.foreach { r =>
      val tc = r.getStruct(0)
      assert(tc.getLong(0) == r.getLong(1), s"tok_ws: ${r.getString(3).map(_.toInt)}")
      assert(tc.getLong(1) == r.getLong(2), s"tok_re: ${r.getString(3).map(_.toInt)}")
    }
  }

  test("TokenFrequencies ≡ explode + count of lowerTokens, globally and per doc") {
    import spark.implicits._
    val edgy = Seq("", " ", "\tfoo bar foo", "a A a  b", "one").toDF("text")
    for (df <- Seq(docs.select(col("text")), edgy)) {
      val fused = df
        .select(explode(HashExpressions.tokenFrequencies(col("text"))).as("tf"))
        .groupBy(col("tf.t").as("t")).agg(sum(col("tf.n")).as("n"))
      val exploded = df
        .select(explode(TextFunctions.lowerTokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("t")).agg(count(lit(1)).as("n"))
      assert(fused.except(exploded).isEmpty && exploded.except(fused).isEmpty)
    }
    // per-doc: struct list is token-sorted with exact counts
    val row = Seq("b a b  B c").toDF("text")
      .select(HashExpressions.tokenFrequencies(col("text")).as("tf"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(row.map(r => (r.getString(0), r.getLong(1))) == Seq("a" -> 1L, "b" -> 3L, "c" -> 1L))
  }

  test("SQL surface: json-scan, token-counts, and top-k aggregate registrations") {
    graft.core.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, """{"K": 5, "k": 7}""", "a b  c", 0.9),
        (1L, """{"x": 1}""", " ", 0.5),
        (2L, "nope", "", 0.7))
      .toDF("g", "js", "txt", "sim").createOrReplaceTempView("hx_sqlfns")
    val r = spark.sql(
      """SELECT g, graft_json_first_numeric(js, 'k') AS jn,
        |       graft_token_counts(txt) AS tc FROM hx_sqlfns ORDER BY g, jn
        |""".stripMargin).collect()
    // NULLS FIRST under ASC: g=1's missing-key row leads, then K=5
    // (case-insensitive forward scan), then g=2's malformed doc
    assert(r.map(x => Option(x.get(1))).toSeq == Seq(None, Some(5.0), None))
    assert(r.map(_.getStruct(2).getLong(0)).toSeq == Seq(1L, 3L, 1L))
    val agg = spark.sql(
      """SELECT g, graft_sim_top_k(sim, CAST(g AS BIGINT) + CAST(sim*10 AS BIGINT), 1) AS tk
        |FROM hx_sqlfns GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(agg.length == 2)
    assert(agg(0).getSeq[org.apache.spark.sql.Row](1).head.getDouble(0) == 0.9)
  }

  test("SQL surface: graft_simhash / graft_lang_id / graft_shingle_hashes ≡ Column DSL") {
    graft.core.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("hx_docs")
    val sql = spark.sql(
      """SELECT graft_simhash(text) AS sh, graft_lang_id(text) AS lang,
        |       graft_shingle_hashes(text, 3) AS hs,
        |       graft_minhash(text, 3, 16) AS sig
        |FROM hx_docs ORDER BY doc_id""".stripMargin).collect()
    val dsl = docs.orderBy("doc_id").select(
      HashExpressions.simhash32(col("text")).as("sh"),
      TextFunctions.langIdFast(col("text")).as("lang"),
      HashExpressions.shingleHashes(col("text"), 3).as("hs"),
      HashExpressions.minhashSig(
        HashExpressions.shingleHashes(col("text"), 3), 16).as("sig"))
      .collect()
    assert(sql.length == dsl.length && sql.nonEmpty)
    sql.zip(dsl).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getString(1) == b.getString(1))
      assert(a.getSeq[Long](2) == b.getSeq[Long](2))
      assert(a.getSeq[Long](3) == b.getSeq[Long](3))
    }
  }

  test("kernels run inside whole-stage codegen (no CodegenFallback in the plan)") {
    val exec = docs.select(
      HashExpressions.simhash32(col("text")),
      TextFunctions.langIdFast(col("text")))
      .queryExecution.executedPlan
    val hasWscg = exec.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWscg, s"expected a WholeStageCodegen stage in:\n$exec")
  }
}
