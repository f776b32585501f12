package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality, Sampling}

/** Semantics of the round-7 recipe operators: epoch-weighted source
 *  mixing (X65), unigram-LM quality scoring (X66), and the cross-doc
 *  repeated-window screen (X67). */
class MixQualityWindowsSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------ mixEpochs

  test("mixEpochs: integer epochs emit exactly floor(e) copies, 0-based epoch ids") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val out = Sampling.mixEpochs(df, lit(2.0), col("id"), "t1")
      .select("id", "epoch").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L),
      (3L, 0L), (3L, 1L)))
  }

  test("mixEpochs: zero epochs drops the source entirely") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Sampling.mixEpochs(df, lit(0.0), col("id"), "t1").count() == 0)
  }

  test("mixEpochs: fractional epochs converge to the weight, deterministically") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n = docs.count().toDouble
    val out = Sampling.mixEpochs(docs, lit(1.3), col("doc_id"), "t2")
    val c1 = out.count()
    // epoch 0 is every row; epoch 1 is a hash-random ~30% subset
    assert(math.abs(c1 / n - 1.3) < 0.06)
    assert(out.count() == c1) // pure function of the data
    // the fractional pass is a SUBSET draw, not a prefix: its ids are
    // exactly the ids a 0.3 hashSample with the same salt would keep
    val frac = out.filter(col("epoch") === 1).select("doc_id")
      .as[Long].collect().toSet
    val hs = Sampling.hashSample(docs, col("doc_id"), 0.3, "t2")
      .select("doc_id").as[Long].collect().toSet
    assert(frac == hs)
  }

  test("mixEpochs plan is narrow: no exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Sampling.mixEpochs(docs, lit(1.5), col("doc_id"), "t3")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // ----------------------------------------------- unigramSurprisal

  test("unigramSurprisal: digit-count weights, exact integer micro-mean") {
    // corpus counts: x appears 13 times (2 digits), y once (1 digit)
    val docs = Seq(
      (1L, "x x x x x x x x x x"),
      (2L, "x x x y")).toDF("doc_id", "text")
    val out = Quality.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc1: 10 tokens, all weight 2 -> mean 2.000000
    // doc2: 4 tokens, 3*2 + 1*1 = 7 -> floor(7e6/4) = 1750000
    assert(out == Seq((1L, 10L, 2000000L), (2L, 4L, 1750000L)))
  }

  test("unigramSurprisal: tokenization is lowered + whitespace, empties dropped") {
    val docs = Seq((1L, "  A  a\tA  "), (2L, "b")).toDF("doc_id", "text")
    val out = Quality.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc1: "a" x3 (1 digit), doc2: "b" x1
    assert(out == Seq((1L, 3L, 1000000L), (2L, 1L, 1000000L)))
  }

  // -------------------------------------------- repeatedWindowShare

  test("repeatedWindowShare: windows contaminated iff text recurs in >=2 docs") {
    val docs = Seq(
      (1L, "a b c d"), // windows: "a b c", "b c d"
      (2L, "b c d e"), // windows: "b c d", "c d e"
      (3L, "z z z")) // exactly one whole-text window
      .toDF("doc_id", "text")
    val out = Dedup.repeatedWindowShare(docs, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L)))
  }

  test("repeatedWindowShare: within-doc repetition alone is not contamination") {
    val docs = Seq(
      (1L, "m m m m m m"), // 4 windows, all "m m m", but only 1 doc
      (2L, "unrelated text here")).toDF("doc_id", "text")
    val out = Dedup.repeatedWindowShare(docs, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 0L, 0L), (2L, 1L, 0L, 0L)))
  }

  test("repeatedWindowShare: texts shorter than k keep a whole-text window") {
    val docs = Seq((1L, "short"), (2L, "short"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedWindowShare(docs, "doc_id", "text", 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // the two identical short docs contaminate each other's one window
    assert(out == Seq((1L, 1L, 1L, 1000000L), (2L, 1L, 1L, 1000000L),
      (3L, 1L, 0L, 0L)))
  }
}
