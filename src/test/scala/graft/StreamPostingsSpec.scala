package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Retrieval
import graft.streaming.Streams

/** X147: streaming postings-index maintenance. The drained index must
 *  serve BM25 bit-identical to the inline kernel over the same
 *  logical corpus (batch-boundary independence of every lexicon
 *  statistic), redelivery must replace rather than duplicate, and
 *  compaction must fold segments without changing a single score. */
class StreamPostingsSpec extends SparkTestBase {

  import spark.implicits._

  private val queries = Seq(1L -> "alpha bravo", 2L -> "charlie zzzmissing",
    3L -> "delta echo alpha")

  private def corpus(ids: Range): DataFrame =
    ids.map { i =>
      val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
        "foxtrot", "golf", "hotel")
      val text = (0 until 5 + i % 4)
        .map(j => words((i + j * (1 + i % 3)) % words.length))
        .mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")

  private def drain(indexDir: String, streamDir: String,
      compactAfter: Int): Unit = {
    val schema = spark.read.parquet(s"$streamDir/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = Streams.postingsIngest(stream, indexDir, "text", "doc_id",
        compactAfterSegments = compactAfter)
      .option("checkpointLocation", Streams.scratchDir("graft_post_ckpt_"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def results(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq

  test("drained index serves BM25 bit-identical to the inline kernel over the union corpus") {
    val all = corpus(0 until 60)
    val ixDir = Streams.scratchDir("graft_post_ix_")
    Retrieval.initPostingsIndexDir(ixDir, "fp-test")
    val streamDir = Streams.scratchDir("graft_post_in_")
    Streams.writeSinglePartFile(all.filter(col("doc_id") % 2 === 0),
      streamDir, "b0.parquet", 1600000000000L)
    Streams.writeSinglePartFile(all.filter(col("doc_id") % 2 === 1),
      streamDir, "b1.parquet", 1600000060000L)
    drain(ixDir, streamDir, compactAfter = 64)
    val fromIndex = results(Retrieval.bm25TopKFromIndex(
      spark, ixDir, queries, 4, expectFingerprint = Some("fp-test")))
    val inline = results(Retrieval.bm25TopK(all, "text", "doc_id",
      queries, 4))
    assert(fromIndex === inline)
    assert(fromIndex.nonEmpty)
    // the OOV term really scored as df = 0, not a crash
    assert(fromIndex.exists(_._1 == 2L),
      "the query with one OOV term must still rank on its known term")
  }

  test("re-drain under a fresh checkpoint replaces, never duplicates; compaction changes no score") {
    val all = corpus(0 until 40)
    val streamDir = Streams.scratchDir("graft_post_in2_")
    (0 until 4).foreach { b =>
      Streams.writeSinglePartFile(all.filter(col("doc_id") % 4 === b),
        streamDir, s"b$b.parquet", 1600000000000L + b * 60000L)
    }
    val plain = Streams.scratchDir("graft_post_ix2_")
    Retrieval.initPostingsIndexDir(plain, "fp-test")
    drain(plain, streamDir, compactAfter = 64)
    val want = results(Retrieval.bm25TopKFromIndex(spark, plain, queries, 4))

    // aggressive compaction: every drain folds — scores must not move
    val compacted = Streams.scratchDir("graft_post_ix3_")
    Retrieval.initPostingsIndexDir(compacted, "fp-test")
    drain(compacted, streamDir, compactAfter = 1)
    assert(results(Retrieval.bm25TopKFromIndex(spark, compacted, queries, 4))
      === want)
    assert(graft.operators.Layout.zLiveSegments(s"$compacted/posts").size <= 2,
      "compaction must actually fold the posts store")

    // redelivery: a second full drain with a fresh checkpoint re-runs
    // every batch; per-segment overwrite + folded-name no-op must
    // leave both stores content-identical
    drain(compacted, streamDir, compactAfter = 1)
    assert(results(Retrieval.bm25TopKFromIndex(spark, compacted, queries, 4))
      === want)
    val n = spark.read.parquet(
        graft.operators.Layout.zLiveSegments(s"$compacted/globals"): _*)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(n === 40L, s"docs must count once, got $n")
  }

  test("a stale/foreign index fails loudly at probe time") {
    val ixDir = Streams.scratchDir("graft_post_ix4_")
    Retrieval.initPostingsIndexDir(ixDir, "fp-old")
    Retrieval.appendToPostingsIndex(ixDir, corpus(0 until 4), "text",
      "doc_id", "b0")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKFromIndex(spark, ixDir, queries, 3,
        expectFingerprint = Some("fp-new"))
    }
    assert(e.getMessage.contains("stale/foreign"))
  }
}
