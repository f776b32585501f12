package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.streaming.Streams

/** X137 streaming pretokenization + incremental packing (q163): the
 *  drained stream must equal the one-shot batch packing of the
 *  concatenated arrival-ordered corpus for ANY batch split — windows
 *  never depend on where the micro-batch boundaries fell. Plus the
 *  fold's own contracts: redelivery convergence, the exact-boundary
 *  (empty open window) edge, and the O(seqLen) state bound. */
class StreamPackSpec extends SparkTestBase {

  import spark.implicits._

  private def newStateDir(): String = java.nio.file.Files
    .createTempDirectory("graft_packfold_").toString

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  /** Fold `batches` in order; returns (completed rows per batch,
   *  stateDir) with the sink collecting each batch's output. */
  private def drain(batches: Seq[DataFrame], stateDir: String,
      merges: Seq[(String, String)], seqLen: Int):
      Seq[Seq[(Long, Long, Int, Int, Long)]] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, Long, Int, Int, Long)]]
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.packFoldBatch(b, i.toLong, stateDir, "doc_id", "text",
        merges, seqLen, 0) { (df, _) => out += collectPack(df) }
    }
    out.toSeq
  }

  private def collectPack(df: DataFrame): Seq[(Long, Long, Int, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getInt(3), r.getLong(4))).toSeq.sortBy(_._1)

  test("drained stream equals the batch packing for any batch split") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, "text", 8)
    val expected = collectPack(Bpe.packIdSequences(
      Bpe.encodeIds(docs, "text", "doc_id", merges), "doc_id", 64, 0))
    val maxId = docs.agg(max(col("doc_id"))).collect().head.getLong(0)
    for (nSplits <- Seq(1, 2, 3)) {
      val stateDir = newStateDir()
      try {
        // contiguous id ranges => arrival order == id order, the
        // oracle's concatenation order
        val bounds = (0 to nSplits).map(i => maxId * i / nSplits + i)
        val batches = (0 until nSplits).map(i =>
          docs.filter(col("doc_id") >= bounds(i) &&
            col("doc_id") < bounds(i + 1)))
        val completed = drain(batches, stateDir, merges, 64).flatten
        val tail = collectPack(
          Streams.packOpenWindow(spark, stateDir, 64))
        assert((completed ++ tail).sortBy(_._1) === expected,
          s"split into $nSplits batches diverged from the batch packing")
      } finally cleanup(stateDir)
    }
  }

  test("an at-least-once redelivered batch converges: same output, same state") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, "text", 8)
    val b1 = docs.filter(col("doc_id") < 2500)
    val b2 = docs.filter(col("doc_id") >= 2500)
    val stateDir = newStateDir()
    try {
      var second: Seq[(Long, Long, Int, Int, Long)] = null
      Streams.packFoldBatch(b1, 0L, stateDir, "doc_id", "text",
        merges, 64, 0) { (_, _) => () }
      Streams.packFoldBatch(b2, 1L, stateDir, "doc_id", "text",
        merges, 64, 0) { (df, _) => second = collectPack(df) }
      val tail = collectPack(Streams.packOpenWindow(spark, stateDir, 64))
      // redeliver batch 1 (the fold reads state strictly BELOW its id)
      var redelivered: Seq[(Long, Long, Int, Int, Long)] = null
      Streams.packFoldBatch(b2, 1L, stateDir, "doc_id", "text",
        merges, 64, 0) { (df, _) => redelivered = collectPack(df) }
      assert(redelivered === second)
      assert(collectPack(
        Streams.packOpenWindow(spark, stateDir, 64)) === tail)
    } finally cleanup(stateDir)
  }

  test("exact window boundary: empty open window, equivalence still holds") {
    // merges (a,b): "ab" encodes to 1 token + EOS = 2 slots per doc;
    // 4 docs x 2 = 8 tokens = exactly two L=4 windows
    val merges = Seq(("a", "b"))
    val docs = (1L to 4L).map(i => (i, "ab")).toDF("doc_id", "text")
    val expected = collectPack(Bpe.packIdSequences(
      Bpe.encodeIds(docs, "text", "doc_id", merges), "doc_id", 4, 0))
    val stateDir = newStateDir()
    try {
      val completed = drain(Seq(
        docs.filter(col("doc_id") <= 1),
        docs.filter(col("doc_id") > 1)), stateDir, merges, 4).flatten
      val tail = Streams.packOpenWindow(spark, stateDir, 4)
      assert(tail.count() === 0L,
        "stream ended on a window boundary: the open window must be empty")
      assert(completed.sortBy(_._1) === expected)
    } finally cleanup(stateDir)
  }

  test("state is the open window only: O(seqLen) rows regardless of volume") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, "text", 8)
    val stateDir = newStateDir()
    try {
      Streams.packFoldBatch(docs, 0L, stateDir, "doc_id", "text",
        merges, 64, 0) { (_, _) => () }
      val carry = spark.read.parquet(s"$stateDir/b0/carry").count()
      assert(carry < 64L,
        s"carry must hold fewer than seqLen rows, got $carry")
    } finally cleanup(stateDir)
  }
}
