package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{MathCompiler, MathOp}
import graft.streaming.Streams

/** Streaming lifecycle: live periodic source (test.sh `mem`-input
 *  parity) and checkpointed incremental processing. */
class StreamingLifecycleSpec extends SparkTestBase {

  test("live rate-based mem metrics flow through the math filter") {
    val op = MathOp("Operation" -> "sub", "Field" -> "Mem.total",
      "Field" -> "Mem.used", "Output_field" -> "Mem.free")
    val stream = Streams.mathFilter(Streams.memMetrics(spark, 100), op)
    val q = stream.writeStream.format("memory").queryName("mem_live")
      .outputMode("append").start()
    try {
      // poll until the first non-empty micro-batch lands
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("mem_live").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val rows = spark.table("mem_live")
        .select(col("`Mem.total`"), col("`Mem.used`"), col("`Mem.free`")).collect()
      assert(rows.nonEmpty, "no live rows within 30s")
      rows.foreach(r =>
        assert(r.getDouble(2) == r.getLong(0).toDouble - r.getLong(1).toDouble))
    } finally q.stop()
  }

  test("streaming exact dedup keeps the first record per content within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(java.sql.Timestamp, String, Long)](spark)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    input.addData(
      (ts(0), "alpha", 1L), (ts(1), "beta", 2L),
      (ts(2), "alpha", 3L), // dup within watermark -> dropped
      (ts(3), "gamma", 4L), (ts(4), "beta", 5L)) // dup -> dropped
    val deduped = Streams.dedupExactStream(
      input.toDF().toDF("ts", "text", "id"), "text", "ts", "10 seconds")
    Streams.drainToMemory(deduped, "dedup_stream")
    val kept = spark.table("dedup_stream").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
    // the state key is the content hash, present on the output
    assert(spark.table("dedup_stream").columns.contains("content_hash"))
  }

  test("stream-stream interval join matches only within the lookback window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    clicks.addData((1L, ts(100), "c1"), (1L, ts(700), "c2"), (2L, ts(100), "c3"))
    buys.addData((1L, ts(90), 9.0), (1L, ts(100), 10.0), (1L, ts(650), 65.0),
      (2L, ts(200), 20.0)) // after c3 -> no match
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("u", "t", "name"),
      buys.toDF().toDF("bu", "bt", "amount"),
      "u", "bu", "t", "bt", "10 seconds", "60 seconds")
    Streams.drainToMemory(joined, "ssjoin")
    val got = spark.table("ssjoin").select("name", "amount").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    // c1@100 matches buys at 90 and 100 (within [40,100]); c2@700
    // matches 650 (within [640,700]); c3 has no purchase at/before it
    assert(got == Set(("c1", 9.0), ("c1", 10.0), ("c2", 65.0)))
  }

  test("checkpointed file stream processes each file exactly once across restarts") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_")
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out_")

    def writeFile(n: Int, ids: Range): Unit =
      ids.map(i => (i.toLong, i * 1.5)).toDF("id", "v")
        .coalesce(1).write.parquet(s"$src/part$n")

    def drain(): Long = {
      val schema = spark.read.parquet(s"$src/part0").schema
      val df = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$src/part*")
      val q = df.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out.toString).count()
    }

    writeFile(0, 0 until 10)
    assert(drain() == 10)
    writeFile(1, 10 until 25)
    // restart from the same checkpoint: only the new file lands,
    // total is 25 (not 35 — file0 is NOT reprocessed)
    assert(drain() == 25)
  }
}
