package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** The hard batch-parity signal for the stateful streaming operators:
 *  the SAME lake files flow once through the streaming operator
 *  (FileStreamSource → watermarked state → parquet sink,
 *  `Trigger.AvailableNow` — the ingest topology, not MemoryStream
 *  toys) and once through the oracle-verified batch formulation, and
 *  the outputs must agree row-for-row. The batch twins (q15 exact
 *  dedup, q38/q51 join family) are hash-green against DuckDB, so
 *  equality here chains the streaming path to the oracle. */
class StreamingParitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** events with a real TimestampType event-time column (ts is
   *  normalized to epoch micros at the source boundary). */
  private def eventsWithTime(): DataFrame =
    graft.sources.Sources.withTsMicros(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("tts", timestamp_micros(col("ts")))

  private def drainToParquet(df: DataFrame): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_parity_out_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_parity_ckpt_")
    val q = df.writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out.toString)
  }

  test("streaming exact dedup over lake files ≡ batch distinct-by-content") {
    val stream = Streams.parquetStream(spark, s"$dir/events.parquet")
      .withColumn("tts", timestamp_micros(col("ts")))
    // watermark wide enough that nothing in the bounded file is "late":
    // state semantics (one survivor per content hash) are what's under
    // test, and they must hold regardless of the eviction horizon
    val deduped = Streams.dedupExactStream(stream, "event_type", "tts", "365 days")
    val got = drainToParquet(deduped)
    // WHICH duplicate survives is arrival-order-dependent (shuffle into
    // the state store), so parity is asserted on the deterministic
    // contract: exactly one output row per distinct content, none
    // invented, none lost — the same multiset of content hashes the
    // batch distinct produces.
    val streamHashes = got.select("content_hash").collect().map(_.getString(0)).toSeq
    val batchHashes = eventsWithTime().select(md5(col("event_type")).as("h"))
      .distinct().collect().map(_.getString(0)).toSeq
    assert(streamHashes.sorted == batchHashes.sorted)
    // and every surviving row is a REAL input row, verbatim
    val inputIds = eventsWithTime().select("event_id").collect().map(_.getLong(0)).toSet
    assert(got.select("event_id").collect().map(_.getLong(0)).forall(inputIds))
  }

  test("streaming sessionization over lake files ≡ batch sessions minus the open tail") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, Sessionize}
    val gapUs = 30L * 60 * 1000 * 1000
    // streaming: flatMapGroupsWithState emits sessions CLOSED by a
    // later event; each user's trailing session stays in state
    val stream = Streams.parquetStream(spark, s"$dir/events.parquet")
      .select(col("user_id"), col("ts").as("ets_us")).as[SessionEvent]
    val got = {
      val out = java.nio.file.Files.createTempDirectory("graft_sess_out_")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_sess_ckpt_")
      val q = Sessionize.sessions(stream, gapUs).writeStream.format("parquet")
        .option("path", out.toString).option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSeq.sorted
    }
    // batch: the full session list (q34's oracle-green definition),
    // minus each user's LAST session — the one streaming keeps open
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t")
    val sessions = graft.sources.Sources.withTsMicros(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("ts").as("t"))
      .withColumn("new_sess", when(lag(col("t"), 1).over(w).isNull ||
        col("t") - lag(col("t"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min("t").as("start_us"), max("t").as("end_us"),
        count(lit(1)).cast("int").as("n_events"))
    val lastSess = sessions.groupBy("user_id")
      .agg(max("sess_id").as("sess_id")).withColumn("__last", lit(1))
    val want = sessions.join(lastSess, Seq("user_id", "sess_id"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq.sorted
    assert(got.nonEmpty, "no closed sessions — vacuous parity")
    assert(got == want)
  }

  test("stream-stream interval join over lake files ≡ the batch interval join") {
    val lookback = "1 hour"
    val left = Streams.parquetStream(spark, s"$dir/events.parquet")
      .withColumn("tts", timestamp_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("tts"))
    val right = Streams.parquetStream(spark, s"$dir/events.parquet")
      .withColumn("pts", timestamp_micros(col("ts")))
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("pts"), col("value").as("pv"))
    val joined = Streams.intervalJoin(left, right,
      "user_id", "pu", "tts", "pts", "3650 days", lookback)
    val got = drainToParquet(joined)
      .select("event_id", "pv").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

    val bl = eventsWithTime().select(col("event_id"), col("user_id"), col("tts"))
    val br = eventsWithTime().filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("tts").as("pts"), col("value").as("pv"))
    val batch = bl.join(br, expr(
        s"user_id = pu AND pts BETWEEN tts - INTERVAL $lookback AND tts"))
      .select("event_id", "pv").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(got.nonEmpty, "interval join produced no rows — vacuous parity")
    assert(got == batch)
  }
}
