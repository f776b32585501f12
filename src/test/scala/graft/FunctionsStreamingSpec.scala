package graft

import org.apache.spark.sql.functions._
import graft.core.GraftFunctions
import graft.streaming.Streams

/** SQL function registration surface + watermarked streaming agg. */
class FunctionsStreamingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("graft_* SQL functions carry reference semantics incl. IEEE div") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("ev")
    val r = spark.sql(
      """SELECT graft_sum(value, user_id, 2) AS s,
        |       graft_sub(value, user_id) AS d,
        |       graft_div(value, 0) AS z,
        |       graft_div(0D, 0) AS nn
        |FROM ev WHERE event_id = 0""".stripMargin).collect()(0)
    val row = spark.sql("SELECT value, user_id FROM ev WHERE event_id = 0").collect()(0)
    val (v, u) = (row.getDouble(0), row.getLong(1).toDouble)
    assert(r.getDouble(0) == v + u + 2.0)
    assert(r.getDouble(1) == v - u)
    assert(r.getDouble(2) == (if (v > 0) Double.PositiveInfinity
      else if (v < 0) Double.NegativeInfinity else Double.NaN))
    assert(r.getDouble(3).isNaN)
  }

  test("graft_* functions are expression trees, not UDFs (codegen-visible)") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("ev")
    val plan = spark.sql("SELECT graft_sum(value, user_id) FROM ev")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("coalesce"), plan.take(300)) // built-in tree, no ScalaUDF
    assert(!plan.toLowerCase.contains("udf"), plan.take(300))
  }

  test("graft_* rejects <2 operands like the reference validation") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("ev")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sum(value) FROM ev").collect()
    }
    assert(e.getMessage.contains("at least 2 operands"))
  }

  test("classifier scoring is stateless: streaming AvailableNow ≡ batch") {
    // the X74 scorer is one narrow projection, so it applies to a
    // readStream frame verbatim — literal batch/streaming plan parity
    val docsPath = s"$dir/documents.parquet"
    val batch = graft.operators.Quality.hashedClassifierScore(
        spark.read.parquet(docsPath), "doc_id", "text", 4096, "w7")
      .orderBy("doc_id").collect().toSeq
    val stream = graft.operators.Quality.hashedClassifierScore(
      Streams.parquetStream(spark, docsPath), "doc_id", "text", 4096, "w7")
    Streams.drainToMemory(stream, "cls_stream")
    val streamed = spark.table("cls_stream").orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("watermarked tumbling-window agg: streaming AvailableNow ≡ batch") {
    val toTs = timestamp_micros(col("ts"))  // ts = epoch micros (withTsMicros)
    val batch = graft.sources.Sources.withTsMicros(
      spark.read.parquet(s"$dir/events.parquet"))
      .select(toTs.as("ets"), col("event_type"))
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()

    val stream = Streams.parquetStream(spark, s"$dir/events.parquet")
      .select(toTs.as("ets"), col("event_type"))
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    Streams.drainToMemory(stream, "win_stream", mode = "complete")
    val streamed = spark.table("win_stream").orderBy("ws", "event_type").collect()

    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }
}
