package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.streaming.Streams

/** test.sh topology parity (SURVEY §2.2) + streaming ≡ batch
 *  (SURVEY §5.1(5)): the same fanout over the same rows must agree
 *  row-for-row whether executed as a bounded frame or drained through
 *  Structured Streaming with Trigger.AvailableNow. */
class PipelinesStreamingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def branches = Seq("sum", "sub", "mul", "div").map { name =>
    name -> MathOp("Operation" -> name, "Field" -> "value",
      "Field" -> "user_id", "Output_field" -> "out")
  }

  test("fanout: one branch per tag, union of all branches") {
    val src = spark.read.parquet(s"$dir/events.parquet")
    val n = src.count()
    val fan = Pipelines.fanout(src, branches, Seq("tag", "event_id", "out"))
    assert(fan.count() == 4 * n)
    assert(fan.select("tag").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("div", "mul", "sub", "sum"))
  }

  test("fanoutFused ≡ fanout (same sorted rows, one scan)") {
    val src = spark.read.parquet(s"$dir/events.parquet")
    val cols = Seq("tag", "event_id", "out")
    val plain = Pipelines.fanout(src, branches, cols)
      .orderBy("tag", "event_id").collect()
    val fused = Pipelines.fanoutFused(src, branches, cols)
      .orderBy("tag", "event_id").collect()
    assert(fused.sameElements(plain))
    // exactly one parquet scan in the fused plan
    val plan = Pipelines.fanoutFused(src, branches, cols)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(300))
  }

  test("route selects exactly the matching tag") {
    val src = Pipelines.tagged(spark.read.parquet(s"$dir/events.parquet"), "sum")
    assert(Pipelines.route(src, "sum").count() == src.count())
    assert(Pipelines.route(src, "mul").count() == 0)
  }

  test("streaming AvailableNow fanout ≡ batch fanout row-for-row") {
    val batch = Pipelines
      .fanout(spark.read.parquet(s"$dir/events.parquet"), branches,
        Seq("tag", "event_id", "out"))
      .orderBy("tag", "event_id").collect()

    val stream = Streams.fanout(
      Streams.parquetStream(spark, s"$dir/events.parquet"),
      branches, Seq("tag", "event_id", "out"))
    Streams.drainToMemory(stream, "fanout_stream")
    val streamed = spark.table("fanout_stream")
      .orderBy("tag", "event_id").collect()

    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }
}
