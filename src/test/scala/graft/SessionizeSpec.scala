package graft

import org.apache.spark.sql.functions._
import graft.streaming.{SessionEvent, Sessionize, Streams, UserSession}

/** Stateful-streaming sessionization: reference model on the driver
 *  vs flatMapGroupsWithState on batch AND streaming frames. */
class SessionizeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val gapUs = 30L * 60 * 1000 * 1000 // 30 min

  /** Driver-side reference model: per-user sort + gap split. */
  private def model(rows: Seq[(Long, Long)]): Set[UserSession] =
    rows.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List((ts.head, ts.head, 1))) {
        case ((s, last, n) :: rest, t) =>
          if (t - last <= gapUs) (s, t, n + 1) :: rest
          else (t, t, 1) :: (s, last, n) :: rest
        case (Nil, _) => Nil
      }
      sessions.map { case (s, e, n) => UserSession(u, s, e, n) }
    }.toSet

  private def load() = {
    import spark.implicits._
    graft.sources.Sources.withTsMicros(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("ts").as("ets_us"))
      .as[SessionEvent]
  }

  test("batch sessionization matches the reference model (incl. trailing sessions)") {
    import spark.implicits._
    val ds = load()
    val rows = ds.collect().map(e => (e.user_id, e.ets_us)).toSeq
    val got = Sessionize.sessions(ds, gapUs).collect().toSet
    val expected = model(rows)
    // In BATCH execution state dies at the end, so trailing sessions
    // are simply never emitted: got == expected minus each user's
    // final session.
    val trailing = expected.groupBy(_.user_id)
      .map { case (_, ss) => ss.maxBy(_.start_us) }.toSet
    assert(got == expected -- trailing)
    assert(got.nonEmpty)
  }

  test("streaming AvailableNow emits exactly the batch sessions") {
    import spark.implicits._
    val batch = Sessionize.sessions(load(), gapUs).collect().toSet
    val stream = Streams.parquetStream(spark, s"$dir/events.parquet")
      .select(col("user_id"), col("ts").as("ets_us"))
      .as[SessionEvent]
    Streams.drainToMemory(Sessionize.sessions(stream, gapUs).toDF(), "sess_stream")
    val streamed = spark.table("sess_stream").as[UserSession].collect().toSet
    assert(streamed == batch)
  }
}
