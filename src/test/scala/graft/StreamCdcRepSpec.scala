package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Dedup}
import graft.streaming.Streams

/** X83 streaming CDC apply + X84 representative election. */
class StreamCdcRepSpec extends SparkTestBase {

  import spark.implicits._

  test("applyChangesStream: drained == one-shot, out-of-order safe, retries converge") {
    val out = Streams.scratchDir("graft_cdcstream_spec_")
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    Streams.seedCdcState(base, s"$out/state", "k")
    // batch 1: k=1 updated at seq 20 (the NEWER change arrives FIRST),
    // k=2 deleted at seq 30; batch 2 carries LATE, lower-seq changes:
    // a stale update for k=1 (seq 10 — must lose to batch-1 state), a
    // stale update for the DELETED k=2 (seq 12 — the tombstone must
    // keep it dead), plus an insert and a genuine newer update for k=4
    val b1 = Seq((1L, 20L, "u", "a-new", 11.0), (2L, 30L, "d", null, 0.0))
      .toDF("k", "seq", "op", "s", "v")
    val b2 = Seq((1L, 10L, "u", "a-stale", 99.0), (2L, 12L, "u", "zombie", 66.0),
      (9L, 22L, "u", "ins", 90.0), (4L, 41L, "u", "d2", 44.0))
      .toDF("k", "seq", "op", "s", "v")
    Streams.writeSinglePartFile(b1, s"$out/stream", "b1.parquet",
      1600000000000L)
    Streams.writeSinglePartFile(b2, s"$out/stream", "b2.parquet",
      1600000060000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$out/stream")
    val q = Streams.applyChangesStream(stream, s"$out/state", "k", "seq", "op")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(Streams.latestStateVersion(s"$out/state", Long.MaxValue) == "v1")
    val drained = Streams.readCdcState(spark, s"$out/state")
    // one-shot apply over the CONCATENATED log is the contract —
    // batching (and the out-of-order deliveries) must not change it
    val oneShot = Cdc.applyChanges(base, b1.unionAll(b2), "k", "seq", "op")
    assert(drained.exceptAll(oneShot).isEmpty && oneShot.exceptAll(drained).isEmpty)
    val byKey = drained.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey(1L) == "a-new", "stale lower-seq update must lose to state")
    assert(!byKey.contains(2L), "tombstone must keep a late update dead")
    // at-least-once retry: replay batch 1's fold exactly as a
    // redelivery would — v1 must converge to value-equal state
    Streams.foldCdcBatch(b2, 1L, s"$out/state", "k", "seq", "op")
    val refolded = Streams.readCdcState(spark, s"$out/state")
    assert(refolded.exceptAll(oneShot).isEmpty && oneShot.exceptAll(refolded).isEmpty)
    // a torn (uncommitted) version is never selected as latest state
    new java.io.File(s"$out/state/v7").mkdirs()
    assert(Streams.latestStateVersion(s"$out/state", Long.MaxValue) == "v1")
    // HISTORY rows survive the redelivery too: the redelivered batch
    // overwrote its own journal entry with value-equal rows, so the
    // change feed is still the exact concatenated log and the
    // streamed SCD2 build equals the batch build — out-of-order
    // deliveries land as out-of-order validity intervals identically
    // in both
    val base0 = base.select(col("k"), lit(0L).as("seq"), lit("u").as("op"),
      col("s"), col("v"))
    val feedHist = Cdc.scd2History(
      base0.unionByName(Streams.streamedChangeFeed(spark, s"$out/state")),
      "k", "seq", "op", Seq("s", "v"))
    val batchHist = Cdc.scd2History(base0.unionByName(b1.unionAll(b2)),
      "k", "seq", "op", Seq("s", "v"))
    assert(feedHist.exceptAll(batchHist).isEmpty &&
      batchHist.exceptAll(feedHist).isEmpty)
  }

  test("incremental SCD2: spliced intervals == batch build, late deliveries, retries converge") {
    val out = Streams.scratchDir("graft_scd2inc_spec_")
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    Streams.seedCdcState(base, s"$out/state", "k")
    Streams.seedScd2History(base, s"$out/hist", "k")
    // same adversarial fixture as the latest-wins spec: batch 2
    // delivers LATE lower-seq changes that must splice into the
    // MIDDLE of existing intervals, plus an update for a deleted key
    val b1 = Seq((1L, 20L, "u", "a-new", 11.0), (2L, 30L, "d", null, 0.0))
      .toDF("k", "seq", "op", "s", "v")
    val b2 = Seq((1L, 10L, "u", "a-stale", 99.0), (2L, 12L, "u", "zombie", 66.0),
      (9L, 22L, "u", "ins", 90.0), (4L, 41L, "u", "d2", 44.0))
      .toDF("k", "seq", "op", "s", "v")
    Streams.writeSinglePartFile(b1, s"$out/stream", "b1.parquet",
      1600000000000L)
    Streams.writeSinglePartFile(b2, s"$out/stream", "b2.parquet",
      1600000060000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$out/stream")
    val q = Streams.applyChangesWithHistoryStream(
        stream, s"$out/state", s"$out/hist", "k", "seq", "op")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // BOTH tables drained from one stream: latest-wins unchanged...
    val oneShot = Cdc.applyChanges(base, b1.unionAll(b2), "k", "seq", "op")
    val drained = Streams.readCdcState(spark, s"$out/state")
    assert(drained.exceptAll(oneShot).isEmpty && oneShot.exceptAll(drained).isEmpty)
    // ...and the incrementally-spliced history equals the batch build
    val base0 = base.select(col("k"), lit(0L).as("seq"), lit("u").as("op"),
      col("s"), col("v"))
    val batchHist = Cdc.scd2History(base0.unionByName(b1.unionAll(b2)),
      "k", "seq", "op", Seq("s", "v"))
    def histSet(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "s", "v", "valid_from", "valid_to", "is_current")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getBoolean(5))).toSet
    val inc = Streams.readScd2History(spark, s"$out/hist")
    assert(histSet(inc) === histSet(batchHist))
    // the late splices, explicitly: k=1's stale seq-10 update closes
    // at batch-1's seq-20 change; k=2's zombie seq-12 update closes at
    // the seq-30 DELETE (which opens nothing — the retained d marker
    // is what made that bound visible to a later fold)
    val k1 = histSet(inc).filter(_._1 == 1L)
    assert(k1.contains((1L, "a-stale", 99.0, 10L, 20L, false)))
    assert(k1.contains((1L, "a-new", 11.0, 20L, -1L, true)))
    assert(histSet(inc).contains((2L, "zombie", 66.0, 12L, 30L, false)))
    assert(!histSet(inc).exists(h => h._1 == 2L && h._6),
      "deleted key must have no current interval")
    // at-least-once retry: refold batch 2 as a redelivery — history
    // converges to value-equal rows (dropDuplicates on (k, seq))
    Streams.foldScd2Batch(b2, 1L, s"$out/hist", "k", "seq", "op")
    val refolded = Streams.readScd2History(spark, s"$out/hist")
    assert(histSet(refolded) === histSet(batchHist))
  }

  test("electRepresentatives: max weight wins, ties to lower id, counts right") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "cluster_id")
    val meta = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 7L), (5L, 7L),
      (6L, 1L)).toDF("doc_id", "n_chars")
    val out = Dedup.electRepresentatives(clusters, meta, "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 2L, 30L, 3L),  // 2 and 3 tie at 30 → lower id 2
      (4L, 4L, 7L, 2L),   // 4 and 5 tie → 4
      (6L, 6L, 1L, 1L)))  // singleton keeps itself
  }

  test("electRepresentatives aggregates with bounded state — no rank window") {
    val clusters = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    val meta = Seq((1L, 5L)).toDF("doc_id", "n_chars")
    val plan = Dedup.electRepresentatives(clusters, meta, "doc_id", "n_chars")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // struct-min plans as SortAggregate (no mutable hash buffer for
    // struct state) — what matters is the PARTIAL mode before the
    // exchange: each task reduces to one candidate per cluster, the
    // sort is per-task, never a per-cluster reducer sort
    assert(plan.contains("partial_min"), plan)
  }
}
