package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Dedup}
import graft.streaming.Streams

/** X83 streaming CDC apply + X84 representative election. */
class StreamCdcRepSpec extends SparkTestBase {

  import spark.implicits._

  test("applyChangesStream: drained state == one-shot apply; retries idempotent") {
    val out = Streams.scratchDir("graft_cdcstream_spec_")
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    base.write.parquet(s"$out/state/v-1")
    // batch 1: update k=1, delete k=2; batch 2: k=1 updated AGAIN
    // (must override batch-1 state), k=9 inserted
    val b1 = Seq((1L, 11L, "u", "a1", 11.0), (2L, 12L, "d", null, 0.0))
      .toDF("k", "seq", "op", "s", "v")
    val b2 = Seq((1L, 21L, "u", "a2", 12.0), (9L, 22L, "u", "ins", 90.0))
      .toDF("k", "seq", "op", "s", "v")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, t: Long): Unit = {
      val tmp = s"$out/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$out/stream", name)
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(t))
    }
    writeOne(b1, "b1.parquet", 1600000000000L)
    writeOne(b2, "b2.parquet", 1600000060000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$out/stream")
    val q = Streams.applyChangesStream(stream, s"$out/state", "k", "seq", "op")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(Streams.latestStateVersion(s"$out/state", Long.MaxValue) == "v1")
    val drained = spark.read.parquet(s"$out/state/v1")
    val oneShot = Cdc.applyChanges(base, b1.unionAll(b2), "k", "seq", "op")
    assert(drained.exceptAll(oneShot).isEmpty && oneShot.exceptAll(drained).isEmpty)
    // at-least-once retry: re-fold batch 1 (id 1) against its
    // predecessor exactly as a redelivery would — v1 must converge to
    // the same bytes-equal result, not duplicate
    val prev = spark.read.parquet(
      s"$out/state/${Streams.latestStateVersion(s"$out/state", 1L)}")
    Cdc.applyChanges(prev, b2, "k", "seq", "op")
      .write.mode("overwrite").parquet(s"$out/state/v1")
    val refolded = spark.read.parquet(s"$out/state/v1")
    assert(refolded.exceptAll(oneShot).isEmpty && oneShot.exceptAll(refolded).isEmpty)
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
