package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.multimodal.{Media, MediaRecord}
import graft.operators.Dedup
import graft.streaming.Streams

/** X146: the perceptual continuous-ingest dedup screen. Survivors'
 *  FINGERPRINTS evolve the Hamming index (a near-dup image arriving
 *  one batch after its survivor is screened without re-decoding
 *  admitted payloads), batches self-dedup keep-first, retries are
 *  idempotent, compaction folds segments without changing results,
 *  and the bipartite pigeonhole probe is lossless at the threshold. */
class PerceptualScreenSpec extends SparkTestBase {

  import spark.implicits._

  private def pngs(variants: Seq[(Long, Long, Boolean, Boolean)]): DataFrame =
    Media.blockPngsFor(variants.toDS()).toDF()

  private def writeBatches(dir: String,
      batches: Seq[Seq[(Long, Long, Boolean, Boolean)]]): Unit =
    batches.zipWithIndex.foreach { case (rows, i) =>
      Streams.writeSinglePartFile(pngs(rows), dir,
        s"b$i.parquet", 1600000000000L + i * 60000L)
    }

  private def initIndex(corpusFams: Seq[Long]): String = {
    val ixDir = Streams.scratchDir("graft_percep_ix_")
    Dedup.materializeHammingIndex(
      Media.dhash63(pngs(corpusFams.map(f => (f, f, false, false)))
        .as[MediaRecord]),
      "doc_id", "dh", ixDir, 63, 2, "fp-test")
    ixDir
  }

  private def runScreen(indexDir: String, streamDir: String,
      compactAfter: Int): Map[Long, Set[Long]] = {
    val schema = spark.read.parquet(s"$streamDir/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val byBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = Streams.screenIngestPerceptual(stream, indexDir, "doc_id",
        df => Media.dhash63(df.as[MediaRecord])
          .select(col("doc_id"), col("dh").as("h")),
        compactAfterSegments = compactAfter,
        expectFingerprint = Some("fp-test")) { (df, bid) =>
      val ids = df.select("doc_id").collect().map(_.getLong(0)).toSet
      byBatch.synchronized { byBatch(bid) = ids }
    }.option("checkpointLocation", Streams.scratchDir("graft_percep_ckpt_"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    byBatch.toMap
  }

  // batch 0: 100=novel A admits; 101=re-encode of corpus fam 3 drops;
  //          102/103 = in-batch twin pair of novel C -> keep-first
  // batch 1: 200 = re-encode of A (different dims) -> dropped via the
  //          APPENDED fingerprint (the evolution under test);
  //          201 = edited A -> dropped (hamming <= 2 vs admitted A);
  //          202 = novel B admits
  private val batches = Seq(
    Seq((100L, 1000L, false, false), (101L, 3L, true, false),
      (102L, 1002L, false, false), (103L, 1002L, true, false)),
    Seq((200L, 1000L, true, false), (201L, 1000L, false, true),
      (202L, 2000L, false, false)))

  test("survivor fingerprints evolve the index: cross-batch perceptual dups are screened") {
    val ixDir = initIndex(0L until 8L)
    val streamDir = Streams.scratchDir("graft_percep_in_")
    writeBatches(streamDir, batches)
    val got = runScreen(ixDir, streamDir, compactAfter = 64)
    assert(got === Map(0L -> Set(100L, 102L), 1L -> Set(202L)))
  }

  test("re-drain under a fresh checkpoint is idempotent: same admissions, no duplicate index rows") {
    val ixDir = initIndex(0L until 4L)
    val streamDir = Streams.scratchDir("graft_percep_in2_")
    writeBatches(streamDir, batches)
    val first = runScreen(ixDir, streamDir, compactAfter = 64)
    val rowsAfterFirst = Dedup.hammingIndexHashes(spark, ixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val second = runScreen(ixDir, streamDir, compactAfter = 64)
    assert(second === first,
      "a redelivered drain must admit the identical set")
    val rowsAfterSecond = Dedup.hammingIndexHashes(spark, ixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rowsAfterSecond === rowsAfterFirst,
      "overwrite-per-segment must replace, never duplicate")
  }

  test("compaction folds segments without changing screen results; a folded name re-appends as a no-op") {
    val ixDir = initIndex(0L until 8L)
    val streamDir = Streams.scratchDir("graft_percep_in3_")
    writeBatches(streamDir, batches)
    val got = runScreen(ixDir, streamDir, compactAfter = 1)
    assert(got === Map(0L -> Set(100L, 102L), 1L -> Set(202L)))
    val live = graft.operators.Layout.zLiveSegments(s"$ixDir/data")
    assert(live.size <= 2, s"compaction must fold segments, got $live")
    val before = Dedup.hammingIndexHashes(spark, ixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // a redelivered append of a FOLDED segment name must not resurrect
    Dedup.appendToHammingIndex(ixDir,
      Seq((100L, 42L)).toDF("doc_id", "h"), "doc_id", "h", "b0")
    val after = Dedup.hammingIndexHashes(spark, ixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after === before)
  }

  test("the screen is fingerprint-generic: WAV audio screens through the same machinery") {
    // corpus fams 0..3 as audio fingerprints; batch: a re-rendered
    // twin of fam 2 (dropped) and a novel clip (admitted)
    def wavs(variants: Seq[(Long, Long, Boolean, Boolean)]): DataFrame =
      variants.toDF("id", "fam", "alt", "edit").as[(Long, Long, Boolean, Boolean)]
        .map { case (id, fam, alt, edit) =>
          MediaRecord(id, Media.encodeSegWav(fam,
            if (alt) 16000 else 8000, if (alt) 400 else 200, edit),
            "audio/wav")
        }.toDF()
    val ixDir = Streams.scratchDir("graft_percep_aix_")
    Dedup.materializeHammingIndex(
      Media.ahash63(wavs((0L until 4L).map(f => (f, f, false, false)))
        .as[MediaRecord]),
      "doc_id", "ah", ixDir, 63, 2, "fp-audio")
    val streamDir = Streams.scratchDir("graft_percep_ain_")
    Streams.writeSinglePartFile(
      wavs(Seq((100L, 2L, true, false), (101L, 900L, false, false))),
      streamDir, "b0.parquet", 1600000000000L)
    val schema = spark.read.parquet(s"$streamDir/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val byBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = Streams.screenIngestPerceptual(stream, ixDir, "doc_id",
        df => Media.ahash63(df.as[MediaRecord])
          .select(col("doc_id"), col("ah").as("h")),
        expectFingerprint = Some("fp-audio")) { (df, bid) =>
      val ids = df.select("doc_id").collect().map(_.getLong(0)).toSet
      byBatch.synchronized { byBatch(bid) = ids }
    }.option("checkpointLocation", Streams.scratchDir("graft_percep_ackpt_"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(byBatch.toMap === Map(0L -> Set(101L)))
  }

  test("bipartite pigeonhole probe ≡ brute force at the threshold") {
    val rnd = new scala.util.Random(7)
    val batch = (0L until 60L).map(i =>
      (i, rnd.nextLong() & ((1L << 63) - 1)))
    // plant exact and near matches of index rows
    val index = (100L until 160L).map(i =>
      (i, rnd.nextLong() & ((1L << 63) - 1))) ++
      Seq((200L, batch(5)._2), (201L, batch(7)._2 ^ 3L),
        (202L, batch(9)._2 ^ (1L << 62 | 1L << 13)))
    val got = Dedup.hammingPairsAgainstIndex(
        batch.toDF("doc_id", "h"), "doc_id", "h",
        index.toDF("id", "h"), 2, 63)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ib, hb) <- batch; (ii, hi) <- index
      d = java.lang.Long.bitCount(hb ^ hi) if d <= 2
    } yield (ib, ii, d.toLong)).toSet
    assert(got === want)
    assert(want.exists(_._2 == 200L) && want.exists(_._2 == 201L) &&
      want.exists(_._2 == 202L))
  }
}
