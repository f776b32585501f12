package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.Streams

/** The round-7 X56 contract: an EVOLVING ingest screen. A fixed-index
 *  screen admits a near-dup that arrives one batch after its
 *  survivor; the evolving screen must not — survivors join the
 *  durable index after each batch, each batch self-dedups
 *  (keep-first), retries are idempotent (overwrite-per-segment), and
 *  compaction folds segments without changing screen results. */
class EvolvingScreenSpec extends SparkTestBase {

  private def doc(tag: String) =
    s"unique content $tag alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  /** Write each batch as ONE parquet part file with an increasing
   *  pinned mtime so FileStreamSource (maxFilesPerTrigger=1,
   *  latestFirst=false) triggers them in order. */
  private def writeBatches(dir: String,
      batches: Seq[Seq[(Long, String)]]): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (rows, i) =>
      Streams.writeSinglePartFile(rows.toDF("doc_id", "text"), dir,
        s"b$i.parquet", 1600000000000L + i * 60000L)
    }
  }

  private def runScreen(indexDir: String, streamDir: String,
      compactAfter: Int): Map[Long, Set[Long]] = {
    val schema = spark.read.parquet(s"$streamDir/b0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val byBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = Streams.screenIngestEvolving(stream, indexDir, "text", "doc_id",
        0.8, compactAfterSegments = compactAfter) { (df, bid) =>
      val ids = df.select("doc_id").collect().map(_.getLong(0)).toSet
      byBatch.synchronized { byBatch(bid) = ids }
    }.option("checkpointLocation", Streams.scratchDir("graft_evo_ckpt_"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    byBatch.toMap
  }

  test("survivors evolve the index: cross-batch near-dups are screened") {
    import spark.implicits._
    val corpus = (0L until 8L).map(i => (i, doc(s"corpus$i")))
      .toDF("doc_id", "text")
    val ixDir = Streams.scratchDir("graft_evo_ix_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ixDir, "fp-test")

    val streamDir = Streams.scratchDir("graft_evo_in_")
    writeBatches(streamDir, Seq(
      // batch 0: novel A survives; 101 is an exact corpus dup (dropped)
      Seq(100L -> doc("novelA"), 101L -> doc("corpus3")),
      // batch 1: 200 near-dups the batch-0 SURVIVOR A -> must be
      // screened (the whole point); 201 novel B survives; 202/203 are
      // an in-batch near-dup pair -> keep-first keeps 202 only
      Seq(200L -> (doc("novelA") + " tail"), 201L -> doc("novelB"),
        202L -> doc("novelC"), 203L -> (doc("novelC") + " tail")),
      // batch 2: 300 near-dups batch-1 survivor B (screened);
      // 301 near-dups the DROPPED batch-0 doc 101 == corpus3 text, so
      // it is still caught — via the corpus segment
      Seq(300L -> (doc("novelB") + " tail"), 301L -> doc("corpus3"),
        302L -> doc("novelD"))))

    // filter: a trailing empty micro-batch (harmless) reports an empty set
    val got = runScreen(ixDir, streamDir, compactAfter = 64).filter(_._2.nonEmpty)
    assert(got === Map(
      0L -> Set(100L),
      1L -> Set(201L, 202L),
      2L -> Set(302L)), s"survivor sets wrong: $got")

    // the index now holds base + one segment per batch
    val segs = new java.io.File(s"$ixDir/banded").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs === Set("base", "b0", "b1", "b2"))
    // and its content is probe-able as one set: all survivors present
    val ix = Dedup.loadLshIndex(spark, ixDir, Some("fp-test"))
    val ids = ix.shingles.select("id").as[Long].collect().toSet
    assert(ids === (0L until 8L).toSet ++ Set(100L, 201L, 202L, 302L))
  }

  test("compaction folds segments; screen results unchanged; invalidation is loud") {
    import spark.implicits._
    val corpus = (0L until 6L).map(i => (i, doc(s"corp$i"))).toDF("doc_id", "text")
    val mkStream = { () =>
      val d = Streams.scratchDir("graft_evo_in2_")
      writeBatches(d, Seq(
        Seq(100L -> doc("nA"), 101L -> doc("corp2")),
        Seq(200L -> (doc("nA") + " tail"), 201L -> doc("nB")),
        Seq(300L -> (doc("nB") + " tail"), 301L -> doc("nE"))))
      d
    }
    // run once WITHOUT compaction, once compacting after every batch
    val ixA = Streams.scratchDir("graft_evo_ixA_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ixA, "fpA")
    val gotA = runScreen(ixA, mkStream(), compactAfter = 64).filter(_._2.nonEmpty)
    val ixB = Streams.scratchDir("graft_evo_ixB_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ixB, "fpB")
    val gotB = runScreen(ixB, mkStream(), compactAfter = 1).filter(_._2.nonEmpty)
    assert(gotA === gotB, s"compaction changed screen results: $gotA vs $gotB")
    // aggressive compaction collapsed everything it exceeded into base
    val segsB = new java.io.File(s"$ixB/banded").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segsB.size <= 2, s"compaction left $segsB")
    // compacted index content === uncompacted content (as sets)
    def content(d: String) = Dedup.loadLshIndex(spark, d)
      .banded.select("band", "bh", "id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(content(ixA) === content(ixB))
    // a fingerprint mismatch must fail LOUDLY, not probe stale data
    val e = intercept[IllegalArgumentException] {
      Dedup.loadLshIndex(spark, ixA, Some("some-other-corpus"))
    }
    assert(e.getMessage.contains("STALE"))
    // a non-index dir fails with a clear message
    intercept[IllegalStateException] {
      Dedup.loadLshIndex(spark, Streams.scratchDir("graft_evo_empty_"))
    }
  }

  test("delete invalidates entries: admit → delete → re-ingested near-dup admits again") {
    import spark.implicits._
    val corpus = (0L until 4L).map(i => (i, doc(s"del$i"))).toDF("doc_id", "text")
    val ix = Streams.scratchDir("graft_evo_ixD_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fpD")
    // ADMIT: doc 100 is novel, survives, joins the index
    val s1 = Streams.scratchDir("graft_evo_inD1_")
    writeBatches(s1, Seq(Seq(100L -> doc("victim"))))
    assert(runScreen(ix, s1, 64).filter(_._2.nonEmpty) === Map(0L -> Set(100L)))
    // its near-dup is screened out while 100 is in the index
    val s2 = Streams.scratchDir("graft_evo_inD2_")
    writeBatches(s2, Seq(Seq(200L -> (doc("victim") + " tail"))))
    assert(runScreen(ix, s2, 64).filter(_._2.nonEmpty).isEmpty,
      "near-dup of a live index entry must be screened")
    // DELETE doc 100 from the corpus → tombstone the index entry
    Dedup.deleteFromLshIndex(ix, Seq(100L).toDF("doc_id"), "doc_id", "d0")
    assert(Dedup.loadLshIndex(spark, ix).shingles
        .filter(col("id") === 100L).isEmpty,
      "tombstoned id must vanish from the loaded index")
    // RE-INGEST: the same near-dup must now be ADMITTED again
    val s3 = Streams.scratchDir("graft_evo_inD3_")
    writeBatches(s3, Seq(Seq(300L -> (doc("victim") + " tail"))))
    assert(runScreen(ix, s3, 64).filter(_._2.nonEmpty) === Map(0L -> Set(300L)),
      "after the delete, the re-ingested near-dup must be admitted")
    // compaction drops the rows physically and clears the tombstones
    assert(Dedup.compactLshIndex(spark, ix, maxSegments = 1))
    assert(!new java.io.File(s"$ix/deleted").exists() ||
      new java.io.File(s"$ix/deleted").listFiles()
        .count(_.isDirectory) == 0, "compaction must clear tombstones")
    val ids = Dedup.loadLshIndex(spark, ix).shingles
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(100L) && ids.contains(300L),
      s"compacted index must physically exclude the deleted doc: $ids")
  }

  test("delete → re-add of the SAME id revives it (tombstone cleared at append)") {
    import spark.implicits._
    val corpus = (0L until 3L).map(i => (i, doc(s"rev$i"))).toDF("doc_id", "text")
    val ix = Streams.scratchDir("graft_evo_ixR_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fpR")
    Dedup.appendToLshIndex(ix,
      Seq(100L -> doc("revived")).toDF("doc_id", "text"), "text", "doc_id", "b0")
    Dedup.deleteFromLshIndex(ix, Seq(100L).toDF("doc_id"), "doc_id", "d0")
    assert(Dedup.loadLshIndex(spark, ix).shingles
      .filter(col("id") === 100L).isEmpty)
    // the corrected doc re-ingests under the SAME id: the append must
    // clear the tombstone — otherwise the new entry is hidden at read
    // time and physically destroyed at the next compaction
    Dedup.appendToLshIndex(ix,
      Seq(100L -> doc("revived v2")).toDF("doc_id", "text"),
      "text", "doc_id", "b1")
    assert(!Dedup.loadLshIndex(spark, ix).shingles
      .filter(col("id") === 100L).isEmpty,
      "re-added id must be live again")
    // and it SURVIVES compaction (the destructive path of the bug)
    assert(Dedup.compactLshIndex(spark, ix, maxSegments = 1))
    val ids = Dedup.loadLshIndex(spark, ix).shingles
      .select("id").as[Long].collect().toSet
    assert(ids.contains(100L), s"compaction destroyed the re-added doc: $ids")
    // an id deleted and NEVER re-added stays dead through it all
    Dedup.deleteFromLshIndex(ix, Seq(0L).toDF("doc_id"), "doc_id", "d1")
    Dedup.appendToLshIndex(ix,
      Seq(200L -> doc("other")).toDF("doc_id", "text"), "text", "doc_id", "b2")
    assert(Dedup.loadLshIndex(spark, ix).shingles
      .filter(col("id") === 0L).isEmpty,
      "an unrelated append must not revive other tombstones")
  }

  test("no-revival append rewrites ZERO tombstone segments (probe-first)") {
    import spark.implicits._
    val corpus = (0L until 3L).map(i => (i, doc(s"probe$i"))).toDF("doc_id", "text")
    val ix = Streams.scratchDir("graft_evo_ixP_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fpP")
    // several tombstone segments, none of whose ids the append re-adds
    Dedup.deleteFromLshIndex(ix, Seq(0L).toDF("doc_id"), "doc_id", "d0")
    Dedup.deleteFromLshIndex(ix, Seq(1L).toDF("doc_id"), "doc_id", "d1")
    Dedup.deleteFromLshIndex(ix, Seq(2L).toDF("doc_id"), "doc_id", "d2")
    def tombstoneState(): Map[String, Long] =
      new java.io.File(s"$ix/deleted").listFiles()
        .filter(_.isDirectory).map(f => f.getName -> f.lastModified()).toMap
    val before = tombstoneState()
    assert(before.keySet === Set("d0", "d1", "d2"))
    Dedup.appendToLshIndex(ix,
      Seq(500L -> doc("unrelated")).toDF("doc_id", "text"),
      "text", "doc_id", "b0")
    // round 8 rewrote every segment unconditionally (fresh ~N names,
    // fresh mtimes); the probe-first append must leave all three
    // segment dirs untouched — same names, same mtimes
    assert(tombstoneState() === before,
      "a no-revival append must not rewrite any tombstone segment")
    // and the tombstones still work
    assert(Dedup.loadLshIndex(spark, ix).shingles
      .filter(col("id").isin(0L, 1L, 2L)).isEmpty)
  }

  test("revival purges the id's STALE pre-delete rows from older segments") {
    import spark.implicits._
    val corpus = (0L until 3L).map(i => (i, doc(s"st$i"))).toDF("doc_id", "text")
    val ix = Streams.scratchDir("graft_evo_ixS_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fpS")
    Dedup.appendToLshIndex(ix,
      Seq(100L -> doc("version one original body")).toDF("doc_id", "text"),
      "text", "doc_id", "b0")
    Dedup.deleteFromLshIndex(ix, Seq(100L).toDF("doc_id"), "doc_id", "d0")
    // re-add under the same id with DIFFERENT content: the revival
    // must purge the old segment's rows — otherwise probes screen
    // with deleted content and compaction's dedup keeps an arbitrary
    // winner between old and new
    val v2 = doc("version two rewritten body entirely different words")
    Dedup.appendToLshIndex(ix,
      Seq(100L -> v2).toDF("doc_id", "text"), "text", "doc_id", "b1")
    val ixLoaded = Dedup.loadLshIndex(spark, ix)
    val rows = ixLoaded.shingles.filter(col("id") === 100L).collect()
    assert(rows.length == 1,
      s"exactly ONE live shingle row for the revived id, got ${rows.length}")
    // reference shingle row for the NEW content: a throwaway index of
    // just the v2 doc
    val refIx = Streams.scratchDir("graft_evo_ixS_ref_")
    Dedup.initLshIndexDir(Seq(100L -> v2).toDF("doc_id", "text"),
      "text", "doc_id", 3, 16, 4, refIx, "fpSref")
    val freshSz = Dedup.loadLshIndex(spark, refIx).shingles
      .filter(col("id") === 100L).collect().head.getAs[Int]("sz")
    assert(rows.head.getAs[Int]("sz") == freshSz,
      "the surviving row must be the NEW content's shingle set")
    assert(ixLoaded.banded.filter(col("id") === 100L).count() == 4L,
      "exactly one banded signature set for the revived id")
    // compaction stays deterministic — the new row survives
    assert(Dedup.compactLshIndex(spark, ix, maxSegments = 1))
    val after = Dedup.loadLshIndex(spark, ix).shingles
      .filter(col("id") === 100L).collect()
    assert(after.length == 1 && after.head.getAs[Int]("sz") == freshSz)
  }

  test("append is idempotent: re-appending a batch segment replaces, not duplicates") {
    import spark.implicits._
    val corpus = (0L until 4L).map(i => (i, doc(s"idem$i"))).toDF("doc_id", "text")
    val ix = Streams.scratchDir("graft_evo_ixI_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fpI")
    val batch = Seq(50L -> doc("fresh1"), 51L -> doc("fresh2"))
      .toDF("doc_id", "text")
    Dedup.appendToLshIndex(ix, batch, "text", "doc_id", "b0")
    val once = Dedup.loadLshIndex(spark, ix).banded.count()
    Dedup.appendToLshIndex(ix, batch, "text", "doc_id", "b0") // the retry
    val twice = Dedup.loadLshIndex(spark, ix).banded.count()
    assert(once === twice, "a retried append must overwrite its own segment")
  }

  test("append redelivered AFTER a compaction folded its segment is a no-op, not a duplicate") {
    import spark.implicits._
    // the round-10 advice gap: append b0 → compaction folds b0 into a
    // base → crash before the streaming checkpoint commits → b0
    // redelivers. Without the folded-segment ledger the re-append
    // would re-create b0 beside the fold and every id would exist
    // twice in the live data.
    val corpus = (0L until 4L).map(i => (i, doc(s"fold$i"))).toDF("doc_id", "text")
    val ix = Streams.scratchDir("graft_evo_ixF_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fpF")
    val batch = Seq(60L -> doc("foldfresh1"), 61L -> doc("foldfresh2"))
      .toDF("doc_id", "text")
    Dedup.appendToLshIndex(ix, batch, "text", "doc_id", "b0")
    assert(Dedup.compactLshIndex(spark, ix, maxSegments = 1))
    val folded = Dedup.loadLshIndex(spark, ix)
    val ids = folded.shingles.select("id").as[Long].collect().sorted
    Dedup.appendToLshIndex(ix, batch, "text", "doc_id", "b0") // redelivery
    val after = Dedup.loadLshIndex(spark, ix)
    assert(after.shingles.select("id").as[Long].collect().sorted
      === ids, "redelivered fold must not duplicate ids")
    assert(after.shingles.count() === folded.shingles.count())
    // a genuinely NEW batch still appends normally
    Dedup.appendToLshIndex(ix,
      Seq(70L -> doc("foldnovel")).toDF("doc_id", "text"),
      "text", "doc_id", "b1")
    assert(Dedup.loadLshIndex(spark, ix).shingles
      .select("id").as[Long].collect().toSet === (ids.toSet + 70L))
    // a SECOND compaction subsumes the earlier ledger files into the
    // new ones and GC's them (bounded count over a long-lived stream);
    // the twice-folded b0 STILL no-ops on redelivery
    assert(Dedup.compactLshIndex(spark, ix, maxSegments = 1))
    val ledgers = graft.core.StoreFs.listFileNames(ix)
      .filter(_.startsWith("folded-"))
    assert(ledgers.size === 2, // one per table (shingles, banded)
      s"superseded ledgers not GC'd: $ledgers")
    Dedup.appendToLshIndex(ix, batch, "text", "doc_id", "b0")
    assert(Dedup.loadLshIndex(spark, ix).shingles
      .select("id").as[Long].collect().toSet === (ids.toSet + 70L))
  }
}
