package graft

import org.apache.spark.sql.functions._

import graft.core.Commit
import graft.operators.Dedup
import graft.streaming.Streams

/** Round-9 item 8: the manifest-based stores (bucketed CDC/SCD2
 *  state, evolving LSH index) ENFORCE their single-writer contract —
 *  an interleaved second writer fails loudly at an atomic CAS point
 *  instead of silently forking the version chain or interleaving a
 *  compaction; at-least-once redeliveries of the SAME writer still
 *  proceed. */
class SecondWriterSpec extends SparkTestBase {

  import spark.implicits._

  test("CDC fold: second writer from the same predecessor raises; redelivery proceeds") {
    val out = Streams.scratchDir("graft_2w_cdc_")
    val base = spark.range(1, 51)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"))
    Streams.seedCdcState(base, s"$out/state", "k", 4)
    // another writer has claimed v-1's successor
    Commit.claim(new java.io.File(s"$out/state/commits/from-v-1"),
      "v99", "simulated racer")
    val b = Seq((5L, 100L, "u", "x")).toDF("k", "seq", "op", "s")
    val e = intercept[IllegalStateException] {
      Streams.foldCdcBatch(b, 1L, s"$out/state", "k", "seq", "op")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    // ...and left NO committed version behind
    assert(!new java.io.File(s"$out/state/v1/_SUCCESS").exists())
    // the claim HOLDER proceeds, and its at-least-once RETRY proceeds
    Streams.foldCdcBatch(b, 99L, s"$out/state", "k", "seq", "op")
    Streams.foldCdcBatch(b, 99L, s"$out/state", "k", "seq", "op")
    val got = Streams.readCdcState(spark, s"$out/state")
    assert(got.filter(col("k") === 5L).select("s").head.getString(0) === "x")
  }

  test("SCD2 fold: the same CAS guards the history chain") {
    val out = Streams.scratchDir("graft_2w_scd2_")
    val base = spark.range(1, 31)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"))
    Streams.seedScd2History(base, s"$out/hist", "k", 4)
    Commit.claim(new java.io.File(s"$out/hist/commits/from-v-1"),
      "v7", "simulated racer")
    val b = Seq((3L, 50L, "u", "y")).toDF("k", "seq", "op", "s")
    val e = intercept[IllegalStateException] {
      Streams.foldScd2Batch(b, 1L, s"$out/hist", "k", "seq", "op")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    Streams.foldScd2Batch(b, 7L, s"$out/hist", "k", "seq", "op")
    assert(new java.io.File(s"$out/hist/v7/_SUCCESS").exists())
  }

  test("LSH compaction: a racing install of the same input segments loses loudly, store stays probe-able") {
    val ix = Streams.scratchDir("graft_2w_lsh_")
    val corpus = (0L until 6L)
      .map(i => (i, s"some document number $i with plenty of shared words"))
      .toDF("doc_id", "text")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ix, "fp2w")
    Dedup.appendToLshIndex(ix,
      Seq((100L, "a freshly admitted novel document about something else"))
        .toDF("doc_id", "text"), "text", "doc_id", "b0")
    // the racer has just installed a compaction of the SAME input
    // segments (simulated at the atomic point: the deterministic
    // install name is occupied)
    val segNames = new java.io.File(s"$ix/shingles").listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).toSeq
    val tag = Commit.inputSetTag(segNames)
    assert(new java.io.File(s"$ix/shingles/base-$tag").createNewFile())
    val e = intercept[IllegalStateException] {
      Dedup.compactLshIndex(spark, ix, maxSegments = 1)
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    // the loser changed NOTHING: the index still loads and holds
    // every id (superset-at-every-step crash contract)
    val loaded = Dedup.loadLshIndex(spark, ix, Some("fp2w"))
    assert(loaded.shingles.select("id").as[Long].collect().toSet ===
      ((0L until 6L).toSet + 100L))
    // with the obstruction gone the SAME compaction succeeds
    assert(new java.io.File(s"$ix/shingles/base-$tag").delete())
    assert(Dedup.compactLshIndex(spark, ix, maxSegments = 1))
    val after = Dedup.loadLshIndex(spark, ix, Some("fp2w"))
    assert(after.shingles.select("id").as[Long].collect().toSet ===
      ((0L until 6L).toSet + 100L))
  }

  test("claim primitive: atomic, content-keyed, temp never leaks") {
    val d = new java.io.File(Streams.scratchDir("graft_2w_claim_"))
    val t = new java.io.File(d, "claims/from-v3")
    Commit.claim(t, "v4", "spec")          // first claim wins
    Commit.claim(t, "v4", "spec")          // same content: idempotent
    val e = intercept[IllegalStateException] {
      Commit.claim(t, "v5", "spec")        // different content: raises
    }
    assert(e.getMessage.contains("held by 'v4'"))
    // no temp files left behind either way
    val leftovers = t.getParentFile.listFiles()
      .map(_.getName).filter(_.startsWith(".claim-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
