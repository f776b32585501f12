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
    Commit.claim(s"$out/state/commits/from-v-1",
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
    Commit.claim(s"$out/hist/commits/from-v-1",
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
    val d = Streams.scratchDir("graft_2w_claim_")
    val t = s"$d/claims/from-v3"
    Commit.claim(t, "v4", "spec")          // first claim wins
    Commit.claim(t, "v4", "spec")          // same content: idempotent
    val e = intercept[IllegalStateException] {
      Commit.claim(t, "v5", "spec")        // different content: raises
    }
    assert(e.getMessage.contains("held by 'v4'"))
    // no temp files left behind either way
    val leftovers = new java.io.File(s"$d/claims").listFiles()
      .map(_.getName).filter(_.startsWith(".claim-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  // ------------------------- HDFS-contract (rename-based) FS branch

  /** Register the strict no-overwrite-rename FS (HDFS's rename
   *  contract) and return a `strict:`-scheme copy of a fresh scratch
   *  path — the same store code then exercises StoreFs's
   *  rename-contract branch instead of the POSIX-local one. */
  private def strictPath(prefix: String): String = {
    StrictRenameFileSystem.register(spark)
    s"strict:${Streams.scratchDir(prefix)}"
  }

  test("strict FS: claim is create-if-absent via no-overwrite rename") {
    val t = s"${strictPath("graft_2w_sclaim_")}/claims/from-v3"
    Commit.claim(t, "v4", "spec")
    Commit.claim(t, "v4", "spec")          // redelivery proceeds
    val e = intercept[IllegalStateException] {
      Commit.claim(t, "v5", "spec")
    }
    assert(e.getMessage.contains("held by 'v4'"))
  }

  test("strict FS: casInstallDir distinguishes a racing install from an IO error") {
    import graft.core.StoreFs
    val d = strictPath("graft_2w_scas_")
    StoreFs.mkdirs(s"$d/t/.scratch1")
    StoreFs.mkdirs(s"$d/t/.scratch2")
    StoreFs.casInstallDir(s"$d/t/.scratch1", s"$d/t/base-aa", "spec")
    assert(StoreFs.exists(s"$d/t/base-aa"))
    // same target occupied -> SECOND WRITER, loser's scratch cleaned
    val e = intercept[IllegalStateException] {
      StoreFs.casInstallDir(s"$d/t/.scratch2", s"$d/t/base-aa", "spec")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    assert(!StoreFs.exists(s"$d/t/.scratch2"))
    // missing scratch + free target -> IO error, not a race
    val io = intercept[java.io.IOException] {
      StoreFs.casInstallDir(s"$d/t/.nonexistent", s"$d/t/base-bb", "spec")
    }
    assert(io.getMessage.contains("IO error"))
  }

  test("strict FS: CDC fold chain end-to-end over the rename-contract branch") {
    val out = strictPath("graft_2w_scdc_")
    val base = spark.range(1, 21)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"))
    Streams.seedCdcState(base, s"$out/state", "k", 4)
    val b = Seq((5L, 100L, "u", "x")).toDF("k", "seq", "op", "s")
    Streams.foldCdcBatch(b, 1L, s"$out/state", "k", "seq", "op")
    Streams.foldCdcBatch(b, 1L, s"$out/state", "k", "seq", "op") // redelivery
    Commit.claim(s"$out/state/commits/from-v1", "v99", "simulated racer")
    val e = intercept[IllegalStateException] {
      Streams.foldCdcBatch(b, 2L, s"$out/state", "k", "seq", "op")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    val got = Streams.readCdcState(spark, s"$out/state")
    assert(got.count() === 20L)
    assert(got.filter(col("k") === 5L).select("s").head.getString(0) === "x")
  }

  test("strict FS semantics: rename moves a dir INTO an existing dir (HDFS), fails onto an existing file") {
    import graft.core.StoreFs
    StrictRenameFileSystem.register(spark)
    val d = s"strict:${Streams.scratchDir("graft_2w_sem_")}"
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StoreFs.mkdirs(s"$d/src1"); StoreFs.mkdirs(s"$d/dst")
    StoreFs.writeUTF8(s"$d/f1", "a"); StoreFs.writeUTF8(s"$d/f2", "b")
    // dir onto existing dir: nests, returns true — the HDFS hazard
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$d/src1"),
      new org.apache.hadoop.fs.Path(s"$d/dst")))
    assert(StoreFs.exists(s"$d/dst/src1"))
    // file onto existing file: false
    assert(!fs.rename(new org.apache.hadoop.fs.Path(s"$d/f1"),
      new org.apache.hadoop.fs.Path(s"$d/f2")))
    assert(StoreFs.readUTF8(s"$d/f2") === "b")
  }

  test("race FS: an install racing through the check-then-rename window is detected, not silently nested") {
    import graft.core.StoreFs
    RacingInstallFileSystem.register(spark)
    val d = s"race:${Streams.scratchDir("graft_2w_race_")}"
    StoreFs.mkdirs(s"$d/t/.scratchX")
    StoreFs.writeUTF8(s"$d/t/.scratchX/part-0", "payload")
    // the racer installs `base-aa` INSIDE our rename call — after our
    // existence check passed
    RacingInstallFileSystem.arm(s"$d/t/base-aa")
    val e = intercept[IllegalStateException] {
      StoreFs.casInstallDir(s"$d/t/.scratchX", s"$d/t/base-aa", "spec")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    // the winner's install survives; the loser's scratch is NOT nested
    // inside it and is cleaned up
    assert(StoreFs.exists(s"$d/t/base-aa"))
    assert(!StoreFs.exists(s"$d/t/base-aa/.scratchX"))
    assert(!StoreFs.exists(s"$d/t/.scratchX"))
  }

  test("strict FS: ANN index lifecycle (build, append, delete, compact) over the rename-contract branch") {
    import graft.operators.Similarity
    val dim = 4
    val dir = s"${strictPath("graft_2w_sann_")}/ix"
    val emb = (0 until 40).map { i =>
      (i.toLong, s"l$i", Array.tabulate(dim)(j => (i * 7 + j * 3) % 11 / 10.0f))
    }.toDF("vec_id", "label", "embedding")
    Similarity.materializeAnnIndex(emb, dim, dir, "fp-strict")
    val meta0 = Similarity.readAnnIndexMeta(dir).get
    assert(meta0.fingerprint === "fp-strict")
    Similarity.appendToAnnIndex(dir,
      (100 until 110).map(i => (i.toLong, s"l$i",
        Array.tabulate(dim)(j => (i + j) % 7 / 7.0f)))
        .toDF("vec_id", "label", "embedding"), "b1")
    Similarity.deleteFromAnnIndex(dir,
      Seq(100L, 101L).toDF("vec_id"), "d1")
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    assert(live.select("vec_id").as[Long].collect().toSet ===
      ((0L until 40L).toSet ++ (102L until 110L).toSet))
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    val (after, _) = Similarity.loadAnnIndex(spark, dir)
    assert(after.select("vec_id").as[Long].collect().toSet ===
      ((0L until 40L).toSet ++ (102L until 110L).toSet))
  }

  // --------------------- conditional-put (object-store) FS branch

  private def condputPath(prefix: String): String = {
    CondPutFileSystem.register(spark)
    s"condput:${Streams.scratchDir(prefix)}"
  }

  test("condput FS: claim is one conditional put; redelivery proceeds, second writer raises") {
    val t = s"${condputPath("graft_2w_cpclaim_")}/claims/from-v3"
    Commit.claim(t, "v4", "spec")
    Commit.claim(t, "v4", "spec")          // redelivery proceeds
    val e = intercept[IllegalStateException] {
      Commit.claim(t, "v5", "spec")
    }
    assert(e.getMessage.contains("held by 'v4'"))
  }

  test("condput FS: casInstallDir decides the race on the commit key; exactly one proceeds") {
    import graft.core.StoreFs
    val d = condputPath("graft_2w_cpcas_")
    StoreFs.mkdirs(s"$d/t/.scratch1")
    StoreFs.writeUTF8(s"$d/t/.scratch1/part-0", "w1")
    StoreFs.mkdirs(s"$d/t/.scratch2")
    StoreFs.writeUTF8(s"$d/t/.scratch2/part-0", "w2")
    StoreFs.casInstallDir(s"$d/t/.scratch1", s"$d/t/base-aa", "spec")
    assert(StoreFs.exists(s"$d/t/base-aa"))
    assert(StoreFs.readUTF8(s"$d/t/base-aa/part-0") === "w1")
    // occupied target -> SECOND WRITER, loser's scratch cleaned
    val e = intercept[IllegalStateException] {
      StoreFs.casInstallDir(s"$d/t/.scratch2", s"$d/t/base-aa", "spec")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    assert(!StoreFs.exists(s"$d/t/.scratch2"))
    // the commit key is a HIDDEN sibling: invisible to dir listings...
    assert(StoreFs.listDirNames(s"$d/t") === Seq("base-aa"))
    assert(StoreFs.listFileNames(s"$d/t") === Seq.empty)
    // ...and GC'd with its target
    StoreFs.deleteRecursive(s"$d/t/base-aa")
    assert(!StoreFs.exists(s"$d/t/.base-aa.__commit"))
    // a fresh install of the SAME target name then proceeds (the
    // retry-after-GC path must not be wedged by a stale key)
    StoreFs.mkdirs(s"$d/t/.scratch3")
    StoreFs.casInstallDir(s"$d/t/.scratch3", s"$d/t/base-aa", "spec")
    assert(StoreFs.exists(s"$d/t/base-aa"))
  }

  test("condput FS: a held commit key with an ABSENT target is a stale claim — the retry reclaims instead of raising SECOND WRITER") {
    import graft.core.StoreFs
    val d = condputPath("graft_2w_cpstale_")
    // simulate a writer that crashed between winning the commit key
    // and STARTING the data move: key present, target absent
    StoreFs.mkdirs(s"$d/t")
    StoreFs.writeUTF8(s"$d/t/.base-aa.__commit", "crashed-writer-nonce")
    StoreFs.mkdirs(s"$d/t/.scratch1")
    StoreFs.writeUTF8(s"$d/t/.scratch1/part-0", "w1")
    // round-12 advice fix: the SAME logical fold retries with the
    // same input set → same target name → same key; it must reclaim
    // the stale key and install, not wedge on SECOND WRITER forever
    StoreFs.casInstallDir(s"$d/t/.scratch1", s"$d/t/base-aa", "spec")
    assert(StoreFs.exists(s"$d/t/base-aa"))
    assert(StoreFs.readUTF8(s"$d/t/base-aa/part-0") === "w1")
    // once the target EXISTS, a held key is a completed install — a
    // second writer of the same input still loses loudly
    StoreFs.mkdirs(s"$d/t/.scratch2")
    StoreFs.writeUTF8(s"$d/t/.scratch2/part-0", "w2")
    val e = intercept[IllegalStateException] {
      StoreFs.casInstallDir(s"$d/t/.scratch2", s"$d/t/base-aa", "spec")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    assert(StoreFs.readUTF8(s"$d/t/base-aa/part-0") === "w1",
      "the reclaimed install must be untouched by the loser")
  }

  test("condput FS: pointer swap is one atomic object put (no absence window)") {
    import graft.core.StoreFs
    val d = condputPath("graft_2w_cpptr_")
    StoreFs.replaceFileAtomic(s"$d/meta", "gen1")
    assert(StoreFs.readPointerFile(s"$d/meta") === Some("gen1"))
    StoreFs.replaceFileAtomic(s"$d/meta", "gen2")
    assert(StoreFs.readPointerFile(s"$d/meta") === Some("gen2"))
  }

  test("condput FS: CDC fold chain end-to-end over the conditional-put branch") {
    val out = condputPath("graft_2w_cpcdc_")
    val base = spark.range(1, 21)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"))
    Streams.seedCdcState(base, s"$out/state", "k", 4)
    val b = Seq((5L, 100L, "u", "x")).toDF("k", "seq", "op", "s")
    Streams.foldCdcBatch(b, 1L, s"$out/state", "k", "seq", "op")
    Streams.foldCdcBatch(b, 1L, s"$out/state", "k", "seq", "op") // redelivery
    Commit.claim(s"$out/state/commits/from-v1", "v99", "simulated racer")
    val e = intercept[IllegalStateException] {
      Streams.foldCdcBatch(b, 2L, s"$out/state", "k", "seq", "op")
    }
    assert(e.getMessage.contains("SECOND WRITER"))
    val got = Streams.readCdcState(spark, s"$out/state")
    assert(got.count() === 20L)
    assert(got.filter(col("k") === 5L).select("s").head.getString(0) === "x")
  }

  test("condput FS: ANN index lifecycle (build, append, delete, compact) over the conditional-put branch") {
    import graft.operators.Similarity
    val dim = 4
    val dir = s"${condputPath("graft_2w_cpann_")}/ix"
    val emb = (0 until 40).map { i =>
      (i.toLong, s"l$i", Array.tabulate(dim)(j => (i * 7 + j * 3) % 11 / 10.0f))
    }.toDF("vec_id", "label", "embedding")
    Similarity.materializeAnnIndex(emb, dim, dir, "fp-condput")
    assert(Similarity.readAnnIndexMeta(dir).get.fingerprint === "fp-condput")
    Similarity.appendToAnnIndex(dir,
      (100 until 110).map(i => (i.toLong, s"l$i",
        Array.tabulate(dim)(j => (i + j) % 7 / 7.0f)))
        .toDF("vec_id", "label", "embedding"), "b1")
    Similarity.deleteFromAnnIndex(dir,
      Seq(100L, 101L).toDF("vec_id"), "d1")
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    assert(live.select("vec_id").as[Long].collect().toSet ===
      ((0L until 40L).toSet ++ (102L until 110L).toSet))
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    val (after, _) = Similarity.loadAnnIndex(spark, dir)
    assert(after.select("vec_id").as[Long].collect().toSet ===
      ((0L until 40L).toSet ++ (102L until 110L).toSet))
  }
}
