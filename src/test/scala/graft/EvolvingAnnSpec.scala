package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.Streams

/** X93 evolving ANN index (round-9 item 3): the X56 append/delete/
 *  compact lifecycle for vectors, plus the measured RE-ROUTE check —
 *  a corpus drifting from uniform to clustered no longer keeps its
 *  stale sign route forever. */
class EvolvingAnnSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 16

  private def corpus(ids: Range, spread: Double, seed: Int = 42) = {
    val rnd = new scala.util.Random(seed)
    val center = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    ids.map { i =>
      val r = new scala.util.Random(seed * 1000003 + i)
      val v = Array.tabulate(dim)(d =>
        center(d) + (r.nextDouble() * 2 - 1) * spread)
      (i.toLong, s"l${i % 5}", v.toSeq)
    }.toDF("vec_id", "label", "embedding")
  }

  test("append is visible to the next probe with ZERO corpus rescans") {
    val scans = spark.sparkContext.longAccumulator("corpus_scans")
    val touch = udf { (l: String) => scans.add(1); l }.asNondeterministic()
    val base = corpus(0 until 300, 1.0)
      .withColumn("label", touch(col("label")))
    val dir = Streams.scratchDir("graft_annevo_app_")
    Similarity.materializeAnnIndex(base, dim, dir, "fpE")
    val afterBuild = scans.value
    assert(afterBuild > 0L)
    // append a batch whose first vector DUPLICATES vec_id 7's
    // embedding — it must become 7's top-1 neighbor (sim 1.0)
    val dup = corpus(0 until 300, 1.0).filter(col("vec_id") === 7L)
      .select(lit(9000L).as("vec_id"), col("label"), col("embedding"))
    Similarity.appendToAnnIndex(dir,
      dup.unionByName(corpus(9001 until 9050, 1.0)), "b1")
    val q7 = corpus(0 until 300, 1.0).filter(col("vec_id") === 7L)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val top = Similarity.annTopKIndexed(spark, dir, q7, 1, Some("fpE"))
      .head()
    assert(top.getLong(1) === 9000L,
      s"appended duplicate must be the top-1 neighbor: $top")
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-12)
    assert(scans.value === afterBuild,
      s"append+probe must not rescan the corpus: $afterBuild → ${scans.value}")
  }

  test("delete hides immediately; delete → re-add revives with fresh content only") {
    val dir = Streams.scratchDir("graft_annevo_del_")
    val base = corpus(0 until 200, 1.0)
    Similarity.materializeAnnIndex(base, dim, dir, "fpD")
    val dup = base.filter(col("vec_id") === 3L)
      .select(lit(8000L).as("vec_id"), col("label"), col("embedding"))
    Similarity.appendToAnnIndex(dir, dup, "b1")
    val q3 = base.filter(col("vec_id") === 3L)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def top1 = Similarity.annTopKIndexed(spark, dir, q3, 1, Some("fpD")).head()
    assert(top1.getLong(1) === 8000L)
    // delete → hidden at once
    Similarity.deleteFromAnnIndex(dir, Seq(8000L).toDF("vec_id"), "d1")
    assert(top1.getLong(1) !== 8000L)
    // re-add the id with DIFFERENT content (vec_id 5's embedding):
    // the tombstone clears, the stale pre-delete rows purge — 8000
    // screens as 5's duplicate now, never as 3's
    val readd = base.filter(col("vec_id") === 5L)
      .select(lit(8000L).as("vec_id"), col("label"), col("embedding"))
    Similarity.appendToAnnIndex(dir, readd, "b2")
    val q5 = base.filter(col("vec_id") === 5L)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val t5 = Similarity.annTopKIndexed(spark, dir, q5, 1, Some("fpD")).head()
    assert(t5.getLong(1) === 8000L && math.abs(t5.getDouble(2) - 1.0) < 1e-12)
    val t3 = Similarity.annTopKIndexed(spark, dir, q3, 1, Some("fpD")).head()
    assert(!(t3.getLong(1) == 8000L && math.abs(t3.getDouble(2) - 1.0) < 1e-12),
      s"revived id must not screen with its DELETED content: $t3")
  }

  test("revival rewrite is ONE union job: job count independent of segments hit") {
    // round-10 item 6: the per-segment revival loop launched
    // O(segments-hit) sequential jobs; the union rewrite's job count
    // must not grow with the number of hit data/tombstone segments
    def jobsFor(nSegs: Int): Int = {
      val dir = Streams.scratchDir(s"graft_annevo_jobs${nSegs}_")
      Similarity.materializeAnnIndex(corpus(0 until 60, 1.0), dim, dir, "fpJ")
      // spread ids 5000..5000+4*nSegs over nSegs data segments and
      // delete them through nSegs tombstone segments
      for (s <- 0 until nSegs) {
        Similarity.appendToAnnIndex(dir,
          corpus(5000 + 4 * s until 5004 + 4 * s, 1.0), s"b$s")
        Similarity.deleteFromAnnIndex(dir,
          (5000L + 4 * s until 5004L + 4 * s).toDF("vec_id"), s"d$s")
      }
      val sc = spark.sparkContext
      val group = s"ann-revival-$nSegs"
      sc.setJobGroup(group, "count revival jobs")
      try Similarity.appendToAnnIndex(dir,
        corpus(5000 until 5000 + 4 * nSegs, 1.0), "bR")
      finally sc.clearJobGroup()
      // status store fills asynchronously — poll briefly for stability
      def ids = sc.statusTracker.getJobIdsForGroup(group).length
      var last = ids; var stable = 0
      while (stable < 3) {
        Thread.sleep(50)
        val cur = ids
        if (cur == last) stable += 1 else { last = cur; stable = 0 }
      }
      last
    }
    val one = jobsFor(1)
    val four = jobsFor(4)
    assert(four === one,
      s"revival job count must not grow with segments hit: 1 seg -> $one jobs, 4 segs -> $four jobs")
  }

  test("counts ledger tracks live (n, s2) through append/delete/compaction") {
    val dir = Streams.scratchDir("graft_annevo_cnt_")
    Similarity.materializeAnnIndex(corpus(0 until 200, 1.0), dim, dir, "fpC")
    assert(Similarity.annIndexStats(spark, dir)._1 === 200L)
    Similarity.appendToAnnIndex(dir, corpus(1000 until 1100, 1.0), "b1")
    assert(Similarity.annIndexStats(spark, dir)._1 === 300L)
    Similarity.deleteFromAnnIndex(dir,
      (1000L until 1050L).toDF("vec_id"), "d1")
    val (n1, s21) = Similarity.annIndexStats(spark, dir)
    assert(n1 === 250L)
    // a RETRIED delete recomputes the identical correction — never a
    // double subtraction
    Similarity.deleteFromAnnIndex(dir,
      (1000L until 1050L).toDF("vec_id"), "d1")
    assert(Similarity.annIndexStats(spark, dir) === ((n1, s21)))
    // compaction folds segments, recomputes the ledger, drops tombstones
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    assert(Similarity.annIndexStats(spark, dir) === ((n1, s21)))
    val meta = Similarity.readAnnIndexMeta(dir).get
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    assert(live.count() === 250L)
    assert(new java.io.File(s"$dir/data-g${meta.gen}").listFiles()
      .count(f => f.isDirectory && !f.getName.startsWith(".")) === 1)
  }

  test("append redelivered AFTER a compaction folded its segment is a no-op — ids and ledger stay single") {
    val dir = Streams.scratchDir("graft_annevo_fold_")
    Similarity.materializeAnnIndex(corpus(0 until 100, 1.0), dim, dir, "fpF")
    val batch = corpus(2000 until 2050, 1.0)
    Similarity.appendToAnnIndex(dir, batch, "b1")
    val (n0, s20) = Similarity.annIndexStats(spark, dir)
    assert(n0 === 150L)
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    Similarity.appendToAnnIndex(dir, batch, "b1") // redelivery after fold
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    assert(live.count() === 150L, "no duplicate rows after redelivered fold")
    assert(live.select("vec_id").distinct().count() === 150L)
    assert(Similarity.annIndexStats(spark, dir) === ((n0, s20)),
      "counts ledger must not double-count a redelivered folded batch")
    // a genuinely NEW batch still appends
    Similarity.appendToAnnIndex(dir, corpus(3000 until 3010, 1.0), "b2")
    assert(Similarity.annIndexStats(spark, dir)._1 === 160L)
  }

  test("condput FS: compaction-fold redelivery contract holds over the conditional-put store branch") {
    CondPutFileSystem.register(spark)
    val dir = s"condput:${Streams.scratchDir("graft_annevo_cpfold_")}"
    Similarity.materializeAnnIndex(corpus(0 until 100, 1.0), dim, dir, "fpCP")
    val batch = corpus(2000 until 2050, 1.0)
    Similarity.appendToAnnIndex(dir, batch, "b1")
    val (n0, s20) = Similarity.annIndexStats(spark, dir)
    assert(n0 === 150L)
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    Similarity.appendToAnnIndex(dir, batch, "b1") // redelivery after fold
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    assert(live.count() === 150L, "no duplicate rows after redelivered fold")
    assert(Similarity.annIndexStats(spark, dir) === ((n0, s20)))
    // a second compaction folds again: the prior folded-* ledger is
    // SUBSUMED into the new one and GC'd (bounded ledger count), and
    // a redelivery of the twice-folded batch still no-ops
    Similarity.deleteFromAnnIndex(dir,
      spark.range(2000, 2002).select(col("id").as("vec_id")), "d1")
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    val (after, _) = Similarity.loadAnnIndex(spark, dir)
    assert(after.count() === 148L)
    val ledgers = graft.core.StoreFs.listFileNames(s"$dir/data-g0")
      .filter(_.startsWith("folded-"))
    assert(ledgers.size === 1, s"superseded ledgers not GC'd: $ledgers")
    Similarity.appendToAnnIndex(dir, batch, "b1") // folded two folds ago
    assert(Similarity.loadAnnIndex(spark, dir)._1.count() === 148L)
  }

  test("semantic ingest screen: corpus dup, in-batch dup, and batch-2 dup of a batch-1 survivor all screen") {
    val dir = Streams.scratchDir("graft_annevo_scr_")
    val base = corpus(0 until 50, 1.0)
    Similarity.materializeAnnIndex(base, dim, dir, "fpS")
    def copyOf(srcId: Long, newId: Long) =
      base.filter(col("vec_id") === srcId)
        .select(lit(newId).as("vec_id"), col("label"), col("embedding"))
    val novel1 = corpus(7001 until 7002, 1.0, seed = 99)
      .select(lit(101L).as("vec_id"), col("label"), col("embedding"))
    val novel2 = corpus(7002 until 7003, 1.0, seed = 77)
      .select(lit(201L).as("vec_id"), col("label"), col("embedding"))
    // b1: copy of corpus 0 (dropped), novel 101 (survives), copy of
    // 101 at id 102 (in-batch keep-first drop)
    val b1 = copyOf(0L, 100L).unionByName(novel1)
      .unionByName(novel1.select(lit(102L).as("vec_id"), col("label"),
        col("embedding")))
    // b2: copy of b1-SURVIVOR 101 (dropped via the APPENDED segment —
    // the evolution under test) + novel 201 (survives)
    val b2 = novel1.select(lit(200L).as("vec_id"), col("label"),
      col("embedding")).unionByName(novel2)
    val streamDir = Streams.scratchDir("graft_annevo_scr_in_")
    Streams.writeSinglePartFile(b1, streamDir, "b1.parquet", 1600000000000L)
    Streams.writeSinglePartFile(b2, streamDir, "b2.parquet", 1600000060000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val got = collection.mutable.Map[Long, Set[Long]]()
    val q = Streams.screenIngestSemantic(stream, dir, 0.999,
        expectFingerprint = Some("fpS")) { (survivors, batchId) =>
        got(batchId) = survivors.select("vec_id").as[Long].collect().toSet
      }
      .option("checkpointLocation", Streams.scratchDir("graft_annevo_scr_ck_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.filter(_._2.nonEmpty) === Map(0L -> Set(101L), 1L -> Set(201L)),
      s"survivor sets wrong: $got")
    // the index now also holds the survivors
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    val ids = live.select("vec_id").as[Long].collect().toSet
    assert(ids.contains(101L) && ids.contains(201L) &&
      !ids.contains(100L) && !ids.contains(200L))
  }

  test("late-data contract: admission is ARRIVAL order — a lower-keyed doc delivered later is the one dropped") {
    // round-10 item 7: the screen has no watermark; source batching
    // defines arrival order, and arrival order — not key order —
    // decides which member of a cross-batch near-dup pair survives.
    // Batch 1 delivers the HIGHER id 500 (novel → admitted, appended);
    // batch 2 delivers the LOWER id 60 with the same embedding → 60 is
    // screened against the evolved index and dropped, even though the
    // one-shot batch semantics (q97-style, keep-lowest-id) would have
    // kept 60 and dropped 500. The spec pins that divergence.
    val dir = Streams.scratchDir("graft_annevo_late_")
    Similarity.materializeAnnIndex(corpus(0 until 50, 1.0), dim, dir, "fpL")
    val novel = corpus(8001 until 8002, 1.0, seed = 55)
    val hi = novel.select(lit(500L).as("vec_id"), col("label"), col("embedding"))
    val lateLow = novel.select(lit(60L).as("vec_id"), col("label"), col("embedding"))
    val streamDir = Streams.scratchDir("graft_annevo_late_in_")
    Streams.writeSinglePartFile(hi, streamDir, "b1.parquet", 1600000000000L)
    Streams.writeSinglePartFile(lateLow, streamDir, "b2.parquet", 1600000060000L)
    val stream = spark.readStream.schema(hi.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val got = collection.mutable.Map[Long, Set[Long]]()
    val q = Streams.screenIngestSemantic(stream, dir, 0.999,
        expectFingerprint = Some("fpL")) { (survivors, batchId) =>
        got(batchId) = survivors.select("vec_id").as[Long].collect().toSet
      }
      .option("checkpointLocation", Streams.scratchDir("graft_annevo_late_ck_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got(0L) === Set(500L) && got(1L) === Set.empty[Long],
      s"arrival order must decide admission: $got")
    val (live, _) = Similarity.loadAnnIndex(spark, dir)
    val ids = live.select("vec_id").as[Long].collect().toSet
    assert(ids.contains(500L) && !ids.contains(60L))
  }

  test("clustered growth flips the stale sign route at the measured threshold") {
    val dir = Streams.scratchDir("graft_annevo_rt_")
    val m0 = Similarity.materializeAnnIndex(
      corpus(0 until 300, 1.0), dim, dir, "fpR")
    assert(m0.route === "sign", s"uniform base must sign-route: $m0")
    // no drift yet: the check is a no-op
    val (mSame, rebuilt0) = Similarity.reRouteAnnIndex(spark, dir)
    assert(!rebuilt0 && mSame === m0)
    // inject a tight angular cluster (spread ≈ 0) — all its vectors
    // share a sign bucket, so the ledger's s2 grows quadratically
    Similarity.appendToAnnIndex(dir, corpus(5000 until 5600, 0.01), "b1")
    val (n, s2) = Similarity.annIndexStats(spark, dir)
    assert(s2 > n * 256L,
      s"cluster injection must cross the skew budget: n=$n s2=$s2")
    val (m1, rebuilt) = Similarity.reRouteAnnIndex(spark, dir)
    assert(rebuilt && m1.route === "grid" && m1.gen === m0.gen + 1,
      s"drifted index must rebuild under grid in a new generation: $m1")
    // the rebuilt generation is complete and probe-able; the old one
    // is gone
    val q = corpus(5000 until 5600, 0.01).limit(5)
      .select(col("vec_id").as("q_id"), col("embedding"))
    assert(Similarity.annTopKIndexed(spark, dir, q, 3, Some("fpR"))
      .count() > 0)
    assert(!new java.io.File(s"$dir/data-g${m0.gen}").exists())
    // stats carried into the new generation's recomputed ledger
    assert(Similarity.annIndexStats(spark, dir)._1 === n)
    // and the fresh grid ledger no longer trips the check
    val (_, rebuiltAgain) = Similarity.reRouteAnnIndex(spark, dir)
    assert(!rebuiltAgain, "a freshly re-routed index must be stable")
    // REVERSION (the mirror bug): delete the injected cluster —
    // compaction re-measures the sign-bucket mass into the meta, and
    // the grid arm's check flips the index BACK to sign
    Similarity.deleteFromAnnIndex(dir,
      (5000L until 5600L).toDF("vec_id"), "d1")
    assert(Similarity.compactAnnIndex(spark, dir, maxSegments = 1))
    val (m2, reverted) = Similarity.reRouteAnnIndex(spark, dir)
    assert(reverted && m2.route === "sign" && m2.gen === m1.gen + 1,
      s"cluster deletion must revert grid→sign after compaction: $m2")
    assert(Similarity.annIndexStats(spark, dir)._1 === 300L)
    val (_, flapped) = Similarity.reRouteAnnIndex(spark, dir)
    assert(!flapped, "the reverted index must be stable too")
    // probe parity AFTER the reversion (round-10 item 8): the
    // reverted generation must answer queries end-to-end under the
    // sign bucketing — exact copies of base vectors find their
    // originals at sim 1.0, and nothing from the deleted cluster
    // ever surfaces
    val probes = corpus(0 until 300, 1.0)
      .filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + 900000L).as("q_id"), col("embedding"))
    val top = Similarity.annTopKIndexed(spark, dir, probes, 1, Some("fpR"))
      .collect()
    assert(top.length === probes.count())
    for (r <- top) {
      assert(r.getLong(1) === r.getLong(0) - 900000L,
        s"post-reversion top-1 must be the original vector: $r")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    }
    val any = Similarity.annTopKIndexed(spark, dir, probes, 3, Some("fpR"))
      .filter(col("n_id") >= 5000L && col("n_id") < 5600L)
    assert(any.isEmpty, "deleted-cluster ids must never surface post-reversion")
  }
}
