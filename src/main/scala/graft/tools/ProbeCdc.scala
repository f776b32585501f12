package graft.tools

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Dev probe (cited by PLANS.md): per-batch fold cost of the bucketed
 *  CDC state vs state size. Seeds a state of N keys into 64 buckets
 *  (and, as the control, into 1 bucket — the pre-round-8 full-rewrite
 *  behavior by construction), then folds a FIXED 10k-change batch
 *  whose keys land in few buckets and measures the fold wall time.
 *  The claim under test: bucketed fold cost tracks |batch| + touched
 *  buckets, not |state|. */
object ProbeCdc {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val batchKeys = 10000
    // ~220 B/row payload: state BYTES are what a real MERGE pays for
    for (n <- Seq(500000L, 2000000L, 8000000L); buckets <- Seq(1, 64)) {
      val out = Streams.scratchDir(s"graft_probe_cdc_")
      val base = spark.range(n).select(col("id").as("k"),
        concat(lit("p"), col("id"),
          lit("x" * 200)).as("v"))
      Streams.seedCdcState(base, s"$out/state", "k", buckets)
      // batch keys all in ONE bucket, so the bucketed fold touches 1
      val bucketOf = Streams.cdcBucket(col("k"), buckets)
      val keys = base.select(col("k")).withColumn("b", bucketOf)
        .filter(col("b") === 0).limit(batchKeys).select("k")
      val batch = keys.select(col("k"), (col("k") + 1000000000L).as("seq"),
        lit("u").as("op"), lit("updated").as("v"))
        .localCheckpoint(eager = true) // exclude batch synthesis from timing
      // warmup fold absorbs first-job costs; the TIMED fold is the
      // steady-state per-micro-batch cost
      Streams.foldCdcBatch(batch, 0L, s"$out/state", "k", "seq", "op")
      val t0 = System.nanoTime()
      Streams.foldCdcBatch(batch, 1L, s"$out/state", "k", "seq", "op")
      val sec = (System.nanoTime() - t0) / 1e9
      val touched = Option(new java.io.File(s"$out/state/v1/data").listFiles())
        .map(_.count(f => f.isDirectory && f.getName.startsWith("__bucket=")))
        .getOrElse(0)
      println(f"PROBE state=$n%8d buckets=$buckets%2d touched=$touched%2d fold=$sec%6.2f s")
    }
    // ---- incremental SCD2 history: per-batch splice cost vs FEED
    // LENGTH. The claim under test (round-9 item 2): maintaining the
    // audit table incrementally costs the same at batch 2 and batch
    // 32, while the round-8 full-feed re-window grows linearly with
    // every journaled batch. Fixed 10k-change batches, distinct seq
    // ranges per batch (every change is a new version — worst case
    // for history growth).
    {
      val n = 4000000L
      val out = Streams.scratchDir("graft_probe_scd2_")
      val base = spark.range(n).select(col("id").as("k"),
        concat(lit("p"), col("id"), lit("x" * 200)).as("v"))
      Streams.seedScd2History(base, s"$out/hist", "k", 64)
      // batch keys all in ONE bucket (same rule as the fold probe
      // above): the incremental fold's read is that bucket's history,
      // not the whole table — the claim is the SLOPE vs feed length
      val keys = base.select("k")
        .withColumn("b", Streams.cdcBucket(col("k"), 64))
        .filter(col("b") === 0).limit(10000).select("k")
        .localCheckpoint(true)
      var feed = spark.emptyDataFrame
      for (b <- 1 to 32) {
        val batch = keys.select(col("k"),
          (col("k") * 100 + b).as("seq"), lit("u").as("op"),
          concat(lit(s"u$b-"), col("k")).as("v"))
          .localCheckpoint(eager = true)
        feed = if (b == 1) batch else feed.unionByName(batch)
        val t0 = System.nanoTime()
        Streams.foldScd2Batch(batch, b.toLong, s"$out/hist", "k", "seq", "op")
        val sec = (System.nanoTime() - t0) / 1e9
        if (Seq(2, 8, 32).contains(b)) {
          // the round-8 shape: re-window base + ENTIRE feed
          val t1 = System.nanoTime()
          val base0 = base.select(col("k"), lit(0L).as("seq"),
            lit("u").as("op"), col("v"))
          graft.operators.Cdc.scd2History(base0.unionByName(feed),
              "k", "seq", "op", Seq("v"))
            .write.format("noop").mode("overwrite").save()
          val rebuild = (System.nanoTime() - t1) / 1e9
          println(f"PROBE-SCD2 feed_batches=$b%2d incr_fold=$sec%6.2f s " +
            f"full_rebuild=$rebuild%6.2f s")
        }
      }
    }
    // ---- bucket SPLIT: an 8M-row state seeded at 64 buckets (~125k
    // rows/bucket) folds with splitAboveRows=100k — fold 0 pays ONE
    // full rewrite that re-buckets 64 → 256 (the extendible-hashing
    // amortized cost), and every later fold is back to
    // touched-bucket-only at a quarter of the old bucket size. The
    // claim: nBuckets tracks state size instead of being frozen at
    // seed, and per-fold cost stays flat after the split.
    {
      val n = 8000000L
      val out = Streams.scratchDir("graft_probe_split_")
      val base = spark.range(n).select(col("id").as("k"),
        concat(lit("p"), col("id"), lit("x" * 200)).as("v"))
      Streams.seedCdcState(base, s"$out/state", "k", 64)
      // keys in bucket 0 of the POST-split numbering (256 | hash ⇒
      // also bucket 0 pre-split): one touched bucket in both regimes
      val keys = base.select(col("k"))
        .withColumn("b", Streams.cdcBucket(col("k"), 256))
        .filter(col("b") === 0).limit(10000).select("k")
        .localCheckpoint(true)
      for (b <- 0 to 3) {
        val batch = keys.select(col("k"), (col("k") * 100 + b).as("seq"),
          lit("u").as("op"), lit(s"s$b").as("v")).localCheckpoint(true)
        val t0 = System.nanoTime()
        Streams.foldCdcBatch(batch, b.toLong, s"$out/state", "k", "seq",
          "op", splitAboveRows = Some(100000L))
        val sec = (System.nanoTime() - t0) / 1e9
        val nb = Streams.readCdcManifest(s"$out/state/v$b").nBuckets
        println(f"PROBE-SPLIT fold=$b nBuckets=$nb%3d cost=$sec%6.2f s")
      }
    }
    spark.stop()
  }
}
