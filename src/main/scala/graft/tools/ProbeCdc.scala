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
    spark.stop()
  }
}
