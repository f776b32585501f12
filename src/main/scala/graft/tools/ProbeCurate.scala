package graft.tools

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Dev probe (cited by PLANS.md/SCALE.md): per-batch cost of the
 *  STREAMING curation fold vs admitted-state size — the round-12
 *  incremental-state claim. Seeds survivor state of N distinct docs
 *  (one admit-all fold), then times ONE identical 10k-doc fold at
 *  each N and counts its Spark jobs. The claim under test: per-batch
 *  wall-time and job count are FLAT across ≥8× state growth — the
 *  fold reads the two-column admit-time hash index and the
 *  vocabulary-saturating LM count tables, never the state text
 *  (round 11 re-hashed and re-trained over ALL state text per batch,
 *  so its per-batch cost grew linearly with everything ever
 *  admitted). */
object ProbeCurate {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // BOUNDED-vocabulary corpus (the natural-language regime SCALE.md
    // pins for q125's word table): tokens come from 5 modular residue
    // classes, so texts are pairwise DISTINCT up to lcm(31,29,23,19,17)
    // ≈ 6.7M docs while the gram space saturates (≤ 31·29 bigram and
    // 31·29·23 trigram combinations per adjacent class pair/triple).
    // A unique-token-per-doc corpus would instead grow the MODEL
    // linearly with the corpus — a cost ANY implementation pays,
    // which would mask the state-rescan effect this probe isolates.
    def mkDocs(n: Long, offset: Long, tag: String) =
      spark.range(n).select((col("id") + offset).as("doc_id"),
        concat_ws(" ", lit("the"),
          concat(lit(s"a$tag"), (col("id") + offset) % 31),
          lit("cat sat"),
          concat(lit("b"), (col("id") + offset) % 29),
          lit("on the"),
          concat(lit("c"), (col("id") + offset) % 23),
          lit("mat with"),
          concat(lit("d"), (col("id") + offset) % 19),
          lit("a hat"),
          concat(lit("e"), (col("id") + offset) % 17)).as("text"))
    for (order <- Seq(2, 3); n <- Seq(100000L, 400000L, 800000L)) {
      val dir = Streams.scratchDir("graft_probe_cur_")
      def fold(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
        Streams.curateFoldBatch(batch, id, s"$dir/state", "doc_id",
          "text", 0.0, 0L, 8, "s", lmOrder = order) { (df, _) =>
          df.write.format("noop").mode("overwrite").save()
        }
      fold(mkDocs(n, 0L, ""), 0L) // seed: admit-all, state = n docs
      // warmup fold absorbs first-touch costs; the TIMED fold is the
      // steady-state per-micro-batch cost (the ProbeCdc methodology).
      // Distinct `tag`s keep the batches exact-dup-free against state
      // (grams still shared with it) at every seed size.
      fold(mkDocs(10000L, 900000000L, "w").localCheckpoint(true), 1L)
      val batch = mkDocs(10000L, 910000000L, "t").localCheckpoint(true)
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fold(batch, 2L) finally {
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE-CURATE order=$order state_docs=$n%7d " +
        f"fold=$sec%6.2f s jobs=${counter.get()}%3d")
    }
    spark.stop()
  }
}
