package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** X143 whole-doc best-fit-decreasing packing: the histogram fold
 *  must equal a per-item BFD simulation exactly, conserve tokens,
 *  and beat the no-split baselines on the real corpus. */
class PackBfdSpec extends SparkTestBase {

  import spark.implicits._

  /** Per-item BFD reference: explicit bin list, each item of
   *  descending size into the smallest remainder that fits. */
  private def refBfd(seqLen: Int, np1s: Seq[Long]): Map[Long, Long] = {
    val bins = scala.collection.mutable.ArrayBuffer[Long]()
    val items = scala.collection.mutable.ArrayBuffer[Long]()
    np1s.foreach { n =>
      (0L until n / seqLen).foreach(_ => bins += 0L) // full chunks
      if (n % seqLen > 0) items += n % seqLen
    }
    items.sortBy(-_).foreach { s =>
      val fit = bins.zipWithIndex.filter(_._1 >= s)
      if (fit.isEmpty) bins += (seqLen - s)
      else {
        val (_, i) = fit.minBy(_._1)
        bins(i) -= s
      }
    }
    bins.groupBy(identity).map { case (rem, xs) =>
      (seqLen - rem) -> xs.size.toLong
    }
  }

  private def runHist(seqLen: Int, np1s: Seq[Long]): Map[Long, Long] = {
    // synthesize an ids frame with count = np1 - 1 per doc
    val rows = np1s.zipWithIndex.flatMap { case (n, d) =>
      (0L until n - 1).map(p => (d.toLong, p, 1))
    }
    Bpe.packBfdHistogram(rows.toDF("doc_id", "pos", "token_id"),
        "doc_id", seqLen)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("histogram fold ≡ per-item best-fit-decreasing simulation (randomized multisets)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 8) {
      val L = Seq(8, 16, 32)(trial % 3)
      val np1s = (0 until 40).map(_ => 2L + rnd.nextInt(3 * L).toLong)
      val got = runHist(L, np1s)
      assert(got === refBfd(L, np1s), s"trial=$trial L=$L np1s=$np1s")
      // conservation: packed slots == item volume
      val packed = got.map { case (t, n) => t * n }.sum
      assert(packed === np1s.sum, s"trial=$trial")
    }
  }

  test("degenerate shapes: exact multiples, all-tiny docs, empty input") {
    assert(runHist(8, Seq(8L, 16L)) === Map(8L -> 3L))
    assert(runHist(8, Seq.empty) === Map.empty)
    // 20 items of size 2 → 8/2=4 per bin → 5 full bins
    assert(runHist(8, Seq.fill(20)(2L)) === Map(8L -> 5L))
  }

  test("on the real corpus: BFD fill beats arrival-order first-fit beats one-doc-per-window; concat (q134) stays the ceiling") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, "text", 16)
    val L = 64
    val np1s = Bpe.encodeIds(docs, "text", "doc_id", merges)
      .groupBy("doc_id").agg((count(lit(1)) + 1L).as("np1"))
      .collect().map(_.getLong(1)).toSeq
    def fill(hist: Map[Long, Long]): Double = {
      val bins = hist.values.sum
      hist.map { case (t, n) => t * n }.sum.toDouble / (bins * L)
    }
    val bfd = fill(runHist(L, np1s))
    // arrival-order first-fit over whole items (same max-length split)
    val ffBins = scala.collection.mutable.ArrayBuffer[Long]()
    np1s.foreach { n =>
      (0L until n / L).foreach(_ => ffBins += 0L)
      val s = n % L
      if (s > 0) ffBins.indexWhere(_ >= s) match {
        case -1 => ffBins += (L - s)
        case i  => ffBins(i) -= s
      }
    }
    val ff = ffBins.map(L - _).sum.toDouble / (ffBins.size * L)
    // one doc-chunk per window (the pad-everything baseline)
    val naiveBins = np1s.map(n => n / L + (if (n % L > 0) 1 else 0)).sum
    val naive = np1s.sum.toDouble / (naiveBins * L)
    assert(bfd >= ff && ff > naive,
      s"fill ordering violated: bfd=$bfd ff=$ff naive=$naive")
    assert(bfd > 0.95, s"BFD fill should approach 1 on the real mix: $bfd")
    // q134's split-concat packing fills every window but the last —
    // the ceiling whole-doc packing trades against
    assert(bfd <= 1.0)
  }
}
