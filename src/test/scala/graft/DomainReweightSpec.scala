package graft

import graft.operators.Curation

/** X148: quantized multiplicative-weights domain reweighting. The
 *  whole integer fold must equal an independent plain-Scala replay,
 *  rarer-vocabulary domains must never end up with a smaller weight
 *  scale than common ones, the bucket must clamp at maxBucket, and
 *  ppm weights must sum to 10⁶ within the floor-division slack. */
class DomainReweightSpec extends SparkTestBase {

  import spark.implicits._

  // three domains with controlled vocabulary rarity: "common" docs
  // reuse two corpus-wide words, "mid" mixes, "rare" docs are almost
  // all singleton tokens (low mean logfreq = high reference loss)
  private def corpus() = (0 until 90).map { i =>
    val d = i % 3
    val text = d match {
      case 0 => "the quick the quick the quick brown"
      case 1 => s"the quick unique$i brown fox"
      case _ => s"only$i singular$i tokens$i here$i word$i"
    }
    (i.toLong, text, Seq("common", "mid", "rare")(d))
  }.toDF("doc_id", "text", "source")

  private def rows(lambda: Long, maxBucket: Int) =
    Curation.domainReweight(corpus(), "doc_id", "text", "source",
        lambda, maxBucket)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("the hedge fold equals an independent replay of its definition") {
    val lambda = 50000L
    val got = rows(lambda, 6)
    // replay from the judged per-doc scores
    val scored = graft.operators.Quality
      .unigramSurprisal(corpus(), "doc_id", "text")
      .join(corpus().select("doc_id", "source"), "doc_id")
      .select("source", "mean_logfreq_micro")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val base = scored.map(_._2).sum / scored.length
    val byDom = scored.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (d, xs) =>
        val avg = xs.map(_._2).sum / xs.length
        val excess = math.max(base - avg, 0L)
        val bucket = math.min(excess / lambda, 6L)
        (d, xs.length.toLong, avg, excess, bucket,
          xs.length.toLong * (1L << bucket))
    }
    val tot = byDom.map(_._6).sum
    val want = byDom.map { case (d, n, avg, ex, b, w) =>
      (d, n, avg, ex, b, w * 1000000L / tot)
    }
    assert(got.toSeq === want)
  }

  test("rarer-vocabulary domains bucket at least as high as common ones, and buckets clamp") {
    val got = rows(50000L, 6).map(r => r._1 -> r._5).toMap
    assert(got("rare") >= got("mid") && got("mid") >= got("common"),
      s"bucket order must track vocabulary rarity: $got")
    assert(got("rare") >= 1L, "the rare domain must actually upweight")
    val clamped = rows(1L, 2).map(r => r._1 -> r._5).toMap
    assert(clamped.values.forall(_ <= 2L), s"buckets must clamp: $clamped")
  }

  test("ppm weights sum to one million within floor-division slack") {
    val ppm = rows(50000L, 6).map(_._6)
    assert(ppm.sum <= 1000000L && ppm.sum >= 1000000L - ppm.length,
      s"got ${ppm.sum}")
  }
}
