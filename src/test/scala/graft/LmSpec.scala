package graft

import graft.operators.Lm

/** X101 stupid-backoff bigram LM: scores pinned against an
 *  independent in-spec reference (plain Scala maps, no DataFrame
 *  machinery shared with the operator) — seen-bigram conditional,
 *  α=2/5 unigram backoff, minCount pruning, short-doc zeros. */
class LmSpec extends SparkTestBase {

  import spark.implicits._

  /** Independent reference: (n_bigrams, mean_score_micro) per doc. */
  private def refScores(texts: Seq[String],
      minCount: Int): Map[Long, (Long, Long)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val allToks = texts.flatMap(toks)
    val uni = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = allToks.size.toLong
    val bi = texts.flatMap(t => toks(t).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minCount)
    texts.zipWithIndex.map { case (t, i) =>
      val pairs = toks(t).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
      if (pairs.isEmpty) i.toLong -> ((0L, 0L))
      else {
        val scores = pairs.map { case (w1, w2) =>
          bi.get((w1, w2)) match {
            case Some(c2) => c2 * 1000000L / uni(w1)
            case None     => uni(w2) * 400000L / total
          }
        }
        i.toLong -> ((pairs.size.toLong, scores.sum / pairs.size))
      }
    }.toMap
  }

  private def run(texts: Seq[String],
      minCount: Int): Map[Long, (Long, Long)] =
    Lm.bigramBackoffScore(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", minCount)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("scores match the reference: seen conditional vs pruned backoff") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat sat on the hat",
      "the dog ran under a tree",
      "a dog and a cat",
      "zyx")
    for (mc <- Seq(1, 2, 3))
      assert(run(texts, mc) === refScores(texts, mc), s"minCount=$mc")
  }

  test("short and empty documents score (0, 0), never NULL") {
    val texts = Seq("solo", "", "   ", "two words")
    val got = run(texts, 2)
    assert(got(0L) === ((0L, 0L)))
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((0L, 0L)))
    assert(got(3L)._1 === 1L)
    assert(got === refScores(texts, 2))
  }

  test("a hapax bigram of frequent words takes the backoff path under minCount=2") {
    // "cat dog" occurs once though both words are frequent; with
    // minCount=2 it must score via c1(dog), not c2/c1(cat)
    val texts = Seq("dog dog dog cat cat cat", "cat dog")
    val got = run(texts, 2)
    // doc 1's single bigram (cat,dog): pruned → ⌊4·10⁵·c1(dog)/T⌋
    //   = ⌊400000·4/8⌋ = 200000
    assert(got(1L) === ((1L, 200000L)))
    assert(got === refScores(texts, 2))
  }
}
