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

  // -------------------------- round-11: general-order backoff (X105)

  /** Independent order-n reference: per n-gram instance, the
   *  highest-order seen count wins at α^j·10⁶ micro-units. */
  private def refScoresN(texts: Seq[String], n: Int,
      minCount: Int): Map[Long, (Long, Long)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def grams(k: Int): Map[Seq[String], Long] = texts
      .flatMap(t => toks(t).sliding(k).filter(_.size == k).map(_.toSeq))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c = (1 to n).map(k => k -> grams(k)).toMap
    val total = texts.map(toks(_).size.toLong).sum
    def alpha(j: Int): Long =
      (0 until j).foldLeft(1000000L)((v, _) => v * 2 / 5)
    texts.zipWithIndex.map { case (t, i) =>
      val insts = toks(t).sliding(n).filter(_.size == n).map(_.toSeq).toSeq
      if (insts.isEmpty) i.toLong -> ((0L, 0L))
      else {
        val scores = insts.map { g =>
          val hit = (0 to n - 2).find { j =>
            c(n - j).get(g.drop(j)).exists(_ >= minCount)
          }
          hit match {
            case Some(j) =>
              val num = c(n - j)(g.drop(j))
              val den = if (n - j - 1 >= 1) c(n - j - 1)(g.slice(j, n - 1))
                        else total
              num * alpha(j) / den
            case None => c(1)(Seq(g.last)) * alpha(n - 1) / total
          }
        }
        i.toLong -> ((insts.size.toLong, scores.sum / insts.size))
      }
    }.toMap
  }

  private def runN(texts: Seq[String], n: Int,
      minCount: Int): Map[Long, (Long, Long)] =
    Lm.ngramBackoffScore(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "doc_id", "text", n, minCount)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("order-3 scores match the reference: seen trigram, bigram backoff, double backoff") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat sat on the hat",
      "the cat sat under a tree",
      "a dog and a cat sat",
      "one two", "zyx", "")
    for (mc <- Seq(1, 2, 3))
      assert(runN(texts, 3, mc) === refScoresN(texts, 3, mc),
        s"minCount=$mc")
  }

  test("the n=2 slice of the general form IS the bigram operator") {
    val texts = Seq(
      "the cat sat on the mat", "the cat sat on the hat",
      "the dog ran under a tree", "a dog and a cat", "zyx", "cat dog")
    for (mc <- Seq(1, 2))
      assert(runN(texts, 2, mc) === run(texts, mc), s"minCount=$mc")
  }

  test("round-12 scan dedup: each model table's tokenize+explode executes ONCE — extra references are ReusedExchange leaves") {
    // the round-11 form called gramCounts(t, k) fresh for every
    // level's numerator AND denominator plus the unigram join and the
    // total — Catalyst does not dedupe identical LOGICAL subtrees, so
    // the executed plan carried ~2n−1 tokenize+explode passes. With
    // gramTables each order is ONE shared lazy subtree: physical
    // ReuseExchange executes each table's aggregation shuffle once,
    // so the executed plan carries exactly n+1 Generate (explode)
    // operators — one tokenize per order plus the instance frame's
    // own — and every further table reference is a ReusedExchange
    // leaf. (An eager localCheckpoint pin would also give one pass
    // per table, but measured at sf1 the pins ran q135 at 6.66 s vs
    // 3.90 s lazy — materialization cost for reuse the exchange
    // cache already provides.)
    val texts = Seq(
      "the cat sat on the mat", "the cat sat on the hat",
      "the cat sat under a tree", "a dog and a cat sat")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val scored = Lm.ngramBackoffScore(docs, "doc_id", "text", n, 2)
      scored.collect() // settle AQE so executedPlan is the final plan
      // AQE's toString appends an "== Initial Plan ==" section that
      // duplicates every node — count the FINAL plan only
      val plan = scored.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val generates = "Generate".r.findAllMatchIn(plan).size
      assert(generates === n + 1,
        s"n=$n: expected one tokenize+explode per model table plus " +
          s"the instance explode (${n + 1} Generates; further table " +
          s"references must be ReusedExchange leaves), got " +
          s"$generates:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"n=$n: expected repeated table references to resolve to " +
          s"ReusedExchange leaves:\n$plan")
    }
  }

  test("the train/docs split at order n scores docs identically to the self-trained form over the union") {
    // scoring depends only on (model tables over train) and the doc's
    // own instances, so Over(train, docs) must equal the self-trained
    // score of the union restricted to docs' ids (docs ⊆ train keeps
    // the vocabulary joins lossless)
    val trainTexts = Seq(
      "the cat sat on the mat", "the cat sat on the hat",
      "a dog and a cat sat", "one two three")
    val train = trainTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val docs = train.filter($"doc_id" % 2 === 0)
    for (n <- Seq(2, 3); mc <- Seq(1, 2)) {
      val over = Lm.ngramBackoffScoreOver(train, docs,
          "doc_id", "text", n, mc)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val whole = Lm.ngramBackoffScore(train, "doc_id", "text", n, mc)
        .filter($"doc_id" % 2 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(over === whole, s"n=$n minCount=$mc")
    }
  }

  test("order-4 runs and docs shorter than n score (0, 0)") {
    val texts = Seq(
      "alpha beta gamma delta alpha beta gamma delta",
      "alpha beta gamma delta epsilon",
      "one two three")
    val got = runN(texts, 4, 2)
    assert(got === refScoresN(texts, 4, 2))
    assert(got(2L) === ((0L, 0L)))
    // doc 0: instances of (alpha beta gamma delta) appear twice
    // corpus-wide → seen at full order
    assert(got(0L)._1 === 5L)
  }
}
