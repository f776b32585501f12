package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** X117 hybrid lexical+dense RRF fusion: pinned against an
 *  independent in-memory reference (set-Jaccard ranks, cosine ranks,
 *  integer reciprocal-rank units), including the single-channel and
 *  tie-break paths. */
class RetrievalFusionSpec extends SparkTestBase {

  import spark.implicits._

  // 6 docs: 1 is lexically close to the query but dense-far, 2 the
  // reverse, 3 middling in both, 4/5 background
  private val texts = Seq(
    0L -> "a b c d", 1L -> "a b c e", 2L -> "x y z w",
    3L -> "a b x y", 4L -> "c d e f", 5L -> "p q r s")
  private val vecs = Seq(
    0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f),
    2L -> Seq(1f, 0.1f, 0f, 0f), 3L -> Seq(0.9f, 0.1f, 0f, 0f),
    4L -> Seq(0f, 0f, 1f, 0f), 5L -> Seq(0f, 0f, 0f, 1f))

  /** Independent reference: same distinct-token Jaccard micro-units,
   *  same ascending-index double cosine, same ⌊10⁹/(kRrf+rank)⌋
   *  fusion, all ranks tie-broken (score DESC, id ASC). */
  private def ref(nQ: Int, chanK: Int, k: Int,
      kRrf: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = texts.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    val emb = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    (0L until nQ.toLong).flatMap { q =>
      def ranks[S](scored: Seq[(Long, S)])(implicit ord: Ordering[S]) =
        scored.sortBy { case (id, s) => (s, id) }(
            Ordering.Tuple2(ord.reverse, Ordering.Long))
          .take(chanK).zipWithIndex
          .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val lex = ranks(texts.collect { case (id, _) if id != q =>
        val (i, u) = ((toks(q) & toks(id)).size.toLong,
          (toks(q) | toks(id)).size.toLong)
        id -> (if (u > 0) i * 1000000L / u else -1L)
      }.filter(_._2 >= 0))
      val den = ranks(vecs.collect { case (id, _) if id != q =>
        id -> cos(emb(q), emb(id)) })
      (lex.keySet ++ den.keySet).toSeq.map { id =>
        val units = lex.get(id).map(r => 1000000000L / (kRrf + r)).getOrElse(0L) +
          den.get(id).map(r => 1000000000L / (kRrf + r)).getOrElse(0L)
        (id, units)
      }.sortBy { case (id, u) => (-u, id) }.take(k).zipWithIndex
        .map { case ((id, u), i) => (q, id, u, i + 1L) }
    }
  }

  private def run(nQ: Int, chanK: Int, k: Int, kRrf: Int = 60) = {
    val docs = texts.toDF("doc_id", "text")
    val emb = vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    Retrieval.hybridRrfTopK(docs, emb, "doc_id", "text", nQ, chanK, k, kRrf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4)).toSeq
  }

  test("hybridRrfTopK ≡ independent reference (both-channel, single-channel, ties)") {
    val got = run(1, 2, 4)
    val want = ref(1, 2, 4, 60)
    assert(got === want)
    // the fixture genuinely exercises the paths: doc 3 rides BOTH
    // channel lists, docs 1 (lex-only) and 2 (dense-only) tie on one
    // channel's rank-1 units and break by id
    val byId = got.map(r => r._2 -> (r._3, r._4)).toMap
    assert(byId(3L)._2 === 1L, s"both-channel doc must fuse on top: $got")
    assert(byId(1L)._1 === byId(2L)._1, "single-channel rank-1 units equal")
    assert(byId(1L)._2 + 1 === byId(2L)._2, "equal units break by n_id")
  }

  test("hybridRrfTopK: multi-query, deeper lists still match the reference") {
    assert(run(3, 4, 6) === ref(3, 4, 6, 60))
    assert(run(2, 3, 2, kRrf = 10) === ref(2, 3, 2, 10))
  }

  // -------------------- postings lexical channel (X138, round-13)

  /** The postings-channel reference: identical to [[ref]] except the
   *  lexical arm ranks ONLY docs sharing ≥ 1 token with the query —
   *  the postings-index contract (an unmatched doc never appears in
   *  any posting list, so it cannot rank). */
  private def refPostings(nQ: Int, chanK: Int, k: Int,
      kRrf: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = texts.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    val emb = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    (0L until nQ.toLong).flatMap { q =>
      def ranks[S](scored: Seq[(Long, S)])(implicit ord: Ordering[S]) =
        scored.sortBy { case (id, s) => (s, id) }(
            Ordering.Tuple2(ord.reverse, Ordering.Long))
          .take(chanK).zipWithIndex
          .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val lex = ranks(texts.collect { case (id, _)
          if id != q && (toks(q) & toks(id)).nonEmpty =>
        val i = (toks(q) & toks(id)).size.toLong
        val s = toks(q).size.toLong + toks(id).size.toLong
        id -> (i * 1000000L / (s - i))
      })
      val den = ranks(vecs.collect { case (id, _) if id != q =>
        id -> cos(emb(q), emb(id)) })
      (lex.keySet ++ den.keySet).toSeq.map { id =>
        val units = lex.get(id).map(r => 1000000000L / (kRrf + r)).getOrElse(0L) +
          den.get(id).map(r => 1000000000L / (kRrf + r)).getOrElse(0L)
        (id, units)
      }.sortBy { case (id, u) => (-u, id) }.take(k).zipWithIndex
        .map { case ((id, u), i) => (q, id, u, i + 1L) }
    }
  }

  private def frames = {
    val docs = texts.toDF("doc_id", "text")
    val emb = vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    (docs, emb)
  }

  private def runPostings(nQ: Int, chanK: Int, k: Int, kRrf: Int = 60) = {
    val (docs, emb) = frames
    Retrieval.hybridRrfPostingsTopK(docs, emb, "doc_id", "text",
        nQ, chanK, k, kRrf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4)).toSeq
  }

  test("hybridRrfPostingsTopK ≡ independent reference; only token-sharing docs rank lexically") {
    // doc 5 ("p q r s") shares no token with query 0 ("a b c d"): in
    // the crossJoin form it ranks at jm=0 when chanK covers the
    // corpus; in the postings form it must be lexically ABSENT — the
    // two contracts genuinely diverge on this fixture at chanK=5
    assert(runPostings(1, 5, 6) === refPostings(1, 5, 6, 60))
    assert(runPostings(3, 4, 6) === refPostings(3, 4, 6, 60))
    assert(runPostings(2, 3, 2, kRrf = 10) === refPostings(2, 3, 2, 10))
    assert(runPostings(1, 5, 6) !== run(1, 5, 6),
      "fixture must exercise the zero-overlap divergence")
  }

  test("postings form: both channels agree with the crossJoin form when channel lists stop before zero-overlap docs") {
    // at chanK=2 every channel list ends before any zero-overlap doc
    // would rank, so the two operators must coincide exactly
    assert(runPostings(2, 2, 4) === run(2, 2, 4))
  }

  test("postings lexical arm is a hash join on the token key — the corpus×queries broadcast-NL pass is gone") {
    val (docs, emb) = frames
    def bnlCount(plan: String): Int =
      "BroadcastNestedLoop".r.findAllMatchIn(plan).size
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // settle AQE
      df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
    }
    val cross = planOf(Retrieval.hybridRrfTopK(docs, emb,
      "doc_id", "text", 2, 3, 3))
    val posts = planOf(Retrieval.hybridRrfPostingsTopK(docs, emb,
      "doc_id", "text", 2, 3, 3))
    val dense = planOf(graft.operators.Similarity.knnBrute(emb, 2, 3))
    // the crossJoin form fans the corpus across queries in BOTH arms;
    // the postings form's only BNL is the dense channel's bounded
    // query fan (the judged q19 shape)
    assert(bnlCount(posts) === bnlCount(dense),
      s"postings form must carry only the dense arm's broadcast fan:\n$posts")
    assert(bnlCount(cross) > bnlCount(posts),
      "fixture must show the removed lexical-arm pass")
    assert(posts.contains("BroadcastHashJoin"),
      s"lexical arm must join posting keys via hash join:\n$posts")
  }
}
