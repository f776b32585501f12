package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-7 ANN routing + exact-pair contracts:
 *   - the shape router picks sign-LSH on near-uniform corpora and the
 *     grid on clustered ones, from MEASURED bucket skew;
 *   - the blocked exact nearest pair is row-for-row identical
 *     (including float sims) to the join formulation;
 *   - the pruned exact path's certificate resolves dup-bearing labels
 *     without the fallback, falls back on loose labels, and both
 *     routes agree with the exact answer. */
class SimilarityRoutingSpec extends SparkTestBase {

  private val dim = 16

  /** Deterministic pseudo-random vector from (id, salt) — a real hash
   *  per coordinate (a linear-congruential formula here once produced
   *  accidental near-parallel pairs: id deltas that shift every
   *  coordinate by the same amount). */
  private def vec(id: Long, salt: Int): Seq[Float] =
    (0 until dim).map { d =>
      val h = scala.util.hashing.MurmurHash3
        .productHash((id, d, salt)) & 0xffff
      (h.toFloat / 65536.0f) * 2.0f - 1.0f
    }

  private def embDF(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("router: uniform corpus measures low skew and takes the sign-LSH branch") {
    val uniform = embDF((0L until 400L).map(i => (i, vec(i, 1), (i % 4).toInt)))
    val (n, s2) = Similarity.signBucketSkew(uniform, dim)
    assert(s2 <= n * 256, s"uniform corpus measured skew $s2 for n=$n")
    val routed = Similarity.annRouted(uniform, dim).collect().toSet
    val sign = Similarity.annLsh(uniform,
      Similarity.adaptivePlanes(n), dim).collect().toSet
    assert(routed === sign, "low-skew corpus must take the sign-LSH branch")
  }

  test("router: clustered corpus measures high skew and takes the grid branch") {
    // 4 tight angular clusters: all vectors of a cluster share sign
    // buckets by construction, so Σbucket² ~ n²/4 >> n·256
    val base = (0 until 4).map(c => vec(c * 1000L + 7L, 2))
    val clustered = embDF((0L until 1200L).map { i =>
      val c = (i % 4).toInt
      val b = base(c)
      (i, b.zipWithIndex.map { case (x, d) =>
        x + 0.001f * (((i * 31 + d) % 7) - 3) }, c)
    })
    val (n, s2) = Similarity.signBucketSkew(clustered, dim)
    assert(s2 > n * 256, s"clustered corpus measured skew only $s2 for n=$n")
    val routed = Similarity.annRouted(clustered, dim).collect().toSet
    val grid = Similarity.annGrid(clustered, dim).collect().toSet
    assert(routed === grid, "high-skew corpus must take the grid branch")
  }

  test("blocked exact nearest pair == join formulation, sims bit-identical") {
    val e = embDF((0L until 300L).map(i => (i, vec(i, 3), (i % 5).toInt)))
    val joinForm = Similarity.labelNearestPair(e).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val blocked = Similarity.labelNearestPairExact(e).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(blocked === joinForm)
  }

  test("blocked exact pair: triangle covers every pair once at several block counts") {
    val e = embDF((0L until 120L).map(i => (i, vec(i, 9), (i % 3).toInt)))
    val ref = Similarity.labelNearestPair(e).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    for (b <- Seq(1, 2, 5, 16)) {
      val got = Similarity.labelNearestPairExact(e, blocks = b).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      assert(got === ref, s"blocks=$b")
    }
  }

  test("blocked exact pair: building the plan launches ZERO jobs (no driver collect)") {
    // the round-8 formulation collect()ed the whole corpus to the
    // driver while BUILDING the frame — eager jobs at call time. The
    // triangle form is fully lazy: corpus bytes live only on executors.
    val e = embDF((0L until 200L).map(i => (i, vec(i, 11), (i % 4).toInt)))
    e.count() // materialize the input's own lazy bits first
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Similarity.labelNearestPairExact(e)
      Thread.sleep(500) // listener delivery is async
      assert(jobs.get() == 0,
        s"constructing the exact-pair frame ran ${jobs.get()} jobs — " +
          "a driver-side materialization is hiding in the builder")
      assert(df.columns.toSeq === Seq("label", "id_a", "id_b", "sim"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("semantic candidate mass equals the exact rule's materialized candidate count") {
    val e = embDF((0L until 250L).map(i => (i, vec(i, 5), (i % 3).toInt)))
    val (n, mass) = Similarity.semanticCandidateMass(e, dim, 0.999, 3)
    assert(n == 250L)
    val (_, a, b) = Similarity.pairProbeFrames(e, dim, 0.999, 3)
    assert(mass == a.join(b, Seq("ck")).count(),
      "the occupancy arithmetic must equal the join it predicts")
  }

  test("semantic router: sub-budget mass takes the exact rule") {
    val loose = embDF((0L until 300L).map(i => (i, vec(i, 6), (i % 3).toInt)))
    val (n, mass) = Similarity.semanticCandidateMass(loose, dim, 0.999, 5)
    assert(mass <= n * 256, s"loose corpus measured mass $mass for n=$n")
    val routed = Similarity.semanticDedupRouted(loose, dim, 0.999, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = Similarity.semanticDedupSurvivors(loose, dim, 0.999, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(routed === exact, "sub-budget mass must take the exact branch")
  }

  test("semantic router: over-budget mass takes the blocked form") {
    // 4 tight angular clusters of 400: cluster members share grid
    // cells, so the candidate mass is ~4·400² ≫ n·256
    val base = (0 until 4).map(c => vec(c * 1000L + 9L, 7))
    val clustered = embDF((0L until 1600L).map { i =>
      val c = (i % 4).toInt
      (i, base(c).zipWithIndex.map { case (x, d) =>
        x + 0.0001f * (((i * 31 + d) % 7) - 3) }, c)
    })
    val (n, mass) = Similarity.semanticCandidateMass(clustered, dim, 0.999, 5)
    assert(mass > n * 256, s"clustered corpus measured mass only $mass for n=$n")
    val routed = Similarity.semanticDedupRouted(clustered, dim, 0.999, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val blocked = Similarity.semanticDedupBlocked(clustered, 0.999, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(routed === blocked, "over-budget mass must take the blocked branch")
  }

  test("pruned exact: certificate resolves dup-bearing labels, falls back on loose ones") {
    // loose corpus: no tight pairs -> certificate resolves nothing
    val loose = embDF((0L until 200L).map(i => (i, vec(i, 4), (i % 3).toInt)))
    val (resolvedL, unresolvedL) =
      Similarity.prunedPairPhase(loose, dim, nproj = 3, level = 3, margin = 0.98)
    assert(resolvedL.count() == 0 && unresolvedL.nonEmpty,
      "loose labels must fail the certificate and fall back")
    // twin corpus: every vector has a near-parallel twin -> every
    // label's best pair passes the certificate, no fallback needed
    val twins = embDF((0L until 200L).flatMap { i =>
      val v = vec(i, 4)
      Seq((i, v, (i % 3).toInt),
        (i + 100000L, v.map(x => x * 1.0009765625f), (i % 3).toInt))
    })
    val (resolvedT, unresolvedT) =
      Similarity.prunedPairPhase(twins, dim, nproj = 3, level = 3, margin = 0.98)
    assert(unresolvedT.isEmpty,
      s"twin corpus labels must ALL resolve via certificate, got fallback $unresolvedT")
    assert(resolvedT.count() == 3)
    // and on BOTH corpora the pruned op equals the exact join answer
    for (e <- Seq(loose, twins)) {
      val exact = Similarity.labelNearestPair(e).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      val pruned = Similarity.labelNearestPairPruned(e, dim).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      assert(pruned === exact)
    }
  }

  // --------------------------------------------- ANN recall@k (X119)

  /** Independent recall reference: same plane constants
   *  ([[Similarity.planeWeight]]), same ascending-index cosine, same
   *  (sim DESC, id ASC) ranks, integer recall. */
  private def recallRef(rows: Seq[(Long, Seq[Float], Int)], nQ: Int,
      k: Int, nPlanes: Int): Seq[(Long, Long, Long, Long)] = {
    val v = rows.map { case (id, e, _) => id -> e.map(_.toDouble) }.toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val planes = Similarity.planes(nPlanes, dim)
    def bucket(e: Seq[Double]): Long =
      planes.zipWithIndex.map { case (w, p) =>
        if (dot(e, w) > 0) 1L << p else 0L }.sum
    def topK(q: Long, pool: Seq[Long]): Seq[Long] =
      pool.filter(_ != q).map(id => id -> cos(v(q), v(id)))
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    (0L until nQ.toLong).map { q =>
      val exact = topK(q, v.keys.toSeq)
      val ann = topK(q,
        v.keys.filter(id => bucket(v(id)) == bucket(v(q))).toSeq).toSet
      val hits = exact.count(ann)
      (q, exact.size.toLong, hits.toLong,
        hits.toLong * 1000000L / exact.size)
    }
  }

  test("annRecallAtK ≡ independent reference; exhaustive bucketing gives perfect recall") {
    val rows = (0L until 120L).map(i => (i, vec(i, 9), (i % 3).toInt))
    val got = Similarity.annRecallAtK(embDF(rows), 4, 5, 5, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got === recallRef(rows, 4, 5, 5))
    // recall is a real measurement on this corpus: bounded, nonzero
    // somewhere, imperfect somewhere (5 planes split 120 vectors)
    assert(got.forall(r => r._4 >= 0L && r._4 <= 1000000L))
    // positive scalings of ONE vector land on the same side of every
    // plane = one bucket = the exact search itself: recall 10^6
    val u = vec(0L, 5)
    val oneSided = (0L until 40L).map(i =>
      (i, u.map(x => x * (i + 1) / 40.0f), 0))
    val perfect = Similarity.annRecallAtK(embDF(oneSided), 3, 4, 1, dim)
      .collect().map(_.getLong(3))
    assert(perfect.length === 3 && perfect.forall(_ === 1000000L))
  }

  // ------------------------- JL random-projection prefilter (X132)

  /** Independent replay of project→shortlist→re-rank→recall from the
   *  documented contract: the same md5 ±1 planes, projected cosine
   *  shortlist with (−sim, id) order, exact-cosine re-rank. */
  private def rpRef(rows: Seq[(Long, Seq[Float], Int)], nQ: Int,
      k: Int, r: Int, shortlist: Int): Seq[(Long, Long, Long, Long)] = {
    val v = rows.map { case (id, e, _) => id -> e.map(_.toDouble) }.toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val pl = Similarity.planes(r, dim)
    val pv = v.map { case (id, e) => id -> pl.map(w => dot(e, w)) }
    (0L until nQ.toLong).map { q =>
      val exact = v.keys.filter(_ != q).toSeq
        .map(id => id -> cos(v(q), v(id)))
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      val cand = v.keys.filter(_ != q).toSeq
        .map(id => id -> cos(pv(q), pv(id)))
        .sortBy { case (id, s) => (-s, id) }.take(shortlist).map(_._1)
      val ann = cand.map(id => id -> cos(v(q), v(id)))
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val hits = exact.count(ann)
      (q, exact.size.toLong, hits.toLong,
        hits.toLong * 1000000L / exact.size)
    }
  }

  test("rpRecallAtK ≡ independent reference; exhaustive shortlist recovers brute exactly") {
    val rows = (0L until 120L).map(i => (i, vec(i, 11), (i % 3).toInt))
    val got = Similarity.rpRecallAtK(embDF(rows), 4, 5, 4, dim, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got === rpRef(rows, 4, 5, 4, 12))
    assert(got.forall(r => r._4 >= 0L && r._4 <= 1000000L))
    // a corpus-sized shortlist makes the re-rank THE brute search:
    // the approximation error provably vanishes as the knob opens
    val full = Similarity.rpRecallAtK(embDF(rows), 3, 5, 4, dim, 200)
      .collect().map(_.getLong(3))
    assert(full.length === 3 && full.forall(_ === 1000000L))
  }

  // -------------------------------- per-vector k-means assignment (X122)

  test("kmeansAssign: cell sizes ≡ q43's summary, separable blobs recover their classes") {
    // three well-separated blobs with deterministic jitter; init ids
    // 0/1/2 are one seed per class
    val rows = (0 until 90).map { i =>
      val center = i % 3
      val v = (0 until dim).map { d =>
        val base = if (d % 3 == center) 0.8f else -0.2f
        base + ((i * 31 + d * 7) % 11) * 0.01f
      }
      (i.toLong, v, center)
    }
    val e = embDF(rows.map { case (id, v, _) => (id, v, 0) })
    val asg = Similarity.kmeansAssign(e, 3, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg.size === 90)
    // every vector of one generator class lands in one cell
    val byClass = rows.groupBy(_._3).values
    assert(byClass.forall(g => g.map(x => asg(x._1)).distinct.size == 1))
    // the assignment is the SAME codebook q43 summarizes: per-cell
    // counts must match n_members exactly
    val sizes = asg.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val summary = Similarity.kmeansSummary(e, 3, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(summary.filter(_._2 > 0L) === sizes)
  }
}
