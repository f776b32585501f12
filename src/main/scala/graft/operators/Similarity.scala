package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`), for the
 * LLM-data-pipeline surface: brute-force cosine top-k as the exact
 * baseline, random-hyperplane LSH bucketing as the scale path, and a
 * per-label nearest-pair dedup view.
 *
 * Implementation: the custom codegen'd `DotProduct` expression inside
 * narrow projections — no UDFs, no interpreted HOFs in the scoring
 * loop. Floats are cast to double BEFORE any arithmetic, and every
 * fold/product/division associates identically in the DuckDB `*Sql`
 * mirrors, so scores are bit-identical across engines.
 *
 * Scale posture (100 TB):
 *  - `knnBrute` broadcasts the QUERY side (small by construction) and
 *    streams the corpus — one narrow pass, no corpus shuffle; ranking
 *    is the bounded `SimTopK` aggregation (map-side k-heaps), so the
 *    only exchange carries k×maps×queries heap entries, never the
 *    |corpus|×|queries| scored rows. For large query sets, switch to
 *    the LSH path.
 *  - `annLsh` reduces each vector to an integer bucket (narrow), then
 *    joins within buckets only; plane count tunes the bucket
 *    occupancy/recall trade-off. Planes are md5-derived constants —
 *    identical on every executor, no RNG, no driver state.
 */
object Similarity extends SimilarityPq {

  /** Deterministic ±1 hyperplane weight for (plane p, dim d):
   *  the low bit of md5("pl<p>:<d>") — reproducible in any engine. */
  def planeWeight(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pl$p:$d".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.take(15), 16)
    if ((h & 1L) == 1L) 1.0 else -1.0
  }

  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(d => planeWeight(p, d)))

  // --------------------------------------------------------- primitives

  // -------------------------------------------------------- brute top-k

  /** Exact cosine top-k: for each query vector (`vec_id < nQueries`),
   *  the k nearest corpus vectors. Queries are BROADCAST — the corpus
   *  is read once with no shuffle — and the per-query top-k is a
   *  BOUNDED aggregation ([[graft.functions.TopKAggregate]]): each map
   *  task reduces its corpus slice to ≤ k candidates per query before
   *  the exchange, so the shuffle carries k×maps×queries heap entries
   *  instead of the |corpus|×|queries| scored rows the window
   *  formulation sorted. */
  def knnBrute(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = prepared(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dotExpr("qv", "v") / (col("qn") * col("nrm"))).as("sim"))
    topKPerQuery(scored, k)
  }

  def knnBruteSql(table: String, nQueries: Int, k: Int): String =
    s"""WITH e AS (${preparedSql(table)}),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < $nQueries),
       |scored AS (SELECT q_id, e.vec_id AS n_id,
       |                  ${dotSql("qv", "v")} / (qn * nrm) AS sim
       |           FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id)
       |SELECT * FROM (
       |  SELECT q_id, n_id, sim, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  // ----------------------------------------------------------- ANN LSH

  /** Random-hyperplane LSH bucket id: bit p set iff dot(v, plane_p)>0.
   *  A pure projection — the whole corpus bucketizes in one narrow
   *  pass. */
  def lshBucket(vName: String, nPlanes: Int, dim: Int): Column =
    planes(nPlanes, dim).zipWithIndex.map { case (w, p) =>
      val planeArr = array(w.map(x => lit(x)): _*)
      when(graft.functions.VectorExpressions.dot(col(vName), planeArr) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(vName: String, nPlanes: Int, dim: Int): String =
    planes(nPlanes, dim).zipWithIndex.map { case (w, p) =>
      val planeArr = w.mkString("[", ", ", "]")
      s"(CASE WHEN (${dotSql(vName, planeArr)}) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Top-1 exact cosine re-rank within a precomputed `bucket` column —
   *  the shared tail of every ANN bucketing variant (sign-LSH,
   *  adaptive sign-LSH, grid). Rank-1 rides the bounded top-k
   *  aggregate: the exchange carries one (sim, n_id) per (vec_id, map
   *  task), not every scored bucket pair. Singleton buckets produce
   *  no row. Tie-break: (sim DESC, n_id ASC) — any change here MUST
   *  land in [[top1InBucketSql]] too. */
  private def top1InBucket(e: DataFrame): DataFrame = {
    val a = e.select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
    val b = e.select(col("bucket"), col("vec_id").as("n_id"),
      col("v").as("nv"), col("nrm").as("nn"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("n_id"))
      .select(col("vec_id"), col("n_id"),
        (dotExpr("v", "nv") / (col("nrm") * col("nn"))).as("sim"))
      .groupBy(col("vec_id"))
      .agg(graft.functions.TopKAggregate.simTopK(col("sim"), col("n_id"), 1).as("tk"))
      .select(col("vec_id"), explode(col("tk")).as("e"))
      .select(col("vec_id"), col("e.n_id").as("n_id"), col("e.sim").as("sim"))
  }

  /** SQL twin of [[top1InBucket]], parameterized on the bucket
   *  expression text. */
  private def top1InBucketSql(table: String, bucketExpr: String): String =
    s"""WITH e AS (SELECT *, $bucketExpr AS bucket
       |           FROM (${preparedSql(table)})),
       |scored AS (SELECT a.vec_id, b.vec_id AS n_id,
       |                  ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
       |           FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       |SELECT vec_id, n_id, sim FROM (
       |  SELECT vec_id, n_id, sim, row_number() OVER
       |    (PARTITION BY vec_id ORDER BY sim DESC, n_id) AS rank
       |  FROM scored
       |) WHERE rank = 1""".stripMargin

  /** ANN: top-1 neighbor within the query's LSH bucket (exact cosine
   *  re-rank inside the bucket). Vectors in singleton buckets produce
   *  no row — the recall/occupancy knob is `nPlanes`.
   *
   *  OPERATING RANGE — near-UNIFORM angular distributions only. A sign
   *  bucket can never be smaller than the angular cluster it contains,
   *  so on clustered corpora in-bucket re-rank grows with
   *  cluster-mass² at ANY plane count (measured on the 100x sweep:
   *  Σbucket² 1.4-4.1 G pairs, 6-16 planes). The DEFAULT entry point
   *  is [[annRouted]], which measures the bucket skew and only takes
   *  this path when the measurement says the corpus is uniform enough
   *  to keep it linear; [[annGrid]]/[[ivfTopK]] are the clustered
   *  paths. */
  def annLsh(emb: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    top1InBucket(prepared(emb)
      .withColumn("bucket", lshBucket("v", nPlanes, dim)))

  def annLshSql(table: String, nPlanes: Int, dim: Int): String =
    top1InBucketSql(table, lshBucketSql("v", nPlanes, dim))

  // ------------------------------------------- ANN LSH, corpus-adaptive

  /** Plane count for a target mean bucket occupancy: minPlanes plus
   *  one for every doubling of `n` beyond targetBucket·2^minPlanes,
   *  capped at maxPlanes. A FIXED plane count makes in-bucket re-rank
   *  work quadratic as the corpus grows (occupancy n/2^planes, pairs
   *  n²/2^planes — the 100x scale sweep measured q20 at 622 s on 500 k
   *  vectors with 6 planes); tracking log₂(n) keeps occupancy — and so
   *  per-vector candidate work — constant. Integer threshold
   *  comparisons ONLY: a float log2 could disagree with the SQL
   *  oracle's by one ulp at power-of-two corpus sizes and silently
   *  shift every bucket id. */
  def adaptivePlanes(n: Long, targetBucket: Int = 64,
      minPlanes: Int = 6, maxPlanes: Int = 16): Int =
    minPlanes + (minPlanes until maxPlanes)
      .count(b => n > (targetBucket.toLong << b))

  /** Scalar-subquery twin of [[adaptivePlanes]] — same integer
   *  thresholds over `count(*)`, so both engines derive the identical
   *  plane count from the data itself at ANY scale factor. */
  def adaptivePlanesSql(table: String, targetBucket: Int = 64,
      minPlanes: Int = 6, maxPlanes: Int = 16): String =
    s"(SELECT $minPlanes + " + (minPlanes until maxPlanes)
      .map(b => s"(CASE WHEN count(*) > ${targetBucket.toLong << b} THEN 1 ELSE 0 END)")
      .mkString(" + ") + s" FROM $table)"

  /** [[annLsh]] with the plane count derived from the corpus size.
   *  `planeWeight` depends only on (plane, dim), so plane lists are
   *  prefix-stable: using the first `adaptivePlanes(n)` planes equals
   *  masking the low bits of the full maxPlanes-bit bucket — which is
   *  exactly how the SQL twin stays static text (it unrolls all
   *  maxPlanes planes and masks with `% (1 << nbits)`, nbits a scalar
   *  subquery). The one extra action is a parquet metadata count. */
  def annLshAdaptive(emb: DataFrame, dim: Int, targetBucket: Int = 64,
      minPlanes: Int = 6, maxPlanes: Int = 16): DataFrame =
    annLsh(emb,
      adaptivePlanes(emb.count(), targetBucket, minPlanes, maxPlanes), dim)

  def annLshAdaptiveSql(table: String, dim: Int, targetBucket: Int = 64,
      minPlanes: Int = 6, maxPlanes: Int = 16): String = {
    val nbits = adaptivePlanesSql(table, targetBucket, minPlanes, maxPlanes)
    top1InBucketSql(table, s"((${lshBucketSql("v", maxPlanes, dim)}) " +
      s"% (CAST(1 AS BIGINT) << $nbits))")
  }

  // ------------------------------------------------- shape-routed ANN

  /** Measured candidate mass of the adaptive sign-LSH bucketing:
   *  Σ bucket² over the corpus bucket histogram — EXACTLY the number
   *  of scored rows the in-bucket re-rank would produce (within a
   *  factor for self-pairs). One narrow pass + one tiny aggregation;
   *  all integers, so the SQL twin computes the identical value. */
  def signBucketSkew(emb: DataFrame, dim: Int, targetBucket: Int = 64,
      minPlanes: Int = 6, maxPlanes: Int = 16): (Long, Long) = {
    val n = emb.count()
    val nPlanes = adaptivePlanes(n, targetBucket, minPlanes, maxPlanes)
    val s2 = prepared(emb)
      .select(lshBucket("v", nPlanes, dim).as("bucket"))
      .groupBy(col("bucket")).count()
      .agg(sum(col("count") * col("count"))).head.getLong(0)
    (n, s2)
  }

  /** Shape-ROUTED ANN top-1 — the default entry point. Sign-LSH is
   *  linear only while its buckets stay near target occupancy; on
   *  clustered corpora a bucket holds its whole angular cluster and
   *  the re-rank goes quadratic (measured: q20's exp2 2.33 on the
   *  100x sweep). Rather than guess the corpus shape, MEASURE it:
   *  Σbucket² ≤ n·skewFactor (a per-vector candidate budget; uniform
   *  corpora at target occupancy 64 measure ~n·64, the sweep's
   *  clustered corpora measure n·2800+) routes to sign-LSH, anything
   *  above routes to the distance-quantized grid ([[annGrid]]), which
   *  subdivides the clusters sign bits cannot (Σcell² 37 M vs 1.4 G
   *  on the same 500 k-vector corpus). The decision is an INTEGER
   *  comparison on exact counts, so the SQL oracle re-derives the
   *  identical route from the data itself at any scale factor. */
  def annRouted(emb: DataFrame, dim: Int, skewFactor: Long = 256): DataFrame = {
    val (n, s2) = signBucketSkew(emb, dim)
    if (s2 > n * skewFactor) annGrid(emb, dim)
    else annLsh(emb, adaptivePlanes(n), dim)
  }

  /** ANN quality measurement — recall@k of the sign-LSH bucketed
   *  search against the exact [[knnBrute]] ground truth, per query:
   *  the metric an ANN deployment actually monitors when tuning
   *  plane count against the recall/cost trade. Both arms are this
   *  module's own judged kernels (q19's brute scorer, q20's family
   *  bucketing); the comparison is pure id-set intersection —
   *  recall_micro = ⌊10⁶·|ann∩exact| / |exact|⌋, exact integers, no
   *  float hazard beyond the already-pinned per-channel rankings.
   *
   *  Shape at 100 TB: the exact arm broadcasts the nQueries query
   *  vectors over one corpus scan (bounded simTopK heaps); the ANN
   *  arm joins the corpus to the BROADCAST bucketed queries on the
   *  bucket key, so it scores only same-bucket rows (~n/2^planes per
   *  query). The recall join touches nQueries×k rows. A query whose
   *  bucket holds < k neighbors simply scores what exists — recall
   *  reports the truth, it does not pad. */
  def annRecallAtK(emb: DataFrame, nQueries: Int, k: Int, nPlanes: Int,
      dim: Int): DataFrame = {
    require(nQueries >= 1 && k >= 1 && nPlanes >= 1,
      s"nQueries/k/nPlanes must be >= 1, got $nQueries/$k/$nPlanes")
    val exact = knnBrute(emb, nQueries, k).select(col("q_id"), col("n_id"))
    val e = prepared(emb).withColumn("bucket", lshBucket("v", nPlanes, dim))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dotExpr("qv", "v") / (col("qn") * col("nrm"))).as("sim"))
    val ann = topKPerQuery(scored, k)
      .select(col("q_id"), col("n_id"), lit(1L).as("__hit"))
    exact.join(ann, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("k_exact"), col("n_hits"),
        expr("n_hits * 1000000 div k_exact").as("recall_micro"))
  }

  /** DuckDB oracle twin of [[annRecallAtK]] — both arms replayed
   *  ([[knnBruteSql]] verbatim, the same plane constants via
   *  [[lshBucketSql]]), row_number rank twins, integer recall. */
  def annRecallAtKSql(table: String, nQueries: Int, k: Int, nPlanes: Int,
      dim: Int): String =
    s"""WITH e AS (SELECT *, ${lshBucketSql("v", nPlanes, dim)} AS bucket
       |           FROM (${preparedSql(table)})),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket
       |      FROM e WHERE vec_id < $nQueries),
       |scored AS (SELECT q_id, e.vec_id AS n_id,
       |                  ${dotSql("qv", "v")} / (qn * nrm) AS sim
       |           FROM e JOIN q USING (bucket) WHERE e.vec_id <> q.q_id),
       |ann AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, n_id, row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
       |  FROM scored) WHERE rk <= $k),
       |exact AS (SELECT q_id, n_id FROM (
       |  ${knnBruteSql(table, nQueries, k)}))
       |SELECT x.q_id, CAST(count(*) AS BIGINT) AS k_exact,
       |  CAST(sum(CASE WHEN a.q_id IS NULL THEN 0 ELSE 1 END)
       |    AS BIGINT) AS n_hits,
       |  CAST(sum(CASE WHEN a.q_id IS NULL THEN 0 ELSE 1 END) * 1000000
       |    // count(*) AS BIGINT) AS recall_micro
       |FROM exact x LEFT JOIN ann a
       |  ON x.q_id = a.q_id AND x.n_id = a.n_id
       |GROUP BY x.q_id""".stripMargin

  /** Johnson–Lindenstrauss random-projection prefilter, measured by
   *  recall@k (X132) — the OTHER classic compression lever next to
   *  PQ (X124): project every vector onto `r` deterministic ±1
   *  hyperplanes (the Achlioptas 2003 Rademacher construction — the
   *  SAME md5-derived [[planes]] the sign-LSH family uses, so one
   *  plane table serves both ops), shortlist per query in the r-dim
   *  space, exact-cosine re-rank ONLY the shortlist, and report
   *  recall against the [[knnBrute]] ground truth per query.
   *
   *  Shape at 100 TB: the projection is a zero-shuffle narrow map
   *  (r dots per row, computed once); the shortlist pass scans the
   *  r-dim table against broadcast queries — the same join shape as
   *  the brute arm but at r/dim the arithmetic and r/dim the bytes
   *  when the projected table is materialized (r = 8 over dim = 64:
   *  8× on both axes). Exact vectors are touched for only
   *  nQueries·`shortlist` rows (a broadcast id join — a filter, no
   *  row multiplication). `r` and `shortlist` are the recall knobs;
   *  a shortlist the size of the corpus makes the approximation
   *  error vanish (spec-pinned ≡ knnBrute). Recall is pure id-set
   *  intersection in exact integers, and reports the truth — a
   *  query whose shortlist misses true neighbors scores what it
   *  got, never padded. */
  def rpRecallAtK(emb: DataFrame, nQueries: Int, k: Int, r: Int,
      dim: Int, shortlist: Int): DataFrame = {
    require(nQueries >= 1 && k >= 1 && r >= 1 && shortlist >= k,
      s"need nQueries/k/r >= 1 and shortlist >= k, " +
        s"got $nQueries/$k/$r/$shortlist")
    val exact = knnBrute(emb, nQueries, k).select(col("q_id"), col("n_id"))
    val e = prepared(emb)
    val pCols = planes(r, dim).zipWithIndex.map { case (w, i) =>
      graft.functions.VectorExpressions.dot(col("v"),
        array(w.map(lit): _*)).as(s"p$i") }
    val ep = e.select(col("vec_id") +: col("v") +: col("nrm") +: pCols: _*)
      .withColumn("pn", sqrt((0 until r)
        .map(i => col(s"p$i") * col(s"p$i")).reduce(_ + _)))
    val pq = ep.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id")
        +: (0 until r).map(i => col(s"p$i").as(s"qp$i"))
        :+ col("pn").as("qpn"): _*)
    val pscored = ep.crossJoin(broadcast(pq))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        ((0 until r).map(i => col(s"p$i") * col(s"qp$i")).reduce(_ + _)
          / (col("pn") * col("qpn"))).as("sim"))
    val cand = topKPerQuery(pscored, shortlist)
      .select(col("q_id"), col("n_id"))
    val q2 = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid2"), col("v").as("qv"),
        col("nrm").as("qn"))
    val rer = e.join(broadcast(cand), e("vec_id") === cand("n_id"))
      .join(broadcast(q2), col("q_id") === col("qid2"))
      .select(col("q_id"), col("n_id"),
        (dotExpr("qv", "v") / (col("qn") * col("nrm"))).as("sim"))
    val ann = topKPerQuery(rer, k)
      .select(col("q_id"), col("n_id"), lit(1L).as("__hit"))
    exact.join(ann, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("k_exact"), col("n_hits"),
        expr("n_hits * 1000000 div k_exact").as("recall_micro"))
  }

  /** DuckDB oracle twin of [[rpRecallAtK]] — the same md5 plane
   *  constants, projection/shortlist/re-rank/recall all replayed
   *  with identically-ordered float expression trees. */
  def rpRecallAtKSql(table: String, nQueries: Int, k: Int, r: Int,
      dim: Int, shortlist: Int): String = {
    val pl = planes(r, dim)
    val pSel = pl.zipWithIndex.map { case (w, i) =>
      s"(${dotSql("v", w.mkString("[", ", ", "]"))}) AS p$i"
    }.mkString(",\n    ")
    val pn2 = (0 until r).map(i => s"p$i * p$i").mkString(" + ")
    val qpSel = (0 until r).map(i => s"p$i AS qp$i").mkString(", ")
    val pdot = (0 until r).map(i => s"e.p$i * q.qp$i").mkString(" + ")
    s"""WITH e0 AS (${preparedSql(table)}),
       |ep0 AS (SELECT vec_id, v, nrm,
       |    $pSel
       |  FROM e0),
       |ep AS (SELECT *, sqrt($pn2) AS pn FROM ep0),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, $qpSel,
       |             pn AS qpn
       |      FROM ep WHERE vec_id < $nQueries),
       |ps AS (SELECT q.q_id, e.vec_id AS n_id,
       |              ($pdot) / (e.pn * q.qpn) AS psim
       |       FROM ep e CROSS JOIN q WHERE e.vec_id <> q.q_id),
       |cand AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, n_id, row_number() OVER
       |    (PARTITION BY q_id ORDER BY psim DESC, n_id) AS rk
       |  FROM ps) WHERE rk <= $shortlist),
       |rer AS (SELECT c.q_id, c.n_id,
       |               (${dotSql("q.qv", "e.v")}) / (q.qn * e.nrm) AS sim
       |        FROM cand c JOIN ep e ON e.vec_id = c.n_id
       |        JOIN q ON q.q_id = c.q_id),
       |ann AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, n_id, row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
       |  FROM rer) WHERE rk <= $k),
       |exact AS (SELECT q_id, n_id FROM (
       |  ${knnBruteSql(table, nQueries, k)}))
       |SELECT x.q_id, CAST(count(*) AS BIGINT) AS k_exact,
       |  CAST(sum(CASE WHEN a.q_id IS NULL THEN 0 ELSE 1 END)
       |    AS BIGINT) AS n_hits,
       |  CAST(sum(CASE WHEN a.q_id IS NULL THEN 0 ELSE 1 END) * 1000000
       |    // count(*) AS BIGINT) AS recall_micro
       |FROM exact x LEFT JOIN ann a
       |  ON x.q_id = a.q_id AND x.n_id = a.n_id
       |GROUP BY x.q_id""".stripMargin
  }

  /** SQL twin of [[annRouted]]: ONE bucketed query whose bucket
   *  expression is selected per the same integer skew flag (scalar
   *  subqueries over identical counts) — the un-taken branch's bucket
   *  arithmetic is never evaluated into a join, so the oracle does
   *  not pay the quadratic sign-bucket pair space on exactly the
   *  clustered corpora the router exists to avoid (a two-branch
   *  UNION gated by WHERE would compute both self-joins and discard
   *  one). The flag is row-independent, so every row buckets under
   *  the same scheme — the identical route the Spark side took. */
  def annRoutedSql(table: String, dim: Int, skewFactor: Long = 256): String =
    top1InBucketSql(table, routedBucketSql(table, dim, skewFactor, 4))

  /** The route-gated bucket expression both [[annRoutedSql]] and
   *  [[annTopKIndexedSql]] share — one CASE whose flag re-derives the
   *  Σbucket² measurement from exact counts, so the two oracles can
   *  never drift apart. */
  private def routedBucketSql(table: String, dim: Int, skewFactor: Long,
      nproj: Int): String = {
    val nbits = adaptivePlanesSql(table)
    val signBucket = s"((${lshBucketSql("v", 16, dim)}) " +
      s"% (CAST(1 AS BIGINT) << $nbits))"
    val skew =
      s"""(SELECT sum(c * c) FROM (
         |  SELECT $signBucket AS bucket, count(*) AS c
         |  FROM (${preparedSql(table)}) GROUP BY 1))""".stripMargin
    val budget = s"((SELECT count(*) FROM $table) * $skewFactor)"
    val gridBucket =
      gridCellSql("v", "nrm", nproj, adaptiveGridLevelSql(table), dim)
    s"(CASE WHEN ($skew) > $budget THEN ($gridBucket) ELSE ($signBucket) END)"
  }

  // ------------------------------------------------- ANN grid (E2LSH)

  /** Refinement level for [[annGrid]]: starts at 2 and steps up on
   *  integer corpus-size thresholds (calibrated by the measured cell
   *  histograms of this data family at sf0.001…sf10 — clustered
   *  embeddings split ~6-8x per level, not the uniform-volume 16x).
   *  Integer comparisons only, for the same oracle-parity reason as
   *  [[adaptivePlanes]]. */
  private val gridThresholds =
    Seq(1500L, 12000L, 50000L, 150000L, 1200000L, 10000000L)

  def adaptiveGridLevel(n: Long): Int =
    2 + gridThresholds.count(n > _)

  def adaptiveGridLevelSql(table: String): String =
    s"(SELECT 2 + " + gridThresholds
      .map(t => s"(CASE WHEN count(*) > $t THEN 1 ELSE 0 END)")
      .mkString(" + ") + s" FROM $table)"

  /** E2LSH-style grid cell id: the NORMALIZED vector is projected on
   *  `nproj` ±1 directions and each projection is quantized to cells
   *  of width 8/2^k (the scale 2^(k-3) is a power of two, so the only
   *  float arithmetic is the dot product both engines already compute
   *  bit-identically). Per-axis cell ids are packed into one BIGINT
   *  (each |proj| ≤ 8 ⇒ cell+2048 ∈ [0, 4096)).
   *
   *  WHY this exists next to [[lshBucket]] (measured, 100x sweep): a
   *  sign bucket can never be smaller than the angular cluster it
   *  contains — on clustered embeddings the top sign-buckets held the
   *  full ~19k-vector label clusters at ANY plane count (Σbucket²
   *  1.4-1.8 G pairs, q20 622 s → still 191 s after adaptive planes).
   *  Distance quantization splits dense clusters: at the same corpus,
   *  level 6 measures Σcell² = 37 M (~50x less in-cell work). */
  def gridCellExpr(vName: String, nrmName: String, nproj: Int, k: Int,
      dim: Int): Column = {
    // 12 bits per axis in one BIGINT: axis 5 already shifts by 60, so
    // nproj ≥ 6 would overflow — silently wrapping in Spark (ANSI off)
    // while DuckDB RAISES on the same arithmetic. Fail construction.
    require(nproj >= 1 && nproj <= 5,
      s"gridCellExpr packs 12 bits/axis into one long: nproj must be 1..5, got $nproj")
    val scale = java.lang.Math.scalb(1.0, k - 3) // exact 2^(k-3)
    // per-axis range check: |proj| ≤ √dim (Cauchy-Schwarz, ±1 plane of
    // norm √dim against the normalized vector), so cell+2048 ∈ [0,4096)
    // needs √dim·2^(k-3) < 2048 — STRICT: at equality a vector parallel
    // to a plane floors to cell 2048 and carries into the next axis's
    // bits (wrong buckets, no error in non-ANSI Spark). Fail
    // construction instead.
    require(math.sqrt(dim.toDouble) * scale < 2048.0,
      s"gridCellExpr 12-bit axis range: sqrt(dim)*2^(k-3) must be < 2048, " +
        s"got dim=$dim k=$k (${math.sqrt(dim.toDouble) * scale})")
    planes(nproj, dim).zipWithIndex.map { case (w, j) =>
      val wArr = array(w.map(x => lit(x)): _*)
      val cell = floor(graft.functions.VectorExpressions.dot(col(vName), wArr)
        / col(nrmName) * lit(scale)).cast("long") + lit(2048L)
      cell * lit(1L << (12 * j))
    }.reduce(_ + _)
  }

  def gridCellSql(vName: String, nrmName: String, nproj: Int,
      kSql: String, dim: Int): String =
    planes(nproj, dim).zipWithIndex.map { case (w, j) =>
      val wArr = w.mkString("[", ", ", "]")
      s"((CAST(floor(${dotSql(vName, wArr)} / $nrmName * " +
        s"(CAST(1 AS BIGINT) << $kSql) / 8.0) AS BIGINT) + 2048) " +
        s"* ${1L << (12 * j)})"
    }.mkString("(", " + ", ")")

  /** ANN top-1 within the grid cell (exact cosine re-rank inside the
   *  cell, singleton cells produce no row) — the clustered-corpus
   *  scale path of the LSH family. Refinement adapts to corpus size;
   *  the SQL twin derives the same level via scalar subquery. */
  def annGrid(emb: DataFrame, dim: Int, nproj: Int = 4): DataFrame = {
    val k = adaptiveGridLevel(emb.count())
    top1InBucket(prepared(emb)
      .withColumn("bucket", gridCellExpr("v", "nrm", nproj, k, dim)))
  }

  def annGridSql(table: String, dim: Int, nproj: Int = 4): String =
    top1InBucketSql(table,
      gridCellSql("v", "nrm", nproj, adaptiveGridLevelSql(table), dim))

  // ------------------------------------ persist-once routed ANN index

  /** Meta sidecar of a materialized ANN index: the measured route
   *  ([[annRouted]]'s Σbucket² decision, with the counts that made
   *  it), the bucketing parameters, and the corpus fingerprint — the
   *  q84 pattern for vectors: parameters travel WITH the data, and a
   *  stale or foreign index fails loudly at probe time instead of
   *  silently returning wrong neighbors. */
  final case class AnnIndexMeta(dim: Int, nproj: Int, route: String,
      bits: Int, n: Long, s2: Long, fingerprint: String, gen: Long = 0L)

  private val AnnMetaFile = "ann_index_meta.json"

  /** ATOMIC meta install (temp + rename-replace): the meta is the
   *  index's root pointer — its `gen` selects which data/counts/
   *  deleted generation directories are live, so a reader always sees
   *  a complete generation (the re-route rebuild writes the new
   *  generation fully, then swaps the meta in one rename; a crash
   *  before the swap leaves only orphan dirs). */
  def writeAnnIndexMeta(dir: String, m: AnnIndexMeta): Unit =
    graft.core.StoreFs.replaceFileAtomic(s"$dir/$AnnMetaFile",
      s"""{"dim":${m.dim},"nproj":${m.nproj},"route":"${m.route}",""" +
        s""""bits":${m.bits},"n":${m.n},"s2":${m.s2},"gen":${m.gen},""" +
        s""""fingerprint":"${m.fingerprint}"}""")

  def readAnnIndexMeta(dir: String): Option[AnnIndexMeta] =
    graft.core.StoreFs.readPointerFile(s"$dir/$AnnMetaFile").flatMap { s =>
      def num(key: String) =
        s""""$key":(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      def str(key: String) =
        s""""$key":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      for (d <- num("dim"); np <- num("nproj"); r <- str("route");
           b <- num("bits"); n <- num("n"); s2 <- num("s2");
           fp <- str("fingerprint"))
        yield AnnIndexMeta(d.toInt, np.toInt, r, b.toInt, n, s2, fp,
          num("gen").getOrElse(0L))
    }

  /** Materialize [[annRouted]]'s bucketing ONCE as a lake table: one
   *  corpus scan measures Σbucket², picks the route, computes every
   *  vector's bucket under it, and writes (bucket, vec_id, label, v,
   *  nrm) CLUSTERED by bucket (repartition + in-partition sort ⇒
   *  parquet row-group min/max on `bucket` are tight, so a probe's
   *  bucket-join scans stay narrow). Repeated query batches then
   *  probe the written table and NEVER rescan or re-project the
   *  corpus embeddings — the q83-lexicon / q84-LSH "materialize once
   *  per corpus fingerprint" pattern, closing round-7 residual 3
   *  (q81/q20 recomputed grid cells per run). */
  def materializeAnnIndex(emb: DataFrame, dim: Int, dir: String,
      fingerprint: String, skewFactor: Long = 256,
      nproj: Int = 4): AnnIndexMeta = {
    val (n, s2) = signBucketSkew(emb, dim)
    val (route, bits) =
      if (s2 > n * skewFactor) ("grid", adaptiveGridLevel(n))
      else ("sign", adaptivePlanes(n))
    val meta = AnnIndexMeta(dim, nproj, route, bits, n, s2, fingerprint)
    writeAnnSegment(emb.sparkSession,
      prepared(emb).withColumn("bucket", indexBucketExpr(meta, "v", "nrm")),
      dir, meta, "base")
    writeAnnIndexMeta(dir, meta)
    meta
  }

  // ----------------------------------- evolving ANN index lifecycle

  /** Segment subdirectories of one generation table (shared store
   *  contract — [[SegmentStore.segDirs]]). */
  private def annSegDirs(table: String): Seq[String] =
    SegmentStore.segDirs(table)

  /** Names of segments a past compaction (or generation rebuild)
   *  physically folded into a base — the `folded-*` ledger files left
   *  in the generation's data dir. An append of one of these names is
   *  an at-least-once redelivery of an already-folded batch and must
   *  no-op: its rows are inside the fold. */
  private def foldedAnnSegmentNames(dataDir: String): Set[String] =
    graft.core.StoreFs.listFileNames(dataDir)
      .filter(_.startsWith("folded-"))
      .flatMap(f => graft.core.StoreFs.readUTF8(s"$dataDir/$f")
        .split("\n").toSeq)
      .filter(_.nonEmpty).toSet

  private def annGenDir(dir: String, m: AnnIndexMeta, what: String): String =
    s"$dir/$what-g${m.gen}"

  /** Write one bucket-clustered data segment plus its counts-ledger
   *  segment (bucket → +rows). The counts ledger is how the index
   *  maintains (n, Σbucket²) INCREMENTALLY: appends add positive
   *  rows, deletes add negative rows, and [[annIndexStats]] folds the
   *  ledger in one tiny aggregation — no corpus or index rescan. */
  private def writeAnnSegment(spark: org.apache.spark.sql.SparkSession,
      bucketed: DataFrame, dir: String, m: AnnIndexMeta,
      segment: String): Unit = {
    bucketed
      .select(col("bucket"), col("vec_id"), col("label"), col("v"), col("nrm"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"))
      .write.mode("overwrite")
      .parquet(s"${annGenDir(dir, m, "data")}/$segment")
    spark.read.parquet(s"${annGenDir(dir, m, "data")}/$segment")
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite")
      .parquet(s"${annGenDir(dir, m, "counts")}/$segment")
  }

  /** Incrementally-maintained index statistics: n = Σledger, s2 =
   *  Σ(per-bucket ledger total)² — EXACTLY the live candidate mass
   *  under the index's own bucketing, the [[annRouted]] decision
   *  statistic, derived from the counts ledger alone (ledger rows ≤
   *  occupied buckets × segments — tiny). */
  def annIndexStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long) = {
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"annIndexStats: no $AnnMetaFile in $dir"))
    val segs = annSegDirs(annGenDir(dir, meta, "counts"))
    if (segs.isEmpty) (0L, 0L)
    else {
      val r = spark.read.parquet(segs: _*)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("t"))
        .agg(coalesce(sum(col("t")), lit(0L)).as("n"),
          coalesce(sum(col("t") * col("t")), lit(0L)).as("s2"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
  }

  /** Append a batch of vectors (vec_id, label, embedding) to a
   *  materialized index under segment name `segment`: the batch is
   *  bucketed with the INDEX's own meta-driven expression (build/
   *  probe/append parameter mismatch impossible), written as one
   *  bucket-clustered segment + counts-ledger rows, and visible to
   *  the next probe with ZERO corpus rescans (spec-pinned). Same
   *  idempotency contract as [[graft.operators.Dedup.appendToLshIndex]]:
   *  overwrite-per-segment ⇒ an at-least-once retry replaces its own
   *  contribution. A re-added tombstoned id REVIVES (probe-first:
   *  one unioned semi-join finds tombstone segments actually hit;
   *  the id's stale pre-delete rows purge from older data segments
   *  FIRST so probes never see deleted content, then the tombstones
   *  clear — the stale rows were already subtracted from the ledger
   *  by their delete, so no count correction is due). Appending an
   *  id that is LIVE duplicates it — ids are unique-unless-deleted
   *  by contract, as in the X56 index. */
  def appendToAnnIndex(dir: String, batch: DataFrame,
      segment: String): Unit = {
    val spark = batch.sparkSession
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"appendToAnnIndex: no $AnnMetaFile in $dir"))
    if (foldedAnnSegmentNames(annGenDir(dir, meta, "data"))
        .contains(segment)) {
      // already FOLDED into a base by a compaction that ran after the
      // original append but before the streaming checkpoint committed
      // (round-10 advice gap): re-writing the segment would duplicate
      // every vec_id in the live data (double neighbors in
      // annTopKIndexed) and double-count the counts ledger. The
      // redelivered survivors are value-identical (probes exclude
      // same-id matches), so the append is a safe no-op.
      return
    }
    writeAnnSegment(spark,
      prepared(batch).withColumn("bucket", indexBucketExpr(meta, "v", "nrm")),
      dir, meta, segment)
    val readded = spark.read
      .parquet(s"${annGenDir(dir, meta, "data")}/$segment")
      .select(col("vec_id"))
    val delSegs = annSegDirs(annGenDir(dir, meta, "deleted"))
    if (delSegs.nonEmpty) {
      // ONE multi-path relation per table with the owning segment
      // derived from input_file_name (round-10 item 6): a union of
      // per-segment reads pushed the semi-join into every branch —
      // one schema-inference job and one broadcast build PER SEGMENT.
      // This shape plans one scan, one join, one broadcast, so the
      // probe's job count is independent of how many segments exist.
      val tagged = spark.read
        .schema(spark.read.parquet(delSegs.head).schema)
        .parquet(delSegs: _*)
        .select(col("vec_id"), segNameOfFile.as("__seg"))
        .join(readded, Seq("vec_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val hitNames = tagged.select("__seg").distinct()
          .collect().map(_.getString(0)).toSet
        if (hitNames.nonEmpty) {
          val revived = tagged.select(col("vec_id")).distinct()
          val dataSegs = annSegDirs(annGenDir(dir, meta, "data"))
            .filterNot(graft.core.StoreFs.name(_) == segment)
          if (dataSegs.nonEmpty) {
            val dataHitNames = spark.read
              .schema(spark.read.parquet(dataSegs.head).schema)
              .parquet(dataSegs: _*)
              .select(col("vec_id"), segNameOfFile.as("__seg"))
              .join(revived, Seq("vec_id"), "left_semi")
              .select("__seg").distinct().collect().map(_.getString(0)).toSet
            // ONE union rewrite over every hit segment — job count is
            // independent of how many were hit
            SegmentStore.rewriteSegmentsWithout(spark,
              annGenDir(dir, meta, "data"),
              dataSegs.filter(sd =>
                dataHitNames.contains(graft.core.StoreFs.name(sd))),
              revived, "vec_id")
          }
          SegmentStore.rewriteSegmentsWithout(spark,
            annGenDir(dir, meta, "deleted"),
            delSegs.filter(sd =>
              hitNames.contains(graft.core.StoreFs.name(sd))),
            readded, "vec_id")
        }
      } finally { tagged.unpersist(); () }
    }
  }

  /** The owning SEGMENT name of a scanned parquet row — the parent
   *  directory component of `input_file_name()` (segment dirs hold
   *  their part files directly). Lets a multi-path scan carry its
   *  segment without a per-segment union. */
  private def segNameOfFile: Column =
    regexp_extract(input_file_name(), ".*/([^/]+)/[^/]+$", 1)

  /** DELETE vectors from a materialized index: an id-scoped tombstone
   *  segment ([[loadAnnIndex]] subtracts it from every probe
   *  immediately; the next [[compactAnnIndex]] drops the rows
   *  physically) plus a NEGATIVE counts-ledger segment for the
   *  tombstoned ids' live rows, so [[annIndexStats]] tracks the live
   *  occupancy without rescans. The live-row probe excludes this
   *  segment's own prior tombstones, so an at-least-once retry
   *  recomputes the identical correction (idempotent overwrite),
   *  never a double subtraction. */
  def deleteFromAnnIndex(dir: String, ids: DataFrame,
      segment: String): Unit = {
    val spark = ids.sparkSession
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"deleteFromAnnIndex: no $AnnMetaFile in $dir"))
    val del = ids.select(col("vec_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dataSegs = annSegDirs(annGenDir(dir, meta, "data"))
      val otherDel = annSegDirs(annGenDir(dir, meta, "deleted"))
        .filterNot(graft.core.StoreFs.name(_) == segment)
      if (dataSegs.nonEmpty) {
        val raw = spark.read.parquet(dataSegs: _*)
        val live =
          if (otherDel.isEmpty) raw
          else raw.join(spark.read.parquet(otherDel: _*)
            .select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
        live.join(del, Seq("vec_id"), "left_semi")
          .groupBy(col("bucket")).agg((-count(lit(1))).as("cnt"))
          .write.mode("overwrite")
          .parquet(s"${annGenDir(dir, meta, "counts")}/del-$segment")
      }
      del.write.mode("overwrite")
        .parquet(s"${annGenDir(dir, meta, "deleted")}/$segment")
    } finally { del.unpersist(); () }
  }

  /** Fold accumulated segments back into one when more than
   *  `maxSegments` piled up: live rows (minus tombstones) install as
   *  one fresh bucket-clustered segment named from the INPUT segment
   *  set (the [[graft.core.Commit.inputSetTag]] CAS — two compactions
   *  of the same input collide at the atomic rename and exactly one
   *  proceeds), the counts ledger is RECOMPUTED from the folded data
   *  (self-healing: any transient ledger drift from a crash window
   *  disappears here), old segments and tombstones drop last.
   *  Returns whether a compaction ran. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxSegments: Int = 64): Boolean = {
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"compactAnnIndex: no $AnnMetaFile in $dir"))
    val dataDir = annGenDir(dir, meta, "data")
    val countsDir = annGenDir(dir, meta, "counts")
    val delSegs = annSegDirs(annGenDir(dir, meta, "deleted"))
    val dataSegs = annSegDirs(dataDir)
    if (dataSegs.size <= maxSegments && delSegs.size <= maxSegments &&
        annSegDirs(countsDir).size <= maxSegments) false
    else {
      val tag = graft.core.Commit.inputSetTag(
        dataSegs.map(graft.core.StoreFs.name))
      val target = s"$dataDir/base-$tag"
      val scratch = s"$dataDir/.compact-${java.util.UUID.randomUUID()}"
      val raw = spark.read.parquet(dataSegs: _*)
      val folded =
        if (delSegs.isEmpty) raw
        else raw.join(spark.read.parquet(delSegs: _*)
          .select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
      folded.dropDuplicates("vec_id")
        .repartition(col("bucket")).sortWithinPartitions(col("bucket"))
        .write.mode("overwrite").parquet(scratch)
      SegmentStore.casInstallDir(scratch, target, s"compactAnnIndex($dir)")
      // fresh counts from the installed fold, then drop the history
      spark.read.parquet(target)
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$countsDir/base-$tag")
      // refresh the meta's SIGN-bucket statistics from the fold (its
      // scan is already paid): the build gate's decision statistic,
      // which [[reRouteAnnIndex]]'s grid arm needs for the grid→sign
      // REVERSION — without it a grid-routed index whose clusters
      // were later deleted keeps its stale route forever, the mirror
      // image of the stale-sign-route bug X93 exists to fix. The
      // active-route ledger cannot answer this (grid-cell mass says
      // nothing about sign-bucket mass), so reversion is measured at
      // compaction points and exact at the rebuild it triggers.
      val nL = spark.read.parquet(s"$countsDir/base-$tag")
        .agg(coalesce(sum(col("cnt")), lit(0L))).head.getLong(0)
      val s2L =
        if (nL == 0L) 0L
        else spark.read.parquet(target)
          .select(lshBucket("v", adaptivePlanes(nL), meta.dim).as("b"))
          .groupBy(col("b")).count()
          .agg(coalesce(sum(col("count") * col("count")), lit(0L)))
          .head.getLong(0)
      writeAnnIndexMeta(dir, meta.copy(n = nL, s2 = s2L))
      // record the folded segment NAMES before dropping them — a
      // redelivered append of a folded batch must detect the fold and
      // no-op instead of re-creating its segment beside it (duplicate
      // ids, double-counted ledger). Written between install and
      // delete: every physically-dropped segment is covered at every
      // crash point.
      // prior folded-* ledgers fold into this one (their segments are
      // subsumed by this fold's inputs) and are GC'd after — bounded
      // ledger count and one small-file read per append instead of
      // one per historical compaction (round-11 advice fix)
      val priorLedgers = graft.core.StoreFs.listFileNames(dataDir)
        .filter(_.startsWith("folded-"))
      graft.core.StoreFs.writeUTF8(s"$dataDir/folded-$tag",
        (foldedAnnSegmentNames(dataDir) ++
          dataSegs.map(graft.core.StoreFs.name))
          .toSeq.sorted.mkString("\n"))
      dataSegs.foreach(graft.core.StoreFs.deleteRecursive)
      annSegDirs(countsDir).filterNot(_.endsWith(s"base-$tag"))
        .foreach(graft.core.StoreFs.deleteRecursive)
      delSegs.foreach(graft.core.StoreFs.deleteRecursive)
      priorLedgers.filterNot(_ == s"folded-$tag")
        .foreach(f => graft.core.StoreFs.deleteFileIfExists(s"$dataDir/$f"))
      true
    }
  }

  /** Measured RE-ROUTE check (round-9 item 3's "a clustered-growing
   *  corpus keeps its stale sign route forever"): fold the counts
   *  ledger into (n, Σbucket²) and compare against the SAME integer
   *  budget the build used. Drift = a sign route whose live candidate
   *  mass outgrew n·skewFactor, or a bucket width (bits) the live n
   *  has outgrown in either route. On drift the index REBUILDS from
   *  its own live rows — the original corpus is never rescanned: the
   *  data segments carry (v, nrm), so the re-measure and the rewrite
   *  read the index only. The rebuild writes a complete NEW
   *  generation (data/counts dirs suffixed -g<gen+1>) and swaps the
   *  meta atomically: a reader either sees the old generation intact
   *  or the new one complete, never a mix of bucketings; a crash
   *  before the swap leaves only orphan dirs (cleaned by the next
   *  successful rebuild picking gen+2). Returns (meta, rebuilt?). */
  def reRouteAnnIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, skewFactor: Long = 256): (AnnIndexMeta, Boolean) = {
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"reRouteAnnIndex: no $AnnMetaFile in $dir"))
    val (n, s2) = annIndexStats(spark, dir)
    val drifted = meta.route match {
      case "sign" => s2 > n * skewFactor || adaptivePlanes(n) != meta.bits
      // grid arm: bits outgrown, OR the compaction-refreshed
      // sign-bucket mass (meta.n/meta.s2 — the build gate's own
      // statistic) says sign routing is viable again → re-measure
      // exactly and revert
      case _ => adaptiveGridLevel(n) != meta.bits ||
        (meta.n > 0L && meta.s2 <= meta.n * skewFactor)
    }
    if (!drifted || n == 0L) (meta, false)
    else {
      val (live, _) = loadAnnIndex(spark, dir)
      val pre = live.drop("bucket")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nLive = pre.count()
        val nPlanes = adaptivePlanes(nLive)
        val s2Live = pre
          .select(lshBucket("v", nPlanes, meta.dim).as("bucket"))
          .groupBy(col("bucket")).count()
          .agg(coalesce(sum(col("count") * col("count")), lit(0L)))
          .head.getLong(0)
        val (route, bits) =
          if (s2Live > nLive * skewFactor)
            ("grid", adaptiveGridLevel(nLive))
          else ("sign", nPlanes)
        // next generation = 1 + max existing gen dir (not meta.gen +
        // 1): a crashed rebuild's orphan generation never wedges the
        // retry — it just skips past it
        val nextGen = 1L + graft.core.StoreFs.listDirNames(dir)
          .flatMap(n => "^(?:data|counts|deleted)-g(\\d+)$".r
            .findFirstMatchIn(n).map(_.group(1).toLong))
          .foldLeft(meta.gen)(math.max)
        val newMeta = meta.copy(route = route, bits = bits, n = nLive,
          s2 = s2Live, gen = nextGen)
        writeAnnSegment(spark,
          pre.withColumn("bucket", indexBucketExpr(newMeta, "v", "nrm")),
          dir, newMeta, "base")
        // the rebuild folds EVERY old-generation segment into the new
        // base — carry the folded-name ledger forward (old names plus
        // everything already folded there), so a batch redelivered
        // across the generation swap still no-ops instead of
        // re-creating its segment in the new generation
        val oldDataDir = annGenDir(dir, meta, "data")
        val carried = foldedAnnSegmentNames(oldDataDir) ++
          annSegDirs(oldDataDir).map(graft.core.StoreFs.name)
        if (carried.nonEmpty)
          graft.core.StoreFs.writeUTF8(
            s"${annGenDir(dir, newMeta, "data")}/folded-rebuild",
            carried.toSeq.sorted.mkString("\n"))
        writeAnnIndexMeta(dir, newMeta)
        // drop EVERY other generation — the replaced live one AND any
        // orphans a crashed earlier rebuild left behind (each orphan
        // is a whole-index-sized copy; only the meta's gen is live)
        graft.core.StoreFs.listDirs(dir)
          .filter { d =>
            "^(?:data|counts|deleted)-g(\\d+)$".r
              .findFirstMatchIn(graft.core.StoreFs.name(d))
              .exists(_.group(1).toLong != nextGen)
          }
          .foreach(graft.core.StoreFs.deleteRecursive)
        (newMeta, true)
      } finally { pre.unpersist(); () }
    }
  }

  /** The routed bucket expression a meta describes — used for BOTH
   *  the corpus write and every query probe, so a build/probe
   *  parameter mismatch is impossible by construction. */
  def indexBucketExpr(m: AnnIndexMeta, vName: String, nrmName: String): Column =
    m.route match {
      case "grid" => gridCellExpr(vName, nrmName, m.nproj, m.bits, m.dim)
      case "sign" => lshBucket(vName, m.bits, m.dim)
      case other => sys.error(s"unknown ANN index route '$other'")
    }

  /** Open a materialized ANN index with a FRESH segment listing (so
   *  appends from earlier batches are visible — a parquet frame pins
   *  its file listing at read time), validating the corpus
   *  fingerprint (a stale index silently returns wrong neighbors —
   *  fail loudly instead). Delete tombstones subtract at read time
   *  until a compaction drops the rows physically. Returns the live
   *  data frame plus its meta. */
  def loadAnnIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      expectFingerprint: Option[String] = None): (DataFrame, AnnIndexMeta) = {
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"no $AnnMetaFile in $dir — not an ANN index dir (or a half-built one)"))
    expectFingerprint.foreach { fp =>
      require(meta.fingerprint == fp,
        s"ANN index at $dir was built from corpus ${meta.fingerprint}, " +
          s"expected $fp — STALE index; rebuild instead of probing it")
    }
    val segs = annSegDirs(annGenDir(dir, meta, "data"))
    require(segs.nonEmpty, s"ANN index at $dir has no data segments")
    val raw = spark.read.parquet(segs: _*)
    val delSegs = annSegDirs(annGenDir(dir, meta, "deleted"))
    val data =
      if (delSegs.isEmpty) raw
      else raw.join(spark.read.parquet(delSegs: _*)
        .select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
    (data, meta)
  }

  /** Top-k neighbors for a query batch against a MATERIALIZED index:
   *  queries (q_id, embedding) are bucketed with the index's own
   *  routed expression (meta-driven — no corpus pass, no re-measured
   *  route), BROADCAST, and joined to the index on bucket equality;
   *  exact cosine re-rank inside the bucket, bounded top-k aggregate.
   *  Per-batch cost is one index scan + |queries|·occupancy scores —
   *  the corpus embeddings are never read ([[AnnIndexSpec]] pins zero
   *  corpus rescans across repeated batches). Same recall contract as
   *  the underlying route: neighbors outside the query's bucket are
   *  not seen. */
  def annTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int,
      expectFingerprint: Option[String] = None): DataFrame = {
    val (data, meta) = loadAnnIndex(spark, dir, expectFingerprint)
    val q = queries
      .select(col("q_id"),
        expr("transform(embedding, x -> cast(x as double))").as("qv"))
      .withColumn("qn", normExpr("qv"))
      .withColumn("bucket", indexBucketExpr(meta, "qv", "qn"))
    topKPerQuery(
      data.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          (dotExpr("qv", "v") / (col("qn") * col("nrm"))).as("sim")),
      k)
  }

  /** SQL twin of one [[annTopKIndexed]] batch: the oracle re-derives
   *  the route from the same exact counts ([[annRoutedSql]]'s gating),
   *  buckets corpus and queries (`qFilter` over the corpus) with the
   *  routed expression, and re-ranks in-bucket with the identical
   *  tie-break. */
  def annTopKIndexedSql(table: String, qFilter: String, k: Int,
      dim: Int, skewFactor: Long = 256, nproj: Int = 4): String = {
    val bucket = routedBucketSql(table, dim, skewFactor, nproj)
    s"""WITH e AS (SELECT *, $bucket AS bucket
       |           FROM (${preparedSql(table)})),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket
       |      FROM e WHERE $qFilter),
       |scored AS (SELECT q_id, e.vec_id AS n_id,
       |                  ${dotSql("qv", "e.v")} / (qn * e.nrm) AS sim
       |           FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id)
       |SELECT q_id, n_id, sim, rank FROM (
       |  SELECT q_id, n_id, sim, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin
  }

  /** Semantic near-dup pairs between a NEW batch (vec_id, label,
   *  embedding) and a materialized index — the vector analog of
   *  [[graft.operators.Dedup.minhashLshPairsAgainstIndex]]: the batch
   *  buckets under the INDEX's own meta (build/probe mismatch
   *  impossible), broadcasts, and joins the clustered segments on
   *  bucket equality with exact in-bucket cosine ≥ tau. Output
   *  (new_id, corpus_id, sim); a vector present in both sides pairs
   *  at sim 1.0 — re-ingestion IS a duplicate. Candidate volume
   *  scales with |batch| × occupancy, never |corpus|²; recall is
   *  bucket-scoped, the same contract as every routed probe. The
   *  broadcast assumes a MICRO-BATCH-sized new side (the streaming
   *  trigger bounds it); a bulk-load-sized batch should append first
   *  and screen itself through [[annTopKIndexed]] probes instead of
   *  broadcasting gigabytes. */
  def cosinePairsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame, tau: Double,
      expectFingerprint: Option[String] = None): DataFrame = {
    val (data, meta) = loadAnnIndex(spark, dir, expectFingerprint)
    val b = prepared(batch)
      .withColumn("bucket", indexBucketExpr(meta, "v", "nrm"))
      .select(col("bucket"), col("vec_id").as("new_id"),
        col("v").as("bv"), col("nrm").as("bn"))
    data.join(broadcast(b), Seq("bucket"))
      .select(col("new_id"), col("vec_id").as("corpus_id"),
        (dotExpr("bv", "v") / (col("bn") * col("nrm"))).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** In-batch self near-dup pairs under an index's bucketing:
   *  (id_a < id_b, sim ≥ tau) — keep-first self-dedup drops the id_b
   *  column. Both join sides carry RENAMED columns (incl. the bucket)
   *  so the self-join can never silently resolve to one attribute. */
  def cosineSelfPairsUnderIndex(dir: String, batch: DataFrame,
      tau: Double): DataFrame = {
    val meta = readAnnIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"cosineSelfPairsUnderIndex: no $AnnMetaFile in $dir"))
    val b = prepared(batch)
      .withColumn("bucket", indexBucketExpr(meta, "v", "nrm"))
    val l = b.select(col("bucket").as("__ba"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val r = b.select(col("bucket").as("__bb"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    l.join(r, col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotExpr("va", "vb") / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** DuckDB oracle for the SEMANTIC two-batch ingest screen
   *  ([[graft.streaming.Streams.screenIngestSemantic]]): sequential
   *  semantics spelled as SQL, the vector twin of
   *  [[graft.operators.Dedup.evolvingScreenSql]]. `docsSql` must
   *  produce (vec_id, grp, embedding) with grp ∈ ('corpus','b1','b2').
   *  Route and buckets derive from the CORPUS subset's exact counts
   *  (what the materialized meta froze); a vector is DROPPED iff a
   *  same-bucket cosine ≥ tau partner exists in the index visible to
   *  its batch — corpus for b1; corpus ∪ b1-SURVIVORS for b2 — or an
   *  EARLIER (lower-id) member of its own batch. Output: (batch,
   *  vec_id) survivors. */
  def semanticScreenSql(docsSql: String, tau: Double, dim: Int,
      skewFactor: Long = 256, nproj: Int = 4): String = {
    val bucket = routedBucketSql("__annbase", dim, skewFactor, nproj)
    s"""WITH __docs AS ($docsSql),
       |__annbase AS (SELECT vec_id, embedding, '' AS label FROM __docs
       |              WHERE grp = 'corpus'),
       |e AS (SELECT vec_id, grp, v, ${normSql("v")} AS nrm FROM (
       |  SELECT vec_id, grp, $toDoubleSql AS v FROM __docs)),
       |eb AS (SELECT *, $bucket AS bucket FROM e),
       |pairs AS (SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib,
       |    b.grp AS gb
       |  FROM eb a JOIN eb b
       |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |  WHERE a.grp <> 'corpus'
       |    AND ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= $tau),
       |surv1 AS (SELECT vec_id FROM eb s WHERE grp = 'b1'
       |  AND NOT EXISTS (SELECT 1 FROM pairs p
       |                  WHERE p.ia = s.vec_id AND p.gb = 'corpus')
       |  AND NOT EXISTS (SELECT 1 FROM pairs p
       |                  WHERE p.ia = s.vec_id AND p.gb = 'b1'
       |                    AND p.ib < s.vec_id)),
       |surv2 AS (SELECT vec_id FROM eb s WHERE grp = 'b2'
       |  AND NOT EXISTS (SELECT 1 FROM pairs p
       |                  WHERE p.ia = s.vec_id AND p.gb = 'corpus')
       |  AND NOT EXISTS (SELECT 1 FROM pairs p JOIN surv1 v
       |                    ON p.ib = v.vec_id WHERE p.ia = s.vec_id)
       |  AND NOT EXISTS (SELECT 1 FROM pairs p
       |                  WHERE p.ia = s.vec_id AND p.gb = 'b2'
       |                    AND p.ib < s.vec_id))
       |SELECT CAST(0 AS BIGINT) AS batch, vec_id FROM surv1
       |UNION ALL SELECT 1, vec_id FROM surv2""".stripMargin
  }

  /** SQL twin of the EVOLVING lifecycle (materialize on a base corpus
   *  → append → delete → probe): the route, bits and skew gate derive
   *  from the BASE subset's exact counts (the build-time measurement
   *  the meta froze — appends bucket under it until [[reRouteAnnIndex]]
   *  re-measures), while the bucketing and in-bucket re-rank run over
   *  the LIVE set (base ∪ appended, minus deleted). */
  def annTopKEvolvingSql(table: String, baseFilter: String,
      liveFilter: String, qFilter: String, k: Int, dim: Int,
      skewFactor: Long = 256, nproj: Int = 4): String = {
    val bucket = routedBucketSql("__annbase", dim, skewFactor, nproj)
    s"""WITH __annbase AS (SELECT * FROM $table WHERE $baseFilter),
       |__annlive AS (SELECT * FROM $table WHERE $liveFilter),
       |e AS (SELECT *, $bucket AS bucket
       |      FROM (${preparedSql("__annlive")})),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket
       |      FROM e WHERE $qFilter),
       |scored AS (SELECT q_id, e.vec_id AS n_id,
       |                  ${dotSql("qv", "e.v")} / (qn * e.nrm) AS sim
       |           FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id)
       |SELECT q_id, n_id, sim, rank FROM (
       |  SELECT q_id, n_id, sim, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin
  }

  // ----------------------------------------------------------- IVF ANN

  /** IVF-style ANN: partition the corpus into `nCells` inverted-file
   *  cells by nearest "centroid", search only within the query's cell.
   *
   *  Centroid set = the vectors with `vec_id < nCells` — a
   *  deterministic stand-in for a k-means codebook (real deployments
   *  train centroids offline; the ASSIGN/SEARCH dataflow, which is
   *  what scales, is identical). Assignment is one NARROW literal
   *  pass over the corpus — no shuffle until the per-cell search
   *  join; search cost is corpus²/nCells instead of corpus², and the
   *  final top-k is a bounded aggregation, not a window. Output:
   *  top-`k` neighbors per query among `nQueries` probe vectors. */
  def ivfTopK(emb: DataFrame, nCells: Int, nQueries: Int, k: Int): DataFrame = {
    val e = prepared(emb)
    // The codebook is driver-held (k×dim doubles — same residence as
    // kmeansCentroids'), so assignment is a NARROW projection: argmax
    // cosine via lexicographic least(struct(-csim, c_id)) over literal
    // centroid arrays — no corpus×nCells row expansion, no rank
    // window, zero shuffle. Ties → lower c_id, matching the oracle's
    // (csim DESC, c_id ASC) row_number. (An earlier formulation
    // crossJoined the centroid frame and ranked with a window — a
    // corpus-wide exchange for what is per-row math.)
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("v"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    val scoredCells = cents.map { case (cid, cv, cn) =>
      val cvArr = array(cv.map(lit): _*)
      struct((-(graft.functions.VectorExpressions.dot(col("v"), cvArr) /
        (col("nrm") * lit(cn)))).as("negsim"), lit(cid).as("c_id"))
    }
    val assigned = e
      .select(col("vec_id"), col("v"), col("nrm"),
        least(scoredCells: _*).getField("c_id").as("cell"))
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("cell"), col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    topKPerQuery(
      assigned.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          (dotExpr("qv", "v") / (col("qn") * col("nrm"))).as("sim")), k)
  }

  def ivfTopKSql(table: String, nCells: Int, nQueries: Int, k: Int): String =
    s"""WITH e AS (${preparedSql(table)}),
       |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM e WHERE vec_id < $nCells),
       |assigned AS (SELECT vec_id, v, nrm, cell FROM (
       |  SELECT e.vec_id, e.v, e.nrm, c_id AS cell,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      ${dotSql("v", "cv")} / (nrm * cn) DESC, c_id) AS crank
       |  FROM e CROSS JOIN cents
       |) WHERE crank = 1),
       |q AS (SELECT cell, vec_id AS q_id, v AS qv, nrm AS qn
       |      FROM assigned WHERE vec_id < $nQueries),
       |scored AS (SELECT q_id, a.vec_id AS n_id,
       |                  ${dotSql("qv", "a.v")} / (qn * a.nrm) AS sim
       |           FROM assigned a JOIN q USING (cell)
       |           WHERE a.vec_id <> q.q_id)
       |SELECT * FROM (
       |  SELECT q_id, n_id, sim, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-dup view: the single closest pair within
   *  each label block (labels act as the blocking key). Rank-1 per
   *  label is a lexicographic min(struct) AGGREGATION — argmax with
   *  (sim DESC, id_a, id_b) tie-break — not a window: labels are few
   *  and huge, so a label-partitioned window would sort every scored
   *  pair of a label on one reducer, while the aggregate reduces
   *  map-side to one candidate per (label, task). */
  def labelNearestPair(emb: DataFrame): DataFrame = {
    val e = prepared(emb)
    val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        (dotExpr("va", "vb") / (col("na") * col("nb"))).as("sim"))
      .groupBy(col("label"))
      .agg(min(struct((-col("sim")).as("neg"), col("id_a"), col("id_b"),
        col("sim"))).as("best"))
      .select(col("label"), col("best.id_a").as("id_a"),
        col("best.id_b").as("id_b"), col("best.sim").as("sim"))
  }

  def labelNearestPairSql(table: String): String =
    s"""WITH e AS (${preparedSql(table)}),
       |scored AS (SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
       |                  ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
       |           FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT label, id_a, id_b, sim FROM (
       |  SELECT label, id_a, id_b, sim, row_number() OVER
       |    (PARTITION BY label ORDER BY sim DESC, id_a, id_b) AS rank
       |  FROM scored
       |) WHERE rank = 1""".stripMargin

  /** EXACT per-label nearest pair, TRIANGLE-BLOCKED formulation — same
   *  result as [[labelNearestPair]] (bit-identical sims: ascending-index
   *  double accumulation with commutative per-element products,
   *  identical (sim DESC, id_a, id_b) tie-break), reorganized so the
   *  Σ label² pair space is never MATERIALIZED as rows AND nothing
   *  corpus-sized ever visits the driver. The join form ships two
   *  64-double arrays inside every scored pair row — it is the row
   *  machinery, not the arithmetic, that made X11 superlinear (exp1
   *  0.91). An earlier blocked form collected the whole corpus to the
   *  driver and broadcast it — fast at bench SFs, but driver memory
   *  binds long before the Σ label² FLOPs do, the classic scale-killer.
   *
   *  Here each row is assigned a block b = id mod B and shipped to the
   *  B groups {(label, min(b,k), max(b,k)) : k < B} — the classic
   *  triangle self-join: every unordered pair meets in exactly ONE of
   *  the B(B+1)/2 block-pair groups, replication is B ≈ √(2·groups)
   *  (not the |corpus| of a broadcast, not the S of a salted peer
   *  replication), and intra-LABEL parallelism is labels × B(B+1)/2
   *  groups — a 10-label corpus still spreads across hundreds of
   *  tasks. Each group buffers only its two block classes (≤ 2/B of
   *  one label), runs the tight dot loop, and emits ONE best — the
   *  final exchange carries ≤ labels × B² tiny rows. Exact-by-spec
   *  cost is still Σ label² FLOPs (that is what "exact" means on
   *  adversarial data), but organized at memory-bandwidth speed with
   *  executor-only residence. For the near-dup regime,
   *  [[labelNearestPairPruned]] avoids most of the pair space
   *  entirely. */
  def labelNearestPairExact(emb: DataFrame, blocks: Int = 8): DataFrame = {
    require(blocks >= 1 && blocks <= 256, s"blocks must be 1..256, got $blocks")
    val spark = emb.sparkSession
    import spark.implicits._
    val B = blocks
    val e = prepared(emb).select(col("label"), col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Long, Array[Double], Double)]
    // route each row to its B triangle groups; the row's own class is
    // re-derived inside the group from id mod B, so rows carry no side
    // marker through the exchange
    val routed = e.flatMap { case (label, id, v, nrm) =>
      val b = java.lang.Math.floorMod(id, B.toLong).toInt
      (0 until B).iterator.map { k =>
        (label, math.min(b, k), math.max(b, k), id, v, nrm)
      }
    }
    val partBest = routed
      .groupByKey { case (label, i, j, _, _, _) => (label, i, j) }
      .flatMapGroups { (key: (Int, Int, Int),
          it: Iterator[(Int, Int, Int, Long, Array[Double], Double)]) =>
        val (label, bi, bj) = key
        val clsI = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Array[Double], Double)]
        val clsJ = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Array[Double], Double)]
        it.foreach { case (_, _, _, id, v, nrm) =>
          val b = java.lang.Math.floorMod(id, B.toLong).toInt
          if (b == bi) clsI += ((id, v, nrm)) else clsJ += ((id, v, nrm))
        }
        // (negSim, id_a, id_b, sim) with (sim DESC, id_a, id_b) order —
        // same running-best rule as the join form's min(struct(...))
        var best: (Double, Long, Long, Double) = null
        def consider(idA: Long, va: Array[Double], na: Double,
            idB: Long, vb: Array[Double], nb: Double): Unit = {
          var acc = 0.0; var i = 0; val n = math.min(va.length, vb.length)
          while (i < n) { acc += va(i) * vb(i); i += 1 }
          val sim = acc / (na * nb)
          if (best == null || Ordering[(Double, Long, Long)].lt(
              (-sim, idA, idB), (best._1, best._2, best._3)))
            best = (-sim, idA, idB, sim)
        }
        if (bi == bj) {
          // within-class pairs: idB > idA
          val arr = clsI.sortBy(_._1).toArray
          var a = 0
          while (a < arr.length) {
            val (idA, va, na) = arr(a)
            var b = a + 1
            while (b < arr.length) {
              val (idB, vb, nb) = arr(b)
              consider(idA, va, na, idB, vb, nb)
              b += 1
            }
            a += 1
          }
        } else {
          // cross-class pairs: classes are disjoint, orient by id; the
          // per-element products commute, so the accumulation is
          // bit-identical regardless of which side is "a"
          val ai = clsI.toArray; val aj = clsJ.toArray
          var x = 0
          while (x < ai.length) {
            val (idX, vx, nx) = ai(x)
            var y = 0
            while (y < aj.length) {
              val (idY, vy, ny) = aj(y)
              if (idX < idY) consider(idX, vx, nx, idY, vy, ny)
              else consider(idY, vy, ny, idX, vx, nx)
              y += 1
            }
            x += 1
          }
        }
        if (best == null) Iterator.empty
        else Iterator((label, best._2, best._3, best._4))
      }
      .toDF("label", "id_a", "id_b", "sim")
    partBest
      .groupBy(col("label"))
      .agg(min(struct((-col("sim")).as("neg"), col("id_a"), col("id_b"),
        col("sim"))).as("best"))
      .select(col("label"), col("best.id_a").as("id_a"),
        col("best.id_b").as("id_b"), col("best.sim").as("sim"))
  }

  /** The 3^nproj ±1-multiprobe key DELTAS as one literal array: the
   *  12-bit-per-axis pack is linear in the offsets, so probing every
   *  adjacent cell is `baseKey + delta` with delta = Σ off_j·2^(12j) —
   *  a compile-time Long per offset combination. Inlining 3^nproj full
   *  pack() expression copies under one explode instead grew the
   *  generated projection past the JVM's 64 KB method limit at
   *  nproj=5 ("Code grows beyond 64 KB"), silently dropping the whole
   *  STAGE — including the exact-verify join it fed — out of
   *  whole-stage codegen (measured on q91: interpreted eval on the
   *  hottest loop). Callers explode `transform(probeDeltas(n), _ +
   *  baseKey)` — the add happens inside the generator's lambda (one
   *  compact loop, no post-Generate projection re-copying the carried
   *  columns: an explicit ck0+dk projection after the Generate
   *  measured 3x on the q85 path, whose probe rows carry the
   *  embedding). */
  private def probeDeltas(nproj: Int): Column =
    array(probeDeltaValues(nproj).map(lit): _*)

  // ------------------------------- candidate-pruned EXACT nearest pair

  /** Split of [[labelNearestPairPruned]] exposed for specs: grid
   *  candidates + per-label exactness certificate. Returns (resolved
   *  per-label bests — PROVABLY exact — and the labels the certificate
   *  could not resolve, which must fall back to the exact path).
   *
   *  Completeness argument: each vector's per-axis cell is
   *  floor(proj_j / w) with proj_j = ⟨v/|v|, p_j⟩ and w = 8/2^level;
   *  the candidate join probes all 3^nproj ±1-adjacent cells. The ±1
   *  ±1-vector planes have |p_j|₂ = √dim, so a pair at normalized
   *  Euclidean distance d has per-axis |Δproj| ≤ √dim·d; if
   *  d ≤ w/√dim the pair lands within ±1 cells on EVERY axis and IS a
   *  candidate. Hence if the best candidate's distance satisfies
   *  2 − 2·sim ≤ margin·(w/√dim)², every strictly-better pair would
   *  also be a candidate — contradiction — so the candidate best is
   *  the TRUE best. `margin` < 1 absorbs float rounding in the
   *  projections (the certificate gates only ROUTING; both routes are
   *  exact, so a margin miss costs work, never correctness). */
  private[graft] def prunedPairPhase(emb: DataFrame, dim: Int, nproj: Int,
      level: Int, margin: Double): (DataFrame, Seq[Int]) = {
    require(nproj >= 1 && nproj <= 5,
      s"cell packing is 12 bits/axis in one long: nproj must be 1..5, got $nproj")
    val e = prepared(emb)
    val scale = java.lang.Math.scalb(1.0, level - 3) // exact 2^(level-3)
    // same 12-bit axis-range bound as gridCellExpr, tightened one more
    // cell for the ±1 offset probe: √dim·scale < 2047 keeps every
    // SHIFTED key inside [0, 4096) (cell ≤ 2046 ⇒ +1+2048 ≤ 4095;
    // cell ≥ −2047 ⇒ −1+2048 ≥ 0)
    require(math.sqrt(dim.toDouble) * scale < 2047.0,
      s"12-bit axis range with ±1 probe: sqrt(dim)*2^(level-3) must be " +
        s"< 2047, got dim=$dim level=$level")
    val cells = (0 until nproj).map { j =>
      val wArr = array(planes(nproj, dim)(j).map(x => lit(x)): _*)
      floor(graft.functions.VectorExpressions.dot(col("v"), wArr)
        / col("nrm") * lit(scale)).cast("long").as(s"c$j")
    }
    val ec = e.select(Seq(col("label"), col("vec_id"), col("v"), col("nrm")) ++ cells: _*)
    def pack(off: Seq[Long]): Column =
      (0 until nproj).map(j =>
        (col(s"c$j") + lit(off(j)) + lit(2048L)) * lit(1L << (12 * j)))
        .reduce(_ + _)
    // a-side posts all 3^nproj shifted keys; b-side posts its own cell:
    // a pair matches on exactly ONE offset (= its cell difference), so
    // no candidate dedup is needed
    val base = pack(Seq.fill(nproj)(0L))
    val a = ec.select(col("label"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"),
      explode(transform(probeDeltas(nproj), _ + base)).as("ck"))
    val b = ec.select(col("label"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"), pack(Seq.fill(nproj)(0L)).as("ck"))
    // the candidate join is the operator's dominant cost — run it ONCE:
    // per-label bests are ≤ |labels| rows, so collect them and decide
    // resolved/unresolved on the driver (the returned resolved frame is
    // a literal re-materialization, not a second run of the join)
    val bests = a.join(b, Seq("label", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        (dotExpr("va", "vb") / (col("na") * col("nb"))).as("sim"))
      .groupBy(col("label"))
      .agg(min(struct((-col("sim")).as("neg"), col("id_a"), col("id_b"),
        col("sim"))).as("best"))
      .select(col("label"), col("best.id_a").as("id_a"),
        col("best.id_b").as("id_b"), col("best.sim").as("sim"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val w = 8.0 / java.lang.Math.scalb(1.0, level) // cell width
    val rg = w / math.sqrt(dim.toDouble)           // guaranteed radius
    val certBound = margin * rg * rg
    val certified = bests.filter { case (_, _, _, sim) =>
      2.0 - 2.0 * sim <= certBound }
    val certifiedLabels = certified.map(_._1).toSet
    val allLabels = e.select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val unresolvedLabels = allLabels.filterNot(certifiedLabels).sorted
    val spark = emb.sparkSession
    import spark.implicits._
    val resolved = certified.toSeq.toDF("label", "id_a", "id_b", "sim")
    (resolved, unresolvedLabels)
  }

  /** Candidate-pruned EXACT per-label nearest pair — X11's scale path
   *  in the NEAR-DUP regime, where it provably avoids most of the
   *  Σ label² pair space: grid cells bucket the corpus, the best
   *  in-±1-cell candidate per label is checked against the exactness
   *  certificate (see [[prunedPairPhase]]), and only the labels whose
   *  best pair is too FAR for the certificate (no tight dup exists)
   *  fall back to the blocked exact scan — so corpora whose labels
   *  contain genuine near-duplicates resolve with candidate work
   *  ~ Σ dup-group², never Σ label². Identical output to
   *  [[labelNearestPair]] by construction: both routes are exact and
   *  compute bit-identical sims, so the oracle is the SAME all-pairs
   *  SQL. */
  def labelNearestPairPruned(emb: DataFrame, dim: Int, nproj: Int = 3,
      level: Int = 3, margin: Double = 0.98): DataFrame = {
    val (resolved, unresolved) = prunedPairPhase(emb, dim, nproj, level, margin)
    if (unresolved.isEmpty) resolved
    else resolved.union(labelNearestPairExact(
      emb.filter(col("label").isin(unresolved: _*))))
  }

  // --------------------------------- exact cosine threshold pairs

  /** The COARSEST grid level whose ±1-cell probe is LOSSLESS at
   *  cosine threshold `tau`: pairs with cos ≥ tau sit within
   *  Euclidean distance d = √(2−2τ) (unit vectors), per-axis
   *  |Δproj| ≤ d·‖±1-plane‖ = d·√dim (Cauchy-Schwarz), and cells of
   *  width w ≥ d·√dim put such pairs at most one cell apart on every
   *  axis. w = 8/2^level ⇒ level = ⌊log₂(8/(d·√dim))⌋ (clamped ≥ 0).
   *  A pure function of (tau, dim) — no data dependence, so both
   *  engines embed the same literal. */
  def losslessGridLevel(tau: Double, dim: Int): Int = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1), got $tau")
    val d = math.sqrt(2.0 - 2.0 * tau)
    math.max(0, math.floor(
      math.log(8.0 / (d * math.sqrt(dim.toDouble))) / math.log(2.0)).toInt)
  }

  /** EXACT embedding near-dup pairs at a cosine threshold (X63): every
   *  (id_a < id_b) pair with cos ≥ `tau`, found without the n²/2 pair
   *  space. Grid cells at [[losslessGridLevel]] guarantee every
   *  qualifying pair lands within ±1 cell per axis, so the candidate
   *  set (a-side posts its 3^nproj shifted keys, b-side its own cell —
   *  each pair matches on exactly ONE offset, no dedup join needed) is
   *  PROVABLY complete; exact cosine verifies candidates and applies
   *  the threshold. Unlike the LSH near-dup family there is no recall
   *  knob to tune and no false-negative risk to argue about — the
   *  completeness bound is arithmetic.
   *
   *  Scale posture: the multiprobe explode carries (id, cell-key)
   *  ONLY — 16 bytes × 3^nproj per vector, never the embedding (an
   *  early form shipped the 64-double array through the explode:
   *  ~130 GB of exchange at 10⁶ vectors; the id-only form is ~4 GB
   *  at nproj=5) — and vectors join back by id for the exact verify,
   *  so the heavy rows move once per side, not per probe key.
   *  Candidate work is Σ(cell-neighborhood occupancy²) — the
   *  τ-neighborhood mass. Per-axis selectivity is governed by
   *  d/σ (Cauchy-Schwarz is tight for ±1 planes), so the operator's
   *  regime is TIGHT thresholds (τ ≳ 0.999 on spread-out corpora, or
   *  any τ on genuinely clustered near-dup data); for loose
   *  thresholds relative to the corpus spread, exactness is
   *  inherently near-quadratic — reach for the approximate family
   *  (X7 MinHash, X57 grid ANN) instead. */
  def cosineNearDupPairs(emb: DataFrame, dim: Int, tau: Double,
      nproj: Int = 5): DataFrame = {
    val (ec, a, b) = pairProbeFrames(emb, dim, tau, nproj)
    val cand = a.join(b, Seq("ck")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // exact verify: vectors join back by id (heavy rows move once)
    val va = ec.select(col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val vb = ec.select(col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotExpr("va", "vb") / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** The [[cosineNearDupPairs]] candidate machinery, exposed for mass
   *  probing: (prepared+celled corpus, a-side 3^nproj probe-key frame,
   *  b-side own-cell frame). Candidate mass = the (a ⋈ b on ck)
   *  row count — computable from per-key occupancies without
   *  materializing a pair. */
  private[graft] def pairProbeFrames(emb: DataFrame, dim: Int,
      tau: Double, nproj: Int): (DataFrame, DataFrame, DataFrame) = {
    require(nproj >= 1 && nproj <= 5,
      s"cell packing is 12 bits/axis in one long: nproj must be 1..5, got $nproj")
    val level = losslessGridLevel(tau, dim)
    val scale = java.lang.Math.scalb(1.0, level - 3)
    require(math.sqrt(dim.toDouble) * scale < 2047.0,
      s"12-bit axis range with ±1 probe: dim=$dim level=$level")
    val e = prepared(emb)
    val cells = (0 until nproj).map { j =>
      val wArr = array(planes(nproj, dim)(j).map(x => lit(x)): _*)
      floor(graft.functions.VectorExpressions.dot(col("v"), wArr)
        / col("nrm") * lit(scale)).cast("long").as(s"c$j")
    }
    val ec = e.select(Seq(col("vec_id"), col("v"), col("nrm")) ++ cells: _*)
    def pack(off: Seq[Long]): Column =
      (0 until nproj).map(j =>
        (col(s"c$j") + lit(off(j)) + lit(2048L)) * lit(1L << (12 * j)))
        .reduce(_ + _)
    // candidate generation on (id, key) rows only
    val base = pack(Seq.fill(nproj)(0L))
    val a = ec.select(col("vec_id").as("id_a"),
      explode(transform(probeDeltas(nproj), _ + base)).as("ck"))
    val b = ec.select(col("vec_id").as("id_b"),
      pack(Seq.fill(nproj)(0L)).as("ck"))
    (ec, a, b)
  }

  /** Oracle: the UNPRUNED all-pairs formulation — the strongest
   *  possible check on the candidate pruning (a lost pair is a
   *  missing row, not a matching hash). */
  def cosineNearDupPairsSql(table: String, tau: Double): String =
    s"""WITH e AS (${preparedSql(table)})
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= $tau""".stripMargin

  // --------------------------------------- semantic dedup (SemDeDup)

  /** Semantic-dedup survivor set (X69) — the APPLY step of
   *  embedding-space near-dup removal, the curation pass SemDeDup
   *  (Abbas et al., 2023, arXiv:2303.09540) runs before training:
   *  drop every vector that has a semantically-duplicate neighbor
   *  with a smaller id (the deterministic keep-one rule — survivors
   *  are exactly the vectors with no ≥ τ cosine neighbor earlier in
   *  id order), keep the rest as the training corpus.
   *
   *  Where the paper bounds the O(n²) pairwise pass with k-means
   *  clusters and accepts the recall loss of cross-cluster pairs,
   *  here the candidate blocks are [[cosineNearDupPairs]]'s lossless
   *  grid cells: every ≥ τ pair IS a candidate (arithmetic bound, no
   *  recall knob), so the survivor set is EXACT for the rule — which
   *  is what lets the unpruned all-pairs SQL act as the oracle.
   *  Same operating regime as the pair list: tight thresholds, or
   *  genuinely clustered near-dup corpora.
   *
   *  Scale posture: the pair machinery's posture (id-only multiprobe
   *  explode, vectors move once for the verify join) plus ONE
   *  subtraction join of the corpus against the distinct
   *  dominated-id set — the q32 dedup-apply shape; the probe side is
   *  the dominated ids (≤ corpus, typically ≪), broadcast-able at
   *  real duplicate rates. The subtraction is a LEFT OUTER + IS NULL
   *  filter rather than a left-anti join DELIBERATELY: when `emb` is
   *  a Union (multi-shard corpora, or this repo's twinned test
   *  frame), Catalyst's PushdownLeftSemiAntiJoin duplicates the anti
   *  join's RIGHT subtree into every union branch — re-running the
   *  whole candidate join per branch (measured: the q97 plan carried
   *  two full copies of the dominated-set aggregate). Outer joins
   *  are not subject to that rewrite, so the expensive subtree is
   *  planned exactly once; `dominated` is distinct, so the outer
   *  join cannot multiply rows. */
  def semanticDedupSurvivors(emb: DataFrame, dim: Int, tau: Double,
      nproj: Int = 5): DataFrame = {
    val dominated = cosineNearDupPairs(emb, dim, tau, nproj)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("graft_dominated", lit(1))
    emb.select(col("vec_id"), col("label"))
      .join(dominated, Seq("vec_id"), "left")
      .filter(col("graft_dominated").isNull)
      .select(col("vec_id"), col("label"))
  }

  /** Oracle: survivors under the UNPRUNED all-pairs dominated set —
   *  a candidate lost by the grid would resurface here as an extra
   *  surviving row. */
  def semanticDedupSurvivorsSql(table: String, tau: Double): String =
    s"""SELECT vec_id, label FROM $table sem_t
       |WHERE vec_id NOT IN (
       |  SELECT id_b FROM (${cosineNearDupPairsSql(table, tau)}))""".stripMargin

  // ----------------------------------- SemDeDup, k-means-blocked (scale)

  /** SemDeDup APPLY, the paper's OWN blocked algorithm (Abbas et al.
   *  2023 §2: k-means-cluster the embeddings, dedup within clusters):
   *  drop every vector whose CLUSTER holds a smaller-id ≥ τ cosine
   *  neighbor, keep the rest. APPROXIMATE by construction — a
   *  cross-cluster near-dup survives, the recall trade the paper
   *  itself accepts (its reported results all run this form) — where
   *  [[semanticDedupSurvivors]] is the exact rule via lossless grid
   *  candidates, whose candidate volume on clustered corpora is
   *  pair-mass-bound (measured at the 100× sweep: 21.6 G candidate
   *  pairs, 938 s, then ENOSPC from the candidate-join spill — the
   *  same range exclusion as q91).
   *
   *  Cost model, honest: with k clusters over n vectors, assignment
   *  is n·k·d FLOPs and the within-cluster apply is ~(n²/k)·d, so the
   *  balanced k = ⌈√n⌉ (the default) gives **n^1.5·d total — the
   *  algorithm's inherent brute-within-blocks cost**, not an
   *  implementation artifact (the paper pays the same shape on
   *  GPUs). The engine's LINEAR paths for the same curation goal are
   *  X7 MinHash (text) and X57 grid / X21 IVF ANN (embeddings).
   *
   *  Shape at scale: Lloyd training is the q43 machinery with the
   *  assignment loop over BROADCAST centroids (k up to ~10⁵ — the
   *  literal-projection form caps at ~64) and the exact fixed-point
   *  integer mean aggregation (order-free, cross-engine identical);
   *  the apply co-locates each cluster with ONE hash exchange on the
   *  cell, sorts (cell, vec_id) within partitions, and streams each
   *  cell through a tight dot loop holding ONLY the current cell's
   *  vectors (O(max-cell·d) task memory) with early exit on the
   *  first dominating neighbor — no pair row ever materializes.
   *  Returns (vec_id, label) survivors. */
  def semanticDedupBlocked(emb: DataFrame, tau: Double, iters: Int = 2,
      kOverride: Long = 0L): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1), got $tau")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = emb.sparkSession
    val e0 = prepared(emb).select(col("vec_id"), col("label"), col("v"),
      col("nrm"))
    // rows², not bytes, is the cost driver — same rule as the exact
    // pair loop: spread the corpus to cluster parallelism
    val par = spark.sparkContext.defaultParallelism
    val e = (if (e0.rdd.getNumPartitions < par) e0.repartition(par) else e0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = e.count()
      val k = if (kOverride > 0) kOverride
        else math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)
      val init = initCentroids(e, k)
      // unlike q43 (caller-chosen k), k here is COUNT-derived, so the
      // dense-from-0 id contract the init rule assumes must be checked:
      // a sparse/offset id space would yield too few (or zero)
      // centroids — degenerate cells on the Spark side and an EMPTY
      // assignment chain in the oracle. Fail loudly instead.
      require(init.size == k,
        s"semanticDedupBlocked inits centroids from vec_id < k=$k and " +
          s"found ${init.size} — the operator requires ids dense from 0 " +
          "(re-key the corpus, or pass kOverride within the id range)")
      val cents = lloydIterate(e, init, iters, assignCellBroadcast)
      val assigned = assignCellBroadcast(e, cents)
        .repartition(col("cell"))
        .sortWithinPartitions("cell", "vec_id")
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.IntegerType)))
      val survivors = assigned.rdd.mapPartitions { it =>
        var curCell = Long.MinValue
        // current cell's already-seen (smaller-id) vectors + norms —
        // the ONLY loop state; cleared at each cell boundary
        val seenV = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val seenN = scala.collection.mutable.ArrayBuffer.empty[Double]
        it.flatMap { r =>
          val cell = r.getLong(4)
          if (cell != curCell) { curCell = cell; seenV.clear(); seenN.clear() }
          val v = r.getSeq[Double](2).toArray
          val nrm = r.getDouble(3)
          var dominated = false
          var j = 0
          while (j < seenV.length && !dominated) {
            val pv = seenV(j)
            var acc = 0.0; var i = 0
            val d = math.min(v.length, pv.length)
            while (i < d) { acc += pv(i) * v(i); i += 1 }
            if (acc / (seenN(j) * nrm) >= tau) dominated = true
            j += 1
          }
          seenV += v; seenN += nrm
          if (dominated) None
          else Some(org.apache.spark.sql.Row(r.getLong(0), r.getInt(1)))
        }
      }
      // materialize while `e` is still persisted: the plan reads the
      // cached corpus through two jobs (count/train happened above) —
      // returning lazily and unpersisting in finally would recompute
      spark.createDataFrame(survivors, outSchema)
        .localCheckpoint(eager = true)
    } finally { e.unpersist(blocking = false); () }
  }

  /** Nearest-centroid assignment over BROADCAST centroids — the
   *  large-k twin of the literal-projection assignment (same score
   *  `−2·⟨v,c⟩ + |c|²`, same ascending-index fold, same lowest-c_id
   *  tie-break — ascending iteration + strict `<`), as a per-row
   *  loop so k is bounded by broadcast memory (k·d doubles), not by
   *  codegen size. Appends `cell`. */
  private def assignCellBroadcast(e: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val spark = e.sparkSession
    val bc = spark.sparkContext.broadcast(cents.sortBy(_._1).map {
      case (cid, cv) => (cid, cv.toArray, dotLocal(cv, cv))
    }.toArray)
    val schema = e.schema.add("cell",
      org.apache.spark.sql.types.LongType, nullable = false)
    val vIdx = e.schema.fieldIndex("v")
    val rdd = e.rdd.mapPartitions { it =>
      val cs = bc.value
      it.map { r =>
        val v = r.getSeq[Double](vIdx).toArray
        var bestScore = Double.PositiveInfinity
        var bestCid = Long.MaxValue
        var ci = 0
        while (ci < cs.length) {
          val c = cs(ci)
          val cv = c._2
          var acc = 0.0; var i = 0
          val d = math.min(v.length, cv.length)
          while (i < d) { acc += v(i) * cv(i); i += 1 }
          val score = acc * -2.0 + c._3
          if (score < bestScore) { bestScore = score; bestCid = c._1 }
          ci += 1
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bestCid)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** DuckDB oracle twin of [[semanticDedupBlocked]]: k from the same
   *  ⌈√n⌉ rule (scalar subquery), the q43-proven fixed-point Lloyd
   *  CTE chain, window-ranked assignment (ties → lower c_id), and a
   *  NOT EXISTS dominated test within the final cells. */
  def semanticDedupBlockedSql(table: String, tau: Double,
      iters: Int = 2): String = {
    def assignSql(cents: String, out: String): String =
      s"""$out AS (SELECT vec_id, v, c_id FROM (
         |  SELECT e.vec_id, e.v, c.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      (${dotSql("e.v", "c.cv")}) * -2.0 + c.cn2 ASC, c.c_id) AS r
         |  FROM e CROSS JOIN
         |    (SELECT c_id, cv, ${dotSql("cv", "cv")} AS cn2 FROM $cents) c
         |) WHERE r = 1)""".stripMargin
    val iterCtes = (0 until iters).map { i =>
      s"""${assignSql(s"c$i", s"a$i")},
         |m$i AS (SELECT c_id, pos,
         |          (CAST(sum(CAST(floor(x * 1073741824.0 + 0.5) AS BIGINT))
         |                AS DOUBLE)
         |           / CAST(count(*) AS DOUBLE)) / 1073741824.0 AS m
         |        FROM (SELECT c_id, generate_subscripts(v, 1) AS pos,
         |                unnest(v) AS x FROM a$i)
         |        GROUP BY c_id, pos),
         |c${i + 1} AS (SELECT c.c_id, COALESCE(mm.cv, c.cv) AS cv
         |        FROM c$i c LEFT JOIN (SELECT c_id, list(m ORDER BY pos) AS cv
         |                              FROM m$i GROUP BY c_id) mm
         |          ON c.c_id = mm.c_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, label, v, nrm FROM (${preparedSql(table)})),
       |kk AS (SELECT greatest(2, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)))
       |         AS BIGINT)) AS k FROM e),
       |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e
       |       WHERE vec_id < (SELECT k FROM kk)),
       |$iterCtes,
       |${assignSql(s"c$iters", "afin")},
       |j AS (SELECT a.vec_id, a.c_id, e.label, e.v, e.nrm
       |      FROM afin a JOIN e USING (vec_id)),
       |dom AS (SELECT DISTINCT b.vec_id FROM j a JOIN j b
       |        ON a.c_id = b.c_id AND a.vec_id < b.vec_id
       |        WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= $tau)
       |SELECT vec_id, label FROM j
       |WHERE vec_id NOT IN (SELECT vec_id FROM dom)""".stripMargin
  }

  // ------------------------------- SemDeDup, measured-route (default)

  /** Measured τ-neighborhood candidate mass of the exact grid rule:
   *  Σ occ_a·occ_b over the ±1-probe key join — EXACTLY the number of
   *  candidate rows [[cosineNearDupPairs]] would materialize, computed
   *  from per-key occupancies without materializing one (the ProbeQ91
   *  arithmetic, promoted from dev probe to routing input). Two narrow
   *  passes + one tiny key-count join; all integers over the same
   *  bit-identical cell projections both engines compute, so the SQL
   *  twin re-derives the identical value. */
  def semanticCandidateMass(emb: DataFrame, dim: Int, tau: Double,
      nproj: Int = 5): (Long, Long) = {
    val (_, a, b) = pairProbeFrames(emb, dim, tau, nproj)
    val occA = a.groupBy("ck").agg(count(lit(1)).as("na"))
    val occB = b.groupBy("ck").agg(count(lit(1)).as("nb"))
    // count the RAW corpus, not `b` — same number, but b's plan pays
    // the cell projections (dot products) just to count rows
    val n = emb.count()
    // the Long sum is paired with a double shadow: on extreme-skew
    // corpora the exact mass can exceed 2⁶³, and with ANSI off the
    // wrapped NEGATIVE sum would route to the EXACT path in precisely
    // the blow-up regime the router exists to avoid. Any saturated
    // mass is astronomically over every sane budget, so clamping to
    // MaxValue routes blocked — and the small-scale integer compare
    // (the oracle's regime) is untouched.
    val m = occA.join(occB, Seq("ck"))
      .agg(sum(col("na") * col("nb")),
        sum(col("na").cast("double") * col("nb").cast("double"))).first()
    val exact = if (m.isNullAt(0)) 0L else m.getLong(0)
    val shadow = if (m.isNullAt(1)) 0.0 else m.getDouble(1)
    val mass = if (exact < 0L || shadow > 4.0e18) Long.MaxValue else exact
    (n, mass)
  }

  /** SemDeDup with the route MEASURED, not guessed (the q20 pattern
   *  applied to the q97/q110 pair — round-7 item 4): the candidate
   *  mass of the exact lossless-grid rule is probed first, and the
   *  EXACT path ([[semanticDedupSurvivors]] — no recall knob, oracle
   *  is unpruned all-pairs) runs only while that mass is
   *  sub-quadratic (≤ n·`budgetFactor` — a per-vector candidate
   *  budget, the same knob shape as [[annRouted]]'s). Past the
   *  budget — the measured sf10 regime where the exact rule ran 938 s
   *  into ENOSPC on 21.6 G candidates — it routes to the paper's own
   *  k-means-blocked form ([[semanticDedupBlocked]], 26.7 s on the
   *  same corpus), accepting the cross-cluster recall trade the paper
   *  itself accepts. The decision is an integer comparison on exact
   *  counts, so the oracle re-derives the identical route from the
   *  same occupancy arithmetic. */
  def semanticDedupRouted(emb: DataFrame, dim: Int, tau: Double,
      nproj: Int = 5, iters: Int = 2,
      budgetFactor: Long = 256L): DataFrame = {
    val (n, mass) = semanticCandidateMass(emb, dim, tau, nproj)
    if (mass <= n * budgetFactor) semanticDedupSurvivors(emb, dim, tau, nproj)
    else semanticDedupBlocked(emb, tau, iters)
  }

  /** The packed ±1 probe-delta literals (3^nproj values) — shared by
   *  the Spark probe array and the SQL twin's unnest list. */
  private def probeDeltaValues(nproj: Int): Seq[Long] =
    Seq.fill(nproj)(Seq(-1L, 0L, 1L))
      .foldLeft(Seq(Seq.empty[Long]))((acc, ax) =>
        for (p <- acc; o <- ax) yield p :+ o)
      .map(off => (0 until nproj).map(j => off(j) * (1L << (12 * j))).sum)

  /** SQL twin of the routing flag: TRUE iff the exact rule is within
   *  budget — the identical occupancy arithmetic over the identical
   *  packed cell keys. */
  def semanticRouteExactSql(table: String, tau: Double, dim: Int,
      nproj: Int = 5, budgetFactor: Long = 256L): String = {
    val level = losslessGridLevel(tau, dim)
    val base = (0 until nproj).map { j =>
      val wArr = planes(nproj, dim)(j).mkString("[", ", ", "]")
      s"((CAST(floor(${dotSql("v", wArr)} / nrm * " +
        s"${java.lang.Math.scalb(1.0, level - 3)}) AS BIGINT) + 2048) " +
        s"* ${1L << (12 * j)})"
    }.mkString("(", " + ", ")")
    val deltas = probeDeltaValues(nproj).mkString("[", ", ", "]")
    s"""(SELECT COALESCE(sum(na * nb), 0) <=
       |    (SELECT count(*) FROM $table) * $budgetFactor FROM
       |  (SELECT ck, count(*) AS na FROM
       |    (SELECT cel.base + d.d AS ck FROM
       |      (SELECT $base AS base FROM (${preparedSql(table)})) cel
       |      CROSS JOIN (SELECT unnest($deltas) AS d) d)
       |   GROUP BY ck) aocc
       |  JOIN
       |  (SELECT $base AS ck, count(*) AS nb FROM (${preparedSql(table)})
       |   GROUP BY 1) bocc
       |  USING (ck))""".stripMargin
  }

  /** Route-gated oracle: both branches are written, each guarded by
   *  the scalar route flag — row-identical to whichever branch the
   *  Spark side measured its way into. (DuckDB evaluates both
   *  subqueries; at oracle scale that is fine — the ROUTING exists to
   *  protect the at-scale Spark run, and the sweep's large-SF runs
   *  are Spark-only.) */
  def semanticDedupRoutedSql(table: String, tau: Double, dim: Int,
      nproj: Int = 5, iters: Int = 2, budgetFactor: Long = 256L): String = {
    val flag = semanticRouteExactSql(table, tau, dim, nproj, budgetFactor)
    s"""SELECT vec_id, label FROM (${semanticDedupSurvivorsSql(table, tau)})
       |WHERE $flag
       |UNION ALL
       |SELECT vec_id, label FROM (${semanticDedupBlockedSql(table, tau, iters)})
       |WHERE NOT $flag""".stripMargin
  }

  // ------------------------------------- scalar-quantized (int8) ANN

  /** Symmetric int8 scalar quantization (X62): component →
   *  `floor(x·127 + 0.5)` — exact double arithmetic + exact floor in
   *  both engines, so the quantized vectors (and therefore the
   *  integer candidate scores) are BIT-IDENTICAL cross-engine with no
   *  float-fold quantization tricks. Valid because the embedding
   *  corpus is unit-normalized: |x| ≤ 1 ⇒ codes in [−127, 127]. The
   *  codes are carried as integral doubles so the fused [[DotProduct]]
   *  kernel scores candidates unchanged (|dot| ≤ 127²·dim < 2⁵³ —
   *  every value exact). */
  private def sq8Expr(vName: String): Column =
    expr(s"transform(`$vName`, x -> cast(floor(x * 127.0D + 0.5D) as double))")

  private def sq8Sql(vExpr: String): String =
    s"list_transform($vExpr, x -> CAST(floor(x * 127.0 + 0.5) AS DOUBLE))"

  /** ANN top-k via int8 candidate generation + exact re-rank — the
   *  compressed-corpus scale path: at 100 TB of float32 embeddings
   *  the quantized corpus is 4× smaller (16× vs the double form), so
   *  the scan that touches EVERY vector reads int8 codes, and full-
   *  precision vectors are read only for the ≤ k·`rerank` candidates
   *  per query that survive. Candidate pass = one narrow corpus scan
   *  against broadcast quantized queries with the bounded `SimTopK`
   *  heap (k·rerank per query per map task on the exchange, never the
   *  scored rows); re-rank = corpus ⋈ broadcast candidate ids (a
   *  filter, no row multiplication) scored in exact double cosine.
   *  Integer candidate scores make the cut deterministic (ties break
   *  on vec_id), so recall is reproducible, not seed-dependent.
   *  Approximate by design: a true neighbor can quantize below the
   *  candidate cut; `rerank` is the recall knob. */
  def sq8TopK(emb: DataFrame, nQueries: Int, k: Int,
      rerank: Int = 4): DataFrame = {
    val e = prepared(emb).withColumn("qv8", sq8Expr("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv8").as("qq8"),
        col("v").as("qv"), col("nrm").as("qn"))
    // candidate pass: integer dots on the quantized codes
    val cand = topKPerQuery(
      e.crossJoin(broadcast(q.select(col("q_id"), col("qq8"))))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          dotExpr("qq8", "qv8").as("sim")),
      k * rerank)
      .select(col("q_id"), col("n_id"))
    // exact re-rank: full-precision cosine on the candidates only
    val scored = e.join(broadcast(cand), e("vec_id") === cand("n_id"))
      .join(broadcast(q.select(col("q_id").as("qid2"), col("qv"), col("qn"))),
        col("q_id") === col("qid2"))
      .select(col("q_id"), col("n_id"),
        (dotExpr("qv", "v") / (col("qn") * col("nrm"))).as("sim"))
    topKPerQuery(scored, k)
  }

  def sq8TopKSql(table: String, nQueries: Int, k: Int,
      rerank: Int = 4): String =
    s"""WITH e AS (SELECT vec_id, label, v, ${normSql("v")} AS nrm,
       |             ${sq8Sql("v")} AS qv8 FROM
       |             (SELECT vec_id, label, $toDoubleSql AS v FROM $table)),
       |q AS (SELECT vec_id AS q_id, qv8 AS qq8, v AS qv, nrm AS qn
       |      FROM e WHERE vec_id < $nQueries),
       |cand AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, e.vec_id AS n_id, row_number() OVER
       |    (PARTITION BY q_id ORDER BY ${dotSql("qq8", "qv8")} DESC,
       |     e.vec_id) AS crank
       |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
       |) WHERE crank <= ${k * rerank}),
       |scored AS (SELECT cand.q_id, cand.n_id,
       |             ${dotSql("qv", "v")} / (qn * nrm) AS sim
       |           FROM cand JOIN e ON e.vec_id = cand.n_id
       |                JOIN q ON q.q_id = cand.q_id)
       |SELECT * FROM (
       |  SELECT q_id, n_id, sim, CAST(row_number() OVER
       |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  // ------------------------------------------------ gram / covariance

  /** Distributed Gram matrix of the embedding corpus: the upper
   *  triangle of Σ x·xᵀ as (i, j, s) rows — the one-pass statistic
   *  PCA / whitening / low-rank analysis of an embedding table starts
   *  from (the d×d second-moment matrix; subtract the mean outer
   *  product for covariance). Components are quantized to fixed-point
   *  BEFORE summing (q = ⌊x·2¹⁰ + ½⌋, exact double arithmetic on a
   *  power-of-two scale) so the sum is exact BIGINT arithmetic —
   *  order-independent, hence partitioning-independent and
   *  bit-identical cross-engine, where a double Σ x_i·x_j would hash
   *  differently under every shuffle schedule. s = Σ q_i·q_j, so
   *  gram ≈ s / 2²⁰.
   *
   *  Shape at 100 TB: ONE narrow pass through the fixed-width
   *  [[graft.functions.GramAggregate.gramSum]] aggregate — each map
   *  task folds its slice into a dense local long[d(d+1)/2] (the
   *  bounded-state [[graft.functions.TopKAggregate]] shape applied to
   *  a dense accumulator), and the exchange carries ONE 2 080-long
   *  buffer per task, independent of corpus size. (The explode
   *  formulation this replaces pushed |corpus|·d(d+1)/2 struct rows
   *  through Generate + hash-agg probing: measured 1.9 s at sf0.1 and
   *  ≈ 1.25 G agg rows at sf10; the dense fold is the same exact sums
   *  at multiply-add speed.) The final (i, j) unpack explodes the ONE
   *  merged buffer row — 2 080 rows total, not corpus-sized. No
   *  driver state; the d×d result is trivially collectable for the
   *  eigensolve step ([[pcaBasis]]).
   *  Overflow headroom: |q| ≤ 2¹⁰·max|x|, so |q_i·q_j| ≤ 2²⁰·max|x|²
   *  (2²⁶ at max|x| ≤ 8) and Σ|q_i·q_j| stays under 2⁶³ for any
   *  corpus within 2⁶³/(2²⁰·max|x|²) ≈ 2³⁷ rows (~1.4e11) at
   *  max|x| ≤ 8. */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * 1024d + 0.5d).cast("long"))
    // pos → (i, j): literal triangular index tables, applied to the
    // single merged-buffer row (2 080 entries, never corpus-sized)
    val iIdx = (0 until dim).flatMap(i => (i until dim).map(_ => i.toLong))
    val jIdx = (0 until dim).flatMap(i => (i until dim).map(_.toLong))
    df.select(q.as("__q"))
      .agg(graft.functions.GramAggregate.gramSum(col("__q"), dim).as("g"))
      .select(posexplode(col("g")).as(Seq("pos", "s")))
      .select(
        element_at(typedlit(iIdx), col("pos") + 1).as("i"),
        element_at(typedlit(jIdx), col("pos") + 1).as("j"),
        col("s"))
  }

  /** DuckDB oracle twin: same quantization, same exact integer sums,
   *  index pairs from a cross join of two unnested ranges. NULL
   *  vectors are filtered here exactly as [[GramSum]] skips null
   *  input — without the filter, a corpus whose every embedding is
   *  NULL would emit d(d+1)/2 NULL-sum rows where the aggregate's
   *  empty-buffer path emits zero rows. */
  def gramMatrixSql(from: String, vecExpr: String, dim: Int): String =
    s"""SELECT i, j, CAST(sum(q[i + 1] * q[j + 1]) AS BIGINT) AS s
       |FROM (SELECT list_transform($vecExpr, x ->
       |        CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS q
       |      FROM $from WHERE $vecExpr IS NOT NULL),
       |  (SELECT unnest(range(0, $dim)) AS i),
       |  (SELECT unnest(range(0, $dim)) AS j)
       |WHERE j >= i GROUP BY i, j""".stripMargin

  /** Principal-component basis off a collected [[gramMatrix]] result:
   *  cyclic Jacobi eigendecomposition of the symmetric d×d matrix
   *  (driver-side — the input is d(d+1)/2 longs, NOT data-sized;
   *  classic dense eigensolve, converges quadratically for symmetric
   *  matrices). Returns (eigenvalues descending, row-major
   *  eigenvector matrix V with V(k) the k-th component), descaled by
   *  2⁻²⁰ back to embedding units. The 100 TB split: the corpus-sized
   *  pass is [[gramMatrix]]'s one scan; this step is O(d³) on one
   *  machine regardless of corpus size — projection onto the basis is
   *  then a narrow broadcast-constant `transform`. */
  def pcaBasis(gram: Seq[(Int, Int, Long)], dim: Int): (Array[Double], Array[Array[Double]]) = {
    val a = Array.ofDim[Double](dim, dim)
    gram.foreach { case (i, j, s) =>
      a(i)(j) = s / 1048576.0; a(j)(i) = a(i)(j)
    }
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until dim; qi <- (p + 1) until dim) {
        off += a(p)(qi) * a(p)(qi)
        if (math.abs(a(p)(qi)) > 1e-18) {
          val theta = (a(qi)(qi) - a(p)(p)) / (2.0 * a(p)(qi))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 // theta == 0 → 45° rotation
              case x => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until dim) {
            val akp = a(k)(p); val akq = a(k)(qi)
            a(k)(p) = c * akp - s * akq; a(k)(qi) = s * akp + c * akq
          }
          for (k <- 0 until dim) {
            val apk = a(p)(k); val aqk = a(qi)(k)
            a(p)(k) = c * apk - s * aqk; a(qi)(k) = s * apk + c * aqk
          }
          for (k <- 0 until dim) {
            val vkp = v(k)(p); val vkq = v(k)(qi)
            v(k)(p) = c * vkp - s * vkq; v(k)(qi) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until dim).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until dim).map(k => v(k)(i)).toArray).toArray)
  }
}
