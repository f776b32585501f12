package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deterministic Lloyd/k-means layer (round-13 split): the ONE
 *  training loop every clustered consumer inherits — q43/q148's
 *  judged rows, the IVF coarse quantizers, and the PQ sub-codebooks
 *  ([[SimilarityPq]] composes these members directly). */
private[operators] trait SimilarityKmeans extends SimilarityBase {
  // ------------------------------------------------------ k-means train

  /** Deterministic Lloyd's k-means over the embedding column — the
   *  codebook-training step [[ivfTopK]]'s docs point at. Every source
   *  of nondeterminism is removed so the result is a pure function of
   *  the data (and DuckDB-oracle verifiable):
   *   - init: centroids = vectors with `vec_id < k` (no RNG);
   *   - assignment: argmin squared-L2 via `-2·v·c + |c|²` (the `|v|²`
   *     term is constant per row), ties → lower c_id;
   *   - update: per-dimension mean over FIXED-POINT long sums — each
   *     value quantizes to `floor(x·2³⁰ + ½)` (a bigint; exact and
   *     identical in both engines), the quantized values sum exactly
   *     (decimal(38,0) partials here, HUGEINT in DuckDB — integral
   *     inputs, so none of the double→decimal tie-rounding that made
   *     a direct decimal sum diverge 1 ulp), and the mean divides
   *     back in double with one fixed expression shape both sides.
   *     Order-free AND bit-deterministic, with bounded per-group
   *     state: map-side partial sums replace the earlier
   *     `sort_array(collect_list(...))` sequential fold, which
   *     buffered ~|corpus|/k values per (cell,dim) group — unbounded
   *     aggregation state at 100 TB;
   *   - empty cells keep their previous centroid.
   *
   *  Scale posture: centroids live on the DRIVER between iterations
   *  (k×dim doubles — Spark MLlib's KMeans keeps them there too) and
   *  enter each assignment as LITERAL arrays in a narrow projection,
   *  so the corpus NEVER shuffles for assignment (an earlier
   *  formulation crossJoined a centroid frame and ranked with a
   *  window — a corpus-wide exchange+sort per iteration for what is
   *  per-row math). The only shuffle per iteration is the (cell, dim)
   *  mean aggregation: k×dim rows after map-side partials. Iterations
   *  are a driver loop over small plans, so lineage stays flat.
   *  Returns (c_id, cv: array<double>). */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    trainedCentroids(emb, k, iters).toDF("c_id", "cv")
  }

  protected def trainedCentroids(emb: DataFrame, k: Int,
      iters: Int): Seq[(Long, Seq[Double])] = {
    val e = prepared(emb).select(col("vec_id"), col("v"))
    lloydIterate(e, initCentroids(e, k), iters, assignByLiterals)
  }

  /** Lloyd init: the k lowest vec_ids (no RNG — the q43 contract). */
  protected def initCentroids(e: DataFrame, k: Long): Seq[(Long, Seq[Double])] =
    e.filter(col("vec_id") < k)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
      .sortBy(_._1)

  /** The shared Lloyd iteration chain — ONE implementation for both
   *  assignment strategies (literal projection for small k, broadcast
   *  loop for large k), so a change to the update rule (quantization
   *  constant, empty-cell carry-over) can never diverge the two
   *  k-means paths from each other or from the q43 oracle. */
  protected def lloydIterate(e: DataFrame, init: Seq[(Long, Seq[Double])],
      iters: Int,
      assign: (DataFrame, Seq[(Long, Seq[Double])]) => DataFrame): Seq[(Long, Seq[Double])] = {
    var cents = init
    for (_ <- 0 until iters) {
      val means = cellDimMeans(assign(e, cents).select(col("cell"), col("v")))
        .collect()
      val byCell: Map[Long, Seq[Double]] = means.groupBy(_.getLong(0)).map {
        case (cid, rows) => cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      // empty cells keep their previous centroid
      cents = cents.map { case (cid, cv) => (cid, byCell.getOrElse(cid, cv)) }
    }
    cents
  }

  /** Per-(cell, dimension) fixed-point mean — the Lloyd update step.
   *  Map-side partial sums of `floor(x·2³⁰ + ½)` quantized bigints
   *  (exact in decimal(38,0) — no per-group value buffering, unlike a
   *  `collect_list` fold, so aggregation state stays O(1) per group
   *  at any corpus size); the divide back to double uses one fixed
   *  expression shape mirrored verbatim in the DuckDB oracle.
   *  `private[graft]` so PlanAuditSpec can pin the no-collect_list,
   *  hash-aggregate plan. */
  private[graft] def cellDimMeans(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")))
      .groupBy(col("cell"), col("pos"))
      .agg(((expr("cast(sum(cast(cast(floor(col * 1073741824.0D + 0.5D)" +
        " as bigint) as decimal(38,0))) as double)") /
        count(lit(1)).cast("double")) / lit(1073741824.0)).as("m"))

  /** Ascending-index fold — the driver-side twin of the codegen'd
   *  DotProduct accumulation order (bit-identical: IEEE addition is
   *  deterministic for a fixed order). */
  protected def dotLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Narrow nearest-centroid assignment over a LITERAL codebook —
   *  the codegen'd [[graft.functions.PqArgmin]] loop (score =
   *  −2·⟨v,c⟩ + ‖c‖², ascending-index dot fold, ties to the lower
   *  c_id): one compact generated method at ANY codebook size, where
   *  the unrolled least(struct) tree this replaces fell out of
   *  whole-stage codegen past ks ≈ 100 and went interpreted.
   *  Zero shuffle. */
  protected def assignByLiterals(e: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    e.withColumn("cell",
      graft.functions.VectorExpressions.pqArgmin(col("v"), 0, cents))

  /** Trained-codebook summary query: per-cell member count and
   *  centroid norm after `iters` Lloyd iterations (scalar outputs —
   *  engine-comparable without array hashing). */
  def kmeansSummary(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = prepared(emb).select(col("vec_id"), col("v"))
    val cents = trainedCentroids(emb, k, iters)
    val sizes = assignByLiterals(e, cents)
      .groupBy(col("cell")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cents.map { case (cid, cv) =>
      (cid, sizes.getOrElse(cid, 0L), math.sqrt(dotLocal(cv, cv)))
    }.toDF("c_id", "n_members", "cnorm")
  }

  def kmeansSummarySql(table: String, k: Int, iters: Int): String =
    s"""WITH ${lloydChainSql(table, k, iters)},
       |sizes AS (SELECT c_id, count(*) AS n FROM afin GROUP BY c_id)
       |SELECT c.c_id AS c_id, COALESCE(s.n, 0) AS n_members,
       |       sqrt(${dotSql("c.cv", "c.cv")}) AS cnorm
       |FROM c$iters c LEFT JOIN sizes s ON c.c_id = s.c_id""".stripMargin

  /** The shared Lloyd-loop CTE chain (init, every assignment + fixed-
   *  point mean update with empty-cell inheritance, final assignment
   *  `afin`) — ONE SQL builder behind [[kmeansSummarySql]] and
   *  [[kmeansAssignSql]], mirroring [[lloydIterate]] being the one
   *  Scala path: an update-rule change can never drift the two
   *  judged k-means rows apart. */
  protected def lloydChainSql(table: String, k: Int, iters: Int): String =
    lloydChainSqlOn(s"SELECT vec_id, v FROM (${preparedSql(table)})",
      k, iters, "")

  /** [[lloydChainSql]] generalized to an arbitrary (vec_id, v) base
   *  query and a CTE-name prefix, so several independent chains can
   *  coexist in ONE oracle statement — the product-quantization twins
   *  run one chain per subspace (prefix `s<j>_`) plus a coarse chain,
   *  all over slices of the same base projection. Prefix "" keeps the
   *  historical q43/q148 chain semantics unchanged (the assignment
   *  subquery now aliases the prefixed base CTE as `e`, so every
   *  inner reference reads identically at any prefix). */
  protected def lloydChainSqlOn(baseSql: String, k: Int, iters: Int,
      p: String): String = {
    def assignSql(cents: String, out: String): String =
      s"""$out AS (SELECT vec_id, v, c_id FROM (
         |  SELECT e.vec_id, e.v, c.c_id,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      (${dotSql("e.v", "c.cv")}) * -2.0 + c.cn2 ASC, c.c_id) AS r
         |  FROM ${p}e e CROSS JOIN
         |    (SELECT c_id, cv, ${dotSql("cv", "cv")} AS cn2 FROM $cents) c
         |) WHERE r = 1)""".stripMargin
    val iterCtes = (0 until iters).map { i =>
      s"""${assignSql(s"${p}c$i", s"${p}a$i")},
         |${p}m$i AS (SELECT c_id, pos,
         |          (CAST(sum(CAST(floor(x * 1073741824.0 + 0.5) AS BIGINT))
         |                AS DOUBLE)
         |           / CAST(count(*) AS DOUBLE)) / 1073741824.0 AS m
         |        FROM (SELECT c_id, generate_subscripts(v, 1) AS pos,
         |                unnest(v) AS x FROM ${p}a$i)
         |        GROUP BY c_id, pos),
         |${p}c${i + 1} AS (SELECT c.c_id, COALESCE(mm.cv, c.cv) AS cv
         |        FROM ${p}c$i c LEFT JOIN (SELECT c_id, list(m ORDER BY pos) AS cv
         |                              FROM ${p}m$i GROUP BY c_id) mm
         |          ON c.c_id = mm.c_id)""".stripMargin
    }.mkString(",\n")
    s"""${p}e AS ($baseSql),
       |${p}c0 AS (SELECT vec_id AS c_id, v AS cv FROM ${p}e WHERE vec_id < $k),
       |$iterCtes,
       |${assignSql(s"${p}c$iters", s"${p}afin")}""".stripMargin
  }

  /** Per-vector cluster assignment under the SAME trained codebook
   *  q43 judges — the clustered-corpus artifact SemDeDup-style dedup
   *  (Abbas et al. 2023) and cluster-balanced sampling (Tirumala et
   *  al. 2023) actually consume: one cell id per vector, judged as
   *  its own row so the assignment path (not only q43's summary)
   *  rides CORRECTNESS and the sweep. ONE code path by construction:
   *  training is [[trainedCentroids]] (the shared [[lloydIterate]]),
   *  assignment is [[assignByLiterals]] — no second Lloyd loop to
   *  drift. Plan: the iters driver loop (k×dim literal centroids,
   *  the codebook pattern) + ONE final narrow zero-shuffle
   *  projection. Output (vec_id, cell). */
  def kmeansAssign(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = prepared(emb).select(col("vec_id"), col("v"))
    assignByLiterals(e, trainedCentroids(emb, k, iters))
      .select(col("vec_id"), col("cell"))
  }

  /** DuckDB oracle twin of [[kmeansAssign]] — the same shared Lloyd
   *  chain, final assignment projected per vector. */
  def kmeansAssignSql(table: String, k: Int, iters: Int): String =
    s"""WITH ${lloydChainSql(table, k, iters)}
       |SELECT vec_id, CAST(c_id AS BIGINT) AS cell FROM afin""".stripMargin
}
