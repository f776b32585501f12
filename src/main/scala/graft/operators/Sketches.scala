package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sketch aggregates — the one-pass, fixed-memory alternatives to
 * exact distinct / frequency / quantile computation (SURVEY §2.5
 * X50–X52).
 *
 * Why they matter at 100 TB: an exact `count(DISTINCT v)` over a
 * high-cardinality column shuffles every distinct value; an exact
 * top-k shuffles every key; an exact quantile ranks every row. The
 * sketch versions keep a SMALL fixed-size summary per partition
 * (HyperLogLog++ registers, a count-min matrix, a Greenwald-Khanna /
 * KLL summary), merge summaries pairwise on the exchange, and never
 * move row-level data — the aggregation state is O(sketch), not
 * O(data). All three ride Spark's native codegen'd aggregates
 * (`approx_count_distinct`, `percentile_approx`) or the built-in
 * `CountMinSketch` (`df.stat.countMinSketch` — a one-pass
 * treeAggregate of per-partition sketches).
 *
 * Sketches are approximate, so they cannot hash-match a DuckDB
 * oracle directly (DuckDB's HLL is a different implementation).
 * Instead each has a `verified*` harness twin that computes the
 * sketch AND the exact answer, asserts the sketch's published error
 * contract AT RUNTIME, and returns the exact (oracle-expressible)
 * frame — the q65-bloom-screen pattern: a broken sketch fails the
 * query, a working one proves its bound. The `verified*` forms exist
 * for the correctness gate; the production entry points are the
 * plain sketch forms.
 */
object Sketches {

  /** Per-group approximate distinct count (HyperLogLog++,
   *  relative standard deviation `rsd`). One pass, O(1.04/rsd²)
   *  registers per group, no distinct-value shuffle — the scale
   *  path for "unique users per segment" over 100 TB. Deterministic:
   *  Spark's HLL hashes with a fixed seed. */
  def approxDistinctByGroup(df: DataFrame, groupCol: String,
      valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** HLL error contract made oracle-visible: approx and exact distinct
   *  counts aggregate in ONE pass over the data (two agg expressions,
   *  one shuffle); every group's relative error must be ≤ `maxRelErr`
   *  or the query throws. Returns the exact counts, which the oracle
   *  can express as `count(DISTINCT …)`. The collect is bounded by
   *  the group-key cardinality — this is a verification harness for
   *  low-cardinality groupings, not the production entry point. */
  def verifiedDistinctByGroup(df: DataFrame, groupCol: String,
      valueCol: String, rsd: Double, maxRelErr: Double): DataFrame = {
    val both = df.groupBy(col(groupCol)).agg(
      countDistinct(col(valueCol)).as("n_distinct"),
      approx_count_distinct(col(valueCol), rsd).as("__approx"))
    val rows = both.collect()
    rows.foreach { r =>
      val n = r.getLong(1)
      val a = r.getLong(2)
      val err = math.abs(a - n).toDouble / math.max(n, 1L)
      require(err <= maxRelErr,
        f"HLL contract breach for group ${r.get(0)}: exact=$n approx=$a " +
          f"relErr=$err%.4f > $maxRelErr%.4f (rsd=$rsd)")
    }
    val schema = StructType(Seq(both.schema.head,
      StructField("n_distinct", LongType, nullable = false)))
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r.get(0), r.getLong(1))): _*),
      schema)
  }

  /** Count-min sketch over `keyCol`: one pass, per-partition sketches
   *  merged pairwise (`DataFrameStatFunctions.countMinSketch`), depth
   *  ⌈ln(1/(1−confidence))⌉ × width ⌈e/eps⌉ counters total — the
   *  fixed-memory frequency oracle for 100 TB key streams.
   *  `estimateCount(k) ≥ true(k)` is a HARD guarantee (hash collisions
   *  only ever ADD); `estimateCount(k) ≤ true(k) + eps·N` holds with
   *  probability ≥ confidence over the seed. */
  def countMin(df: DataFrame, keyCol: String, eps: Double,
      confidence: Double, seed: Int): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(col(keyCol), eps, confidence, seed)

  /** CMS contract made oracle-visible: the exact top-k keys (count
   *  desc, key asc — a deterministic total order) are probed against
   *  the sketch; every estimate must respect the no-underestimate
   *  hard bound and a 4×-slack overestimate bound, or the query
   *  throws. Returns the exact top-k, which the oracle expresses as
   *  GROUP BY / ORDER BY / LIMIT. */
  def verifiedTopK(df: DataFrame, keyCol: String, k: Int, eps: Double,
      confidence: Double, seed: Int): DataFrame = {
    val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol)).limit(k)
    val cms = countMin(df, keyCol, eps, confidence, seed)
    val rows = exact.collect()
    rows.foreach { r =>
      val key = r.get(0)
      val n = r.getLong(1)
      val est = cms.estimateCount(key)
      require(est >= n,
        s"CMS hard-bound breach for key $key: estimate=$est < true=$n")
      val slack = (4 * eps * cms.totalCount()).toLong + 1
      require(est <= n + slack,
        s"CMS overestimate for key $key: estimate=$est > true=$n + $slack")
    }
    val schema = StructType(Seq(exact.schema.head,
      StructField("n", LongType, nullable = false)))
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r.get(0), r.getLong(1))): _*),
      schema)
  }

  /** Per-group approximate quantiles with the rank contract checked:
   *  `percentile_approx(v, p, accuracy)` promises its result sits
   *  within rank ε·n of the true p-quantile, ε = 1/accuracy. The
   *  check joins each group's approx values back against the data
   *  (sketch side broadcast — groups × probs rows) and counts exact
   *  ranks in one aggregate pass: for each (group, p) there must be a
   *  rank r with count(v < a) < r ≤ count(v ≤ a) and
   *  |r − p·n| ≤ ε·n + 1. Returns the EXACT interpolated quantiles
   *  via [[Percentiles.exactByGroup]] (quantile_cont semantics, the
   *  oracle-expressible form). */
  def verifiedQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[(String, Double)],
      accuracy: Int = 100): DataFrame = {
    val eps = 1.0 / accuracy
    val probs = ps.map(_._2)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
    val approx = base.groupBy(col("g")).agg(
      percentile_approx(col("v"), typedLit(probs), lit(accuracy)).as("qs"),
      count(lit(1)).as("n"))
    val targets = approx.select(col("g"), col("n"),
      posexplode(col("qs")).as(Seq("pi", "a")))
    val ranks = base.join(broadcast(targets), Seq("g"))
      .groupBy(col("g"), col("pi"), col("a"), col("n"))
      .agg(sum(when(col("v") < col("a"), 1L).otherwise(0L)).as("below"),
        sum(when(col("v") <= col("a"), 1L).otherwise(0L)).as("at_or_below"))
      .collect()
    ranks.foreach { r =>
      val (g, pi, n) = (r.get(0), r.getInt(1), r.getLong(3))
      val p = probs(pi)
      val (below, atOrBelow) = (r.getLong(4), r.getLong(5))
      val target = p * n
      val tol = eps * n + 1
      // nearest admissible rank of `a` to the target
      val rank = math.max(below + 1, math.min(atOrBelow, math.round(target)))
      require(rank > below && rank <= atOrBelow &&
          math.abs(rank - target) <= tol,
        f"GK rank contract breach for group $g p=$p: ranks ($below, $atOrBelow] " +
          f"vs target $target%.1f ± $tol%.1f (n=$n)")
    }
    Percentiles.exactByGroup(df, groupCol, valueCol, ps)
  }
}
