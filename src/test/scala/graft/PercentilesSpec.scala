package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Percentiles

/** Distributed-selection percentiles must equal the window formulation
 *  bit-for-bit (same cast + interpolation shape) while never
 *  co-locating a whole group. */
class PercentilesSpec extends SparkTestBase {

  /** The previous oracle-green window formulation, kept as the test
   *  reference: correct for many small groups, single-reducer-per-
   *  group for few huge ones. */
  private def viaWindow(df: org.apache.spark.sql.DataFrame,
      ps: Seq[(String, Double)]): Map[Any, Seq[Double]] = {
    val byG = Window.partitionBy("g")
    val ranked = df.select(col("g"), col("v").cast("double").as("v"))
      .withColumn("rn0", row_number().over(byG.orderBy("v")).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(byG))
      .collect().groupBy(_.get(0))
    ranked.map { case (g, rows) =>
      val n = rows.head.getLong(3)
      val byRank = rows.map(r => r.getLong(2) -> r.getDouble(1)).toMap
      g -> ps.map { case (_, p) =>
        val rn = p * (n - 1).toDouble
        val lo = byRank(math.floor(rn).toLong)
        val hi = byRank(math.ceil(rn).toLong)
        if (math.floor(rn) == math.ceil(rn)) lo
        else lo * (math.ceil(rn) - rn) + hi * (rn - math.floor(rn))
      }
    }
  }

  private val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)

  test("selection ≡ window on skewed synthetic groups (incl. ties, n=1)") {
    import spark.implicits._
    val rows =
      (0 until 4001).map(i => ("hot", ((i * 2654435761L) % 1000).toDouble / 7.0)) ++
      (0 until 40).map(i => ("warm", (i % 5).toDouble)) ++ // heavy ties
      Seq(("single", 42.0))
    val df = rows.toDF("g", "v").repartition(16)
    val got = Percentiles.exactByGroup(df, "g", "v", ps, partitions = 8)
      .collect().map(r => r.get(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val want = viaWindow(df, ps)
    assert(got.keySet == want.keySet)
    for (g <- want.keys)
      assert(got(g) == want(g), s"group $g: ${got(g)} != ${want(g)}")
  }

  test("selection ≡ window on real lineitem groups") {
    val li = graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val got = Percentiles.exactByGroup(li, "g", "v", ps)
      .collect().map(r => r.get(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val want = viaWindow(li, ps)
    assert(got == want)
  }

  test("empty input yields an empty result, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Percentiles.exactByGroup(empty, "g", "v", ps).collect().isEmpty)
  }

  test("NULL values are ignored, matching quantile_cont") {
    import spark.implicits._
    // nulls used to sort first, count toward n, and unbox to 0.0 when
    // a target rank landed on one — quantile_cont ignores them
    val df = Seq(("a", Option(1.0)), ("a", None), ("a", Option(3.0)),
      ("a", None), ("a", Option(2.0))).toDF("g", "v")
    val out = Percentiles
      .exactByGroup(df, "g", "v", Seq("p50" -> 0.5)).collect()
    assert(out.length === 1 && out.head.getDouble(1) === 2.0)
  }

  test("result is invariant to input partitioning and partition knob") {
    import spark.implicits._
    val rows = (0 until 997).map(i => (s"g${i % 3}", math.sin(i).abs * 100))
    val a = Percentiles.exactByGroup(rows.toDF("g", "v").repartition(1),
      "g", "v", ps, partitions = 3).collect().map(_.toSeq).toSet
    val b = Percentiles.exactByGroup(rows.toDF("g", "v").repartition(23),
      "g", "v", ps, partitions = 17).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
