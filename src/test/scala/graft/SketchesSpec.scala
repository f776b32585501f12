package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch aggregates (X50–X52): each verified twin must return the
 *  EXACT answer while proving the sketch's error contract, and the
 *  raw sketches must respect their published bounds on synthetic data
 *  where the truth is known in closed form. */
class SketchesSpec extends SparkTestBase {

  import spark.implicits._

  // 40k rows, 4 groups with known distinct cardinalities 1 / 10 / 1k / 10k
  private lazy val groups = {
    val rows = Seq.tabulate(40000) { i =>
      val g = i % 4
      val card = Seq(1, 10, 1000, 10000)(g)
      (s"g$g", (i / 4) % card)
    }
    rows.toDF("g", "v")
  }

  test("verifiedDistinctByGroup returns exact counts under the HLL contract") {
    val out = Sketches.verifiedDistinctByGroup(groups, "g", "v",
      rsd = 0.02, maxRelErr = 0.10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("g0" -> 1L, "g1" -> 10L, "g2" -> 1000L, "g3" -> 10000L))
  }

  test("an unattainable error bound fails loudly, not silently") {
    // rsd=0.3 over 10k distinct values has nonzero error; demanding
    // exactness must throw — proving the contract check actually runs
    val e = intercept[IllegalArgumentException] {
      Sketches.verifiedDistinctByGroup(groups.filter(col("g") === "g3"),
        "g", "v", rsd = 0.3, maxRelErr = 0.0)
    }
    assert(e.getMessage.contains("HLL contract breach"))
  }

  // Zipf-ish skew: key k appears 2^(14-k) times for k = 0..14
  private lazy val skewed =
    (0 to 14).flatMap(k => Seq.fill(1 << (14 - k))(k)).toDF("k")

  test("CMS estimates never underestimate and stay within eps*N on hot keys") {
    val cms = Sketches.countMin(skewed, "k", eps = 0.001,
      confidence = 0.99, seed = 42)
    assert(cms.totalCount() === (1 << 15) - 1)
    for (k <- 0 to 14) {
      val truth = 1L << (14 - k)
      val est = cms.estimateCount(Long.box(k.toLong))
      assert(est >= truth, s"underestimate at $k")
      assert(est <= truth + (cms.totalCount() * 0.001).toLong + 1,
        s"overestimate at $k: $est vs $truth")
    }
  }

  test("verifiedTopK returns the exact top-k with deterministic tie-break") {
    // keys 100..104 all tie at 8 rows; top-6 must take 0,1 (big) then
    // the four smallest tied keys in key order
    val tied = ((0 to 1).flatMap(k => Seq.fill(100 - k)(k)) ++
      (100 to 104).flatMap(k => Seq.fill(8)(k))).toDF("k")
    val out = Sketches.verifiedTopK(tied, "k", 6, eps = 0.001,
      confidence = 0.99, seed = 7)
      .orderBy(col("n").desc, col("k")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out === Seq(0 -> 100L, 1 -> 99L, 100 -> 8L, 101 -> 8L,
      102 -> 8L, 103 -> 8L))
  }

  test("edge: k beyond the key space returns every key; empty inputs don't crash") {
    val tiny = Seq(1, 1, 2).toDF("k")
    val all = Sketches.verifiedTopK(tiny, "k", 10, 0.01, 0.99, 1)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(all === Set(1 -> 2L, 2 -> 1L))
    assert(Sketches.verifiedDistinctByGroup(groups.filter(lit(false)),
      "g", "v", 0.05, 0.1).collect().isEmpty)
    assert(Sketches.verifiedTopK(tiny.filter(lit(false)), "k", 5,
      0.01, 0.99, 1).collect().isEmpty)
  }

  test("verifiedQuantilesByGroup ≡ exact selection under the rank contract") {
    // deterministic LCG values, two groups of very different shape
    var seed = 12345L
    def next(): Double = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 11).toDouble }
    val data = Seq.tabulate(5000)(i => (s"g${i % 2}", next())).toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    val got = Sketches.verifiedQuantilesByGroup(data, "g", "v", ps, accuracy = 100)
    val want = graft.operators.Percentiles.exactByGroup(data, "g", "v", ps)
    assert(got.orderBy("g").collect().toSeq === want.orderBy("g").collect().toSeq)
  }
}
