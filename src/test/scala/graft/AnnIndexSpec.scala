package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.Streams

/** Persist-once routed ANN index (round-7 item 2): build measures the
 *  route and materializes every vector's bucket ONCE; query batches
 *  probe the written table with zero corpus-embedding rescans. */
class AnnIndexSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random corpus; `spread` ≈ 0 collapses it
   *  onto one direction (angular cluster), 1.0 keeps it uniform. */
  private def corpus(n: Int, spread: Double) = {
    val rnd = new scala.util.Random(42)
    val center = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    (0 until n).map { i =>
      val v = Array.tabulate(dim)(d =>
        center(d) + (rnd.nextDouble() * 2 - 1) * spread)
      (i.toLong, s"l${i % 5}", v.toSeq)
    }.toDF("vec_id", "label", "embedding")
  }

  test("route is measured: uniform corpus signs, clustered corpus grids") {
    val uniformDir = Streams.scratchDir("graft_annix_u_")
    val mu = Similarity.materializeAnnIndex(corpus(400, 1.0), dim,
      uniformDir, "fpU")
    assert(mu.route == "sign" && mu.n == 400L && mu.s2 <= 400L * 256,
      s"uniform corpus must route to sign-LSH: $mu")
    val clusteredDir = Streams.scratchDir("graft_annix_c_")
    val mc = Similarity.materializeAnnIndex(corpus(400, 0.01), dim,
      clusteredDir, "fpC")
    assert(mc.route == "grid" && mc.s2 > 400L * 256,
      s"clustered corpus must route to grid: $mc")
    // meta sidecar round-trips exactly
    assert(Similarity.readAnnIndexMeta(uniformDir).contains(mu))
    assert(Similarity.readAnnIndexMeta(clusteredDir).contains(mc))
  }

  test("repeated query batches never rescan a corpus embedding") {
    val scans = spark.sparkContext.longAccumulator("corpus_scans")
    val touch = udf { (l: String) => scans.add(1); l }.asNondeterministic()
    val emb = corpus(300, 1.0).withColumn("label", touch(col("label")))
    val dir = Streams.scratchDir("graft_annix_scan_")
    Similarity.materializeAnnIndex(emb, dim, dir, "fp1")
    val afterBuild = scans.value
    assert(afterBuild > 0L, "the build must have scanned the corpus")
    val queries = corpus(300, 1.0).limit(20)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val r1 = Similarity.annTopKIndexed(spark, dir, queries, 3, Some("fp1"))
    val r2 = Similarity.annTopKIndexed(spark, dir, queries, 3, Some("fp1"))
    assert(r1.count() > 0 && r2.count() == r1.count())
    assert(scans.value == afterBuild,
      s"probes must not rescan the corpus: $afterBuild → ${scans.value}")
  }

  test("indexed top-1 over all vectors equals annRouted") {
    val emb = corpus(400, 1.0)
    val dir = Streams.scratchDir("graft_annix_eq_")
    Similarity.materializeAnnIndex(emb, dim, dir, "fpE")
    val indexed = Similarity.annTopKIndexed(spark, dir,
        emb.select(col("vec_id").as("q_id"), col("embedding")), 1, Some("fpE"))
      .select(col("q_id").as("vec_id"), col("n_id"), col("sim"))
    val routed = Similarity.annRouted(emb, dim)
    assert(indexed.exceptAll(routed).isEmpty && routed.exceptAll(indexed).isEmpty,
      "indexed probe must reproduce the routed ANN result exactly")
  }

  test("a stale or foreign index fails loudly at probe time") {
    val dir = Streams.scratchDir("graft_annix_stale_")
    Similarity.materializeAnnIndex(corpus(100, 1.0), dim, dir, "fpOld")
    val e = intercept[IllegalArgumentException] {
      Similarity.loadAnnIndex(spark, dir, Some("fpNew"))
    }
    assert(e.getMessage.contains("STALE"))
    intercept[IllegalStateException] {
      Similarity.loadAnnIndex(spark,
        Streams.scratchDir("graft_annix_empty_"), None)
    }
  }
}
