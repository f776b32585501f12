package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measured PQ evidence (X124–X127): two claims turned into numbers.
 *
 *  1. ENCODE — the literal-codebook projection's cost as the
 *     per-subspace codebook grows toward production size (ks = 8 →
 *     64 → 256, the FAISS byte-code default). The projection embeds
 *     m·ks literal centroids; the probe records rows/sec AND whether
 *     the plan stayed inside WholeStageCodegen, so the "zero-shuffle
 *     narrow encode" claim is confirmed at each ks, not assumed from
 *     the ks=8 judged row.
 *  2. SEARCH — brute exact cosine vs integer-ADC IVF-PQ vs
 *     ADC+exact-re-rank on a corpus replicated ~100× beyond the SF
 *     table (training stays on the base table — the bounded-sample
 *     production shape), with the ADC candidate mass measured so the
 *     nprobe/kc pruning factor is a number, not a ratio on paper.
 *
 *  One JSON line per row — the artifact PLANS/SCALE cite. Usage:
 *    SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProbePq'
 */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val rep = sys.env.getOrElse("SPARK_GRAFT_PQ_REP", "100").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exhaust(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = graft.sources.Sources.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .localCheckpoint(true)
    val n0 = base.count()
    // rep copies with distinct ids; rep 0 keeps the original ids, so
    // vec_id < nQueries still addresses the base queries
    val corpus = base.crossJoin(broadcast(spark.range(rep).as("__r")))
      .select((col("vec_id") + col("id") * n0).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(cpus * 2)
      .localCheckpoint(true)
    val n = corpus.count()
    val (m, iters, dim) = (4, 2, 64)

    // 1) encode cost vs codebook size. pqEncode's construction runs
    // the training folds eagerly (driver-held codebooks) and returns
    // the LAZY encode projection: trainSec times the folds, encSec
    // times only the per-row projection the 100 TB pass would pay.
    for (ks <- Seq(8, 64, 256)) {
      val t0 = System.nanoTime()
      val frame = Similarity.pqEncode(corpus, m, ks, iters, dim)
      val trainSec = (System.nanoTime() - t0) / 1e9
      // executedPlan.toString marks codegen'd nodes with a "*(n)"
      // stage prefix (WholeStageCodegenExec prints that, not its name)
      val plan = frame.queryExecution.executedPlan.toString
      val codegen = plan.contains("*(")
      exhaust(frame) // warmup: codegen compile for this literal table
      val t1 = System.nanoTime()
      exhaust(frame)
      val encSec = (System.nanoTime() - t1) / 1e9
      println(s"""{"probe":"pq_encode","ks":$ks,"m":$m,"rows":$n,""" +
        s""""train_sec":$trainSec,"encode_sec":$encSec,""" +
        s""""rows_per_sec":${(n / encSec).toLong},"codegen":$codegen,""" +
        s""""sf":"$sfDir","rep":$rep}""")
    }

    // 2) search arms at production-ish knobs
    val (nq, k, kc, ks, nprobe) = (16, 10, 16, 64, 2)
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // build ONCE: training folds (driver-side jobs) run at build
      // time and are NOT the per-query cost the arms compare — at
      // 100 TB they amortize over every query against the index
      val frame = mk
      exhaust(frame) // warmup
      val t = System.nanoTime()
      exhaust(frame)
      val sec = (System.nanoTime() - t) / 1e9
      println(s"""{"probe":"pq_search","arm":"$label","n":$n,"nq":$nq,""" +
        s""""k":$k,"kc":$kc,"ks":$ks,"nprobe":$nprobe,"sec":$sec}""")
    }
    time("brute")(Similarity.knnBrute(corpus, nq, k))
    time("ivfpq_adc")(Similarity.ivfPqTopK(corpus, nq, k, kc, m, ks,
      iters, dim, nprobe))
    time("ivfpq_rerank")(Similarity.ivfPqRerank(corpus, nq, k, kc, m,
      ks, iters, dim, nprobe, 4))
    // the at-rest arm: codes materialized once (what a deployment
    // serves from), the timed scan touches ONLY the compressed table
    val ixDir = java.nio.file.Files.createTempDirectory("graft_probe_pqix")
      .toString
    val tIx = System.nanoTime()
    Similarity.materializePqIndex(corpus, ixDir, kc, m, ks, iters, dim, "probe")
    println(s"""{"probe":"pq_materialize","n":$n,""" +
      s""""sec":${(System.nanoTime() - tIx) / 1e9}}""")
    val queries = corpus.filter(col("vec_id") < nq)
      .select(col("vec_id").as("q_id"), col("embedding"))
    time("ivfpq_indexed")(Similarity.ivfPqTopKIndexed(spark, ixDir,
      queries, k, nprobe, Some("probe")))
    // candidate mass: keep-all ADC = one row per (query, candidate)
    val pairsAdc = Similarity.ivfPqTopK(corpus, nq, n.toInt, kc, m, ks,
      iters, dim, nprobe).count()
    val pairsBrute = nq.toLong * (n - 1)
    println(s"""{"probe":"pq_candidates","pairs_adc":$pairsAdc,""" +
      s""""pairs_brute":$pairsBrute,""" +
      s""""prune_factor":${pairsBrute.toDouble / pairsAdc}}""")

    // 3) X131/X133 lifecycle: what segment growth does to the
    // probed-cell scan, and what compaction recovers — measured
    // through FileSourceScanExec's own numOutputRows (the q139/q141
    // engine-level metric, applied to the code table). Build on the
    // lower half (init ids 0..kc-1 live there), append the upper
    // half as 8 arrival-ordered segments, probe ONE cell.
    import graft.operators.Layout
    val ix2 = java.nio.file.Files.createTempDirectory("graft_probe_pqgrow")
      .toString
    val half = n / 2
    Similarity.materializePqIndex(corpus.filter(col("vec_id") < half),
      ix2, kc, m, ks, iters, dim, "probe2")
    for (b <- 0 until 8)
      Similarity.appendToPqIndex(ix2,
        corpus.filter(col("vec_id") >= half && col("vec_id") % 8 === b),
        s"b$b", Some("probe2"))
    val cellPred = Seq(("cell", 0L, 0L))
    val preLive = Layout.zLiveSegments(s"$ix2/codes")
    val (scan1, match1) =
      Layout.probeScanRowsPaths(spark, preLive, cellPred)
    require(Similarity.compactPqIndex(spark, ix2, numFiles = kc),
      "9 live segments must fold")
    val postLive = Layout.zLiveSegments(s"$ix2/codes")
    val (scan2, match2) =
      Layout.probeScanRowsPaths(spark, postLive, cellPred)
    require(match1 == match2,
      s"compaction changed probe content: $match1 vs $match2")
    println(s"""{"probe":"pq_compact_scan","rows":$n,"cell":0,""" +
      s""""segments_pre":${preLive.size},"segments_post":${postLive.size},""" +
      s""""matched":$match1,"scanned_pre":$scan1,"scanned_post":$scan2,""" +
      s""""skip_factor":${scan1.toDouble / math.max(scan2, 1L)}}""")
    spark.stop()
  }
}
