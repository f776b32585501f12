package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** PLANS.md's audit claims, pinned as tests: hot paths stay inside
 *  whole-stage codegen, predicates reach the scans, dimension joins
 *  broadcast, and nothing falls back to a nested-loop join. */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def executed(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def fallbacksIn(plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case e: CodegenFallback => out += e.getClass.getSimpleName
        case _ =>
      })
    }
    out.distinct.toSeq
  }

  test("hot-path queries contain no interpreted (CodegenFallback) expressions") {
    // The accepted interpreted spots (PLANS.md) are NOT in this list:
    // q17/q32/q42 (4-element band-hash transform), q29 (JsonToStructs),
    // q43 (sequential mean folds — deliberate for float determinism).
    val hot = Seq("q1_sum_fields", "q6_cast_int", "q10_tag_fanout",
      "q12_quality_score", "q13_lang_id", "q14_fingerprint",
      "q15_dedup_exact", "q16_jaccard_dup", "q18_simhash",
      "q19_knn_brute", "q21_embed_dup", "q23_group_agg",
      "q38_asof_join", "q39_simhash_multiindex",
      "q40_stratified_sample", "q41_hash_sample", "q46_token_freq",
      "q51_range_join", "q52_decontaminate", "q55_salted_agg",
      "q56_repetition", "q58_chunk_tokens", "q72_pii_redact",
      "q75_expectations", "q76_profile")
    // (q37/q57 coordinate driver-side over RDD passes — their inner
    // scans are audited via PercentilesSpec/CurationSpec instead)
    val offenders = hot.flatMap { name =>
      fallbacksIn(executed(name)).map(e => s"$name: $e")
    }
    assert(offenders.isEmpty,
      s"interpreted expressions crept into hot paths: ${offenders.mkString(", ")}")
  }

  test("q43 Lloyd update aggregates with bounded state (no collect_list)") {
    // The mean fold is fixed-point long sums — map-side partial
    // HashAggregate, O(1) state per (cell, dim) group. The earlier
    // sort_array(collect_list(...)) formulation buffered ~|corpus|/k
    // values per group: unbounded aggregation state at scale.
    val emb = graft.sources.Sources.table(spark, dir, "embeddings")
    val assigned = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"),
      (col("vec_id") % 4).as("cell"))
    val plan = graft.operators.Similarity.cellDimMeans(assigned)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("collect_list") && !s.contains("ObjectHashAggregate"), s)
    assert(s.contains("HashAggregate"), s)
    assert(fallbacksIn(plan).isEmpty, s"fallbacks: ${fallbacksIn(plan)}")
  }

  test("driver contract: every query has an oracle and vice versa") {
    // a query without an oracle silently downgrades to a rows-only
    // check; an oracle without a query is dead weight that masks typos
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"mismatch: only-queries=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet} " +
        s"only-oracles=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("q23 predicate reaches the parquet scan (PushedFilters)") {
    val plan = executed("q23_group_agg").toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"), plan)
  }

  test("q100 predicate and projection reach the ORC scan") {
    // the round-tripped ORC table must keep parquet-grade scan
    // hygiene: n_chars >= 200 pushed into the reader, projection
    // pruned to the 3 referenced columns (doc_id/source never read)
    val plan = executed("q100_orc_interchange").toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"), plan)
    assert(!plan.contains("doc_id"), plan)
  }

  test("q24 joins both dimension tables via broadcast") {
    val plan = executed("q24_join_agg").toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("q66 salted join: salt replication in plan, join shuffled, never broadcast") {
    // if the optimizer broadcast the replicated side, the salting
    // would be dead code — a broadcast join has no reducer-side skew
    val plan = executed("q66_salted_join").toString
    assert(plan.contains("Generate") && plan.contains("explode"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("no query plans a cartesian or UNINTENDED nested-loop join") {
    // BNL is legitimate exactly where a bounded side is broadcast on
    // purpose: the kNN/IVF scoring passes fan a BOUNDED query/probe
    // set across the corpus (SCALE.md documents why that's the right
    // plan there). Anywhere else it means a join degenerated.
    // q90's candidate pass broadcasts the bounded quantized-query set
    // (and its re-rank broadcasts ≤ k·rerank candidate ids) — the q19
    // shape over int8 codes. q130/q131/q132 attach a SINGLE-ROW global
    // aggregate (corpus token total / both keys' min-max frame) via
    // crossJoin(broadcast(...)): Spark plans any 1-row cross join as
    // IdentityBroadcastMode BNL, which is a per-row constant lookup,
    // not a degenerated join.
    val boundedBroadcastOk = Set("q19_knn_brute", "q31_ivf_topk", "q90_sq8_ann",
      "q130_lm_bigram_backoff", "q131_zorder_zonemaps", "q132_zorder_prune",
      "q133_curation_pipeline",
      // q135/q137/q165 attach the same 1-row corpus-total frame as
      // q130; q140 the same 1-row min-max frame as q131
      "q135_lm_trigram_backoff", "q137_curation_pipeline_n3",
      "q165_curation_pipeline_n5",
      "q140_zorder3_zonemaps",
      // q143's lexical channel and q145's exact arm fan the BOUNDED
      // broadcast query set across one corpus scan — the judged q19
      // shape (their other arms join hash keys: bucket/fusion);
      // q164's lexical arm is a posting HASH join (that's its point —
      // RetrievalFusionSpec pins it), only its dense channel keeps
      // the q19 fan
      "q143_hybrid_rrf", "q145_ann_recall", "q164_hybrid_postings",
      // q152/q154/q155 join the encoded corpus (on-the-fly, residual,
      // or stored codes) to the BOUNDED broadcast probe/LUT frame on
      // array_contains(probed, cell) — a non-equi predicate by design
      // (nprobe cells per query), same q19 shape; q153 embeds the
      // q152 pass as its candidate generator
      "q152_ivfpq_topk", "q153_ivfpq_rerank", "q154_ivfpq_residual",
      "q155_ivfpq_indexed",
      // q157/q159 are q155's stored-code probe over a grown /
      // compacted segment set — the same bounded array_contains
      // broadcast; q158's shortlist and re-rank arms broadcast the
      // bounded query / candidate frames (the q19/q145 shape)
      "q157_ivfpq_append", "q158_rp_recall", "q159_ivfpq_compact",
      // q160 scores through the q130 LM kernel, inheriting its 1-row
      // corpus-total broadcast frame
      "q160_ccnet_buckets",
      // q175 attaches two 1-row frames (the corpus-average baseline
      // and the weight normalizer) via crossJoin(broadcast(...)) —
      // the q130/q131 single-row constant-lookup shape
      "q175_domain_reweight")
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val plan = executed(name).toString
      assert(!plan.contains("CartesianProduct"), s"$name planned a cartesian join")
      if (!boundedBroadcastOk(name))
        assert(!plan.contains("BroadcastNestedLoop"), s"$name planned a nested loop")
    }
  }

  test("q18 hamming search joins on pigeonhole posting keys, not block-only pairs") {
    // the blocked SimHash form must candidate-generate through the
    // multi-index posting join — its equi-join keys carry the segment
    // index/value, so a block's cost is sum(bucket^2) within it, never
    // block^2 (the sum-of-block-squares expansion VERDICT r5 flagged)
    // (string form: AQE wraps the tree, hiding join nodes from collect)
    val joinLines = executed("q18_simhash").toString.linesIterator
      .filter(_.contains("Join")).toSeq
    assert(joinLines.exists(l => l.contains("seg#") && l.contains("sv#")),
      s"q18 candidate join lost its pigeonhole keys; joins=[${joinLines.mkString("; ")}]")
  }
}
