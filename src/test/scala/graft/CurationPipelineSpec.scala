package graft

import org.apache.spark.sql.functions._

/** X103 end-to-end curation pipeline: dedup removes the injected
 *  duplicates, both gates hold on every survivor, the composed plan
 *  equals the manual stage-by-stage composition, every stage does
 *  real work on the fixture, and shard assignment is in-range and
 *  populated. */
class CurationPipelineSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("q133_curation_pipeline")(spark, dir).collect()

  private lazy val stages = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val keep = graft.operators.Dedup.exactGroups(corpus, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val deduped = corpus.join(keep, Seq("doc_id"), "left_semi")
    val gated = deduped.select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.qualityScoreFast(col("text"))
          .as("quality"))
      .filter(col("quality") >= 0.61)
    (corpus, deduped, gated)
  }

  test("injected duplicates never survive the dedup stage") {
    assert(out.nonEmpty)
    // the injected copy carries id+10^6 and can never be the min id
    assert(out.forall(_.getLong(0) < 1000000L))
  }

  test("every survivor passed both gates") {
    assert(out.forall(_.getDouble(1) >= 0.61))
    assert(out.forall(_.getLong(3) >= 33000L))
  }

  test("composed plan equals the manual stage-by-stage composition") {
    val (_, _, gated) = stages
    val lm = graft.operators.Lm.bigramBackoffScore(gated, "doc_id", "text", 2)
    val expect = gated.join(lm, Seq("doc_id"))
      .filter(col("mean_score_micro") >= 33000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out.map(_.getLong(0)).toSeq === expect)
  }

  test("each stage does real work on the fixture") {
    val (corpus, deduped, gated) = stages
    val nCorpus = corpus.count()
    val nDeduped = deduped.count()
    val nGated = gated.count()
    assert(nCorpus > nDeduped, "dedup must drop the injected copies")
    assert(nDeduped > nGated, "the quality gate must reject some docs")
    assert(nGated > out.length.toLong, "the LM screen must reject some docs")
  }

  test("shards are in range and populated") {
    assert(out.forall(r => r.getLong(4) >= 0L && r.getLong(4) < 8L))
    assert(out.map(_.getLong(4)).distinct.length > 1)
  }
}
