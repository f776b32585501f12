package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate

/** The bounded top-k aggregate must be row-for-row the window
 *  formulation it replaced (rank ≤ k over (sim DESC, n_id ASC)) while
 *  aggregating with O(k) state and map-side partials. */
class TopKAggregateSpec extends SparkTestBase {

  private def viaAgg(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy(col("q_id"))
      .agg(TopKAggregate.simTopK(col("sim"), col("n_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.n_id").as("n_id"), col("col.sim").as("sim"),
        (col("pos") + 1).cast("long").as("rank"))

  private def viaWindow(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")

  test("aggregate ≡ window on synthetic scores with heavy sim ties") {
    import spark.implicits._
    // deterministic scores with many exact ties (sim has 7 distinct
    // values per query) so the n_id ASC tie-break is actually exercised
    val scored = (0L until 2000L).map { i =>
      (i % 5, i, ((i * 37) % 7).toDouble / 7.0)
    }.toDF("q_id", "n_id", "sim").repartition(13)
    for (k <- Seq(1, 5, 64)) {
      val a = viaAgg(scored, k).orderBy("q_id", "rank").collect().toSeq
      val w = viaWindow(scored, k).orderBy("q_id", "rank").collect().toSeq
      assert(a == w, s"k=$k diverged")
    }
  }

  test("k larger than the group returns the whole group, ranked") {
    import spark.implicits._
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("q_id", "n_id", "sim")
    val rows = viaAgg(scored, 100).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(rows == Seq((11L, 1L), (10L, 2L)))
  }

  test("null sims are skipped, not ranked") {
    import spark.implicits._
    val scored = Seq((1L, 10L, Some(0.5)), (1L, 11L, None), (1L, 12L, Some(0.7)))
      .toDF("q_id", "n_id", "sim")
    val rows = viaAgg(scored, 10).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(rows == Seq(12L, 10L))
  }

  test("plan aggregates with map-side partials and no Window exchange") {
    import spark.implicits._
    val scored = (0L until 100L).map(i => (i % 3, i, i.toDouble))
      .toDF("q_id", "n_id", "sim")
    val plan = viaAgg(scored, 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // ObjectHashAggregate runs twice: partial before, final after the
    // exchange — the shuffle moves k-sized heaps, not scored rows
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_graft_sim_top_k"), plan)
  }
}
