package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Host-pipeline plumbing the reference runs inside (SURVEY §2.2,
 * test.sh:12-43): fluent-bit tags each input instance (`-t sum`),
 * routes records to filter instances by tag match (`-m 'sum'`), chains
 * independent filter instances, and unions everything into shared
 * sinks (`-o stdout -m '*'`).
 *
 * Spark-native shape: a literal `tag` column per source, `filter` per
 * branch, `unionByName` for the shared sink. All operators here are
 * stateless/narrow and work unchanged on batch AND streaming frames —
 * which is exactly how the reference behaves (stateless per-record
 * transform, math.c:290-366).
 */
object Pipelines {

  /** `-t <tag>` (test.sh:17,24,30,36). */
  def tagged(df: DataFrame, tag: String): DataFrame =
    df.withColumn("tag", lit(tag))

  /** `-m '<tag>'` routing (test.sh:23,29,35,41). Tag match is exact
   *  string equality on the routing key — a metadata predicate, not a
   *  data predicate. */
  def route(df: DataFrame, tag: String): DataFrame =
    df.filter(col("tag") === lit(tag))

  /**
   * The full test.sh topology over ONE source: per (tag, op) branch,
   * tag the stream, apply the math filter, and union all branches for
   * the shared sink. Branch projections are narrow; the union is a
   * metadata-only operator — no shuffle is introduced at any scale.
   * `select(columns)` fixes a common output schema across branches.
   */
  def fanout(
      source: DataFrame,
      branches: Seq[(String, MathOp)],
      outputColumns: Seq[String]): DataFrame = {
    val outs = branches.map { case (tag, op) =>
      MathCompiler(tagged(source, tag), op)
        .select(outputColumns.map(c => col(s"`$c`")): _*)
    }
    outs.reduce(_ unionByName _)
  }

  /**
   * Single-scan fanout: same output multiset as [[fanout]] when every
   * branch writes the same output field, but the source is read ONCE —
   * each row explodes into one (tag, result) struct per branch instead
   * of the union re-scanning per branch. At 100 TB a 4-branch fanout
   * drops from 4 scans to 1; row-order within the result differs from
   * [[fanout]] (interleaved vs concatenated), so sort before comparing.
   */
  def fanoutFused(
      source: DataFrame,
      branches: Seq[(String, MathOp)],
      outputColumns: Seq[String]): DataFrame = {
    val outField = branches.head._2.outputField
    require(branches.forall(_._2.outputField == outField),
      "fused fanout requires a shared Output_field across branches")
    val perBranch = branches.map { case (tag, op) =>
      struct(lit(tag).as("tag"),
        MathCompiler.column(op, source.schema).as(outField))
    }
    source
      .withColumn("__branch", explode(array(perBranch: _*)))
      .withColumn("tag", col("__branch.tag"))
      .withColumn(outField, col(s"__branch.`$outField`"))
      .select(outputColumns.map(c => col(s"`$c`")): _*)
  }
}
