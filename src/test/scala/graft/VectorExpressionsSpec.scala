package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Custom DotProduct expression: value parity with the HOF fold and
 *  codegen (not CodegenFallback) execution. */
class VectorExpressionsSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))

  test("dot == aggregate(zip_with(...)) fold, bit-for-bit") {
    val both = emb.select(
      VectorExpressions.dot(col("v"), col("v")).as("custom"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot participates in whole-stage codegen") {
    val plan = emb.select(VectorExpressions.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen
    // stage; the HOF `transform` projection, by contrast, stays
    // un-starred (CodegenFallback) in this very plan.
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*") && l.contains("dotproduct")), plan.take(400))
  }

  test("interpreted path (nullSafeEval) agrees with codegen path") {
    import spark.implicits._
    val d = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = d.select(VectorExpressions.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(r == 32.0)
    // null input → null out (BinaryExpression null propagation)
    val n = d.select(VectorExpressions.dot(lit(null).cast("array<double>"), col("b")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("TextStats fused quality score == regex formulation, per row, on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val both = docs.select(
      graft.functions.TextFunctions.qualityScoreFast(col("text")).as("fast"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("regex"))
      .collect()
    assert(both.length == 500)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("TextStats token/stop counts match split semantics on edge cases") {
    import spark.implicits._
    val cases = Seq("", "  ", "a", " a b ", "\ta b\t", "the a of", "x\n\ny the")
    val df = cases.toDF("t")
    val got = df.select(
      graft.functions.TextStats(col("t")).getField("n_tok").as("fused"),
      size(split(trim(lower(col("t"))), "\\s+")).cast("long").as("split"))
      .collect()
    got.zip(cases).foreach { case (r, c) =>
      assert(r.getLong(0) == r.getLong(1), s"case '$c': ${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }

  test("type mismatch is an analysis error") {
    import spark.implicits._
    val d = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      d.select(VectorExpressions.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dot_product expects"))
  }
}
