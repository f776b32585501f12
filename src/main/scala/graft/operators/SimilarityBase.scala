package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared vector primitives of the similarity stack (round-13 split
 *  of the 3.1k-line Similarity.scala into base / kmeans / pq layers —
 *  VERDICT r12 housekeeping item; no behavior change, every member
 *  keeps its `Similarity.` path via the trait mixin):
 *  the codegen dot/norm kernels, the (v, nrm) prepared projection,
 *  their DuckDB twins, and the bounded per-query top-k fold. */
private[operators] trait SimilarityBase {
  /** Dot product — custom codegen'd expression (see
   *  [[graft.functions.VectorExpressions]]): ascending-index
   *  accumulation, bit-identical to the previous HOF fold and to the
   *  oracle's list_reduce, but inside whole-stage codegen instead of
   *  interpreted CodegenFallback. */
  protected def dotExpr(a: String, b: String): Column =
    graft.functions.VectorExpressions.dot(col(a), col(b))

  protected def normExpr(a: String): Column =
    sqrt(graft.functions.VectorExpressions.dot(col(a), col(a)))

  protected def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, length($a) + 1), " +
      s"i -> $a[i] * $b[i])), (acc, x) -> acc + x)"

  protected def normSql(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, length($a) + 1), " +
      s"i -> $a[i] * $a[i])), (acc, x) -> acc + x))"

  protected val toDoubleSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  /** (vec_id, label, v, nrm) projection with doubles + precomputed norm. */
  protected def prepared(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", normExpr("v"))

  protected def preparedSql(table: String): String =
    s"SELECT vec_id, label, v, ${normSql("v")} AS nrm FROM " +
      s"(SELECT vec_id, label, $toDoubleSql AS v FROM $table)"

  /** (q_id, n_id, sim) → the k best per q_id with rank — the
   *  aggregation twin of `row_number() OVER (PARTITION BY q_id ORDER
   *  BY sim DESC, n_id) <= k` (n_id unique ⇒ identical rows). */
  protected def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKAggregate.simTopK(col("sim"), col("n_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.n_id").as("n_id"), col("col.sim").as("sim"),
        (col("pos") + 1).cast("long").as("rank"))

}
