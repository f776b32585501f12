package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, Hashing, TextFunctions}

/**
 * Benchmark decontamination — the training-data step that removes
 * corpus documents overlapping an evaluation set, so benchmark
 * answers don't leak into training. Membership is word-k-shingle
 * overlap (the standard n-gram decontamination criterion), computed
 * on h60 hashes via the fused [[graft.functions.ShingleHashes]]
 * kernel.
 *
 * Scale posture: the BENCHMARK side is small by construction (eval
 * sets are thousands of docs, the corpus is billions) — its distinct
 * shingle-hash set is broadcast, so the corpus is scanned ONCE with
 * no corpus-side shuffle before the per-doc hit count. 8 bytes per
 * benchmark shingle ⇒ even a million-shingle eval suite broadcasts
 * in single-digit MB.
 */
object Decontamination {

  /** (idCol, n_hits): corpus docs sharing ≥1 word-k-shingle with any
   *  benchmark doc, with the count of distinct overlapping shingles.
   *  Docs with no overlap are absent (clean). */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame = {
    val bh = benchmark
      .select(explode(HashExpressions.shingleHashes(col(textCol), k)).as("h"))
      .distinct()
    corpus
      .select(col(idCol), explode(HashExpressions.shingleHashes(col(textCol), k)).as("h"))
      .join(broadcast(bh), "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus minus every contaminated document (one anti join). */
  def clean(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame =
    corpus.join(contaminated(corpus, benchmark, textCol, idCol, k)
      .select(col(idCol)), Seq(idCol), "left_anti")

  /** DuckDB oracle for [[contaminated]] over two predicates of one
   *  table (same h60 shingle space). */
  def contaminatedSql(table: String, textCol: String, idCol: String,
      k: Int, corpusPred: String, benchPred: String): String = {
    val sh = TextFunctions.wordShinglesSql(TextFunctions.lowerTokensSql(textCol), k)
    val h = Hashing.h60Sql("sh")
    s"""WITH bh AS (SELECT DISTINCT $h AS h FROM
       |  (SELECT unnest($sh) AS sh FROM $table WHERE $benchPred)),
       |ch AS (SELECT $idCol, $h AS h FROM
       |  (SELECT $idCol, unnest($sh) AS sh FROM $table WHERE $corpusPred))
       |SELECT $idCol, count(*) AS n_hits
       |FROM (SELECT DISTINCT $idCol, h FROM ch) JOIN bh USING (h)
       |GROUP BY $idCol""".stripMargin
  }
}
