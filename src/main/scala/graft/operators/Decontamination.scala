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

  /** Approximate contamination screen for eval suites too big to
   *  broadcast as an exact hash set: benchmark shingles aggregate
   *  into a BLOOM FILTER on the executors
   *  ([[graft.functions.BloomFunctions]] — mergeable partials, one
   *  pass), sized from the measured distinct-shingle count at `fpp`;
   *  the corpus then filters its exploded shingles through the
   *  codegen'd `might_contain` predicate — NO join at all, just a
   *  narrow filter between the scan and the per-doc hit count.
   *
   *  Direction of error is the SAFE one for decontamination: false
   *  positives flag (and drop) a few extra clean docs — a
   *  contaminated document can never slip through, because Bloom
   *  filters have no false negatives. Size `fpp` for the PER-DOCUMENT
   *  error: every shingle of every doc probes the filter, so a doc
   *  with s shingles is falsely flagged with ≈ s·fpp — the 1e-4
   *  default keeps that under 1% for 100-shingle docs at ~2.4
   *  bytes/shingle (vs 8 exact). Spark's `BloomFilterAggregate`
   *  silently clamps its size arguments to the session's
   *  runtime-filter limits (`maxNumBits` default 64 Mbit ≈ 3.3 M
   *  items at 1e-4), so this method RAISES those two confs to cover
   *  the computed size for the duration of the build (restored
   *  after) — without that, eval suites past a few million distinct
   *  shingles would silently run at a far worse effective fpp and
   *  drop a large fraction of clean docs. Returns a SUPERSET of
   *  [[contaminated]] (ids + approximate hit counts). */
  def contaminatedBloom(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int, fpp: Double = 1e-4): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp in (0,1): $fpp")
    val bh = benchmark
      .select(explode(HashExpressions.shingleHashes(col(textCol), k)).as("h"))
      .distinct()
    val n = math.max(bh.count(), 1L)
    // optimal bits for n items at fpp: -n·ln(fpp)/ln²2
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate clamps numBits/numItems to these session
    // confs (Math.min in the constructor) — raise them so the
    // requested size is actually honored, then restore.
    val conf = corpus.sparkSession.conf
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    // session-global confs: builds are serialized under a process-
    // local lock so one build's restore can never re-clamp a
    // concurrent build mid-plan or capture its raised value as
    // "previous" (concurrent OTHER-thread queries only ever see
    // RAISED limits during the window — the safe direction)
    val bf = Decontamination.bloomConfLock.synchronized {
      val (prevBits, prevItems) = (conf.get(bitsKey), conf.get(itemsKey))
      try {
        if (prevBits.toLong < numBits) conf.set(bitsKey, numBits.toString)
        if (prevItems.toLong < n) conf.set(itemsKey, n.toString)
        bh.agg(graft.functions.BloomFunctions
          .bloomAgg(col("h"), n, numBits).as("bf")).head.getAs[Array[Byte]](0)
      } finally { conf.set(bitsKey, prevBits); conf.set(itemsKey, prevItems) }
    }
    corpus
      .select(col(idCol), explode(HashExpressions.shingleHashes(col(textCol), k)).as("h"))
      .filter(graft.functions.BloomFunctions.mightContain(bf, col("h")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Corpus minus every might-be-contaminated document. Guaranteed
   *  `⊆ clean(...)`: only false POSITIVES exist, so this never keeps
   *  a document the exact path would drop. */
  def cleanBloom(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int, fpp: Double = 1e-4): DataFrame =
    corpus.join(contaminatedBloom(corpus, benchmark, textCol, idCol, k, fpp)
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

  private val bloomConfLock = new Object
}
