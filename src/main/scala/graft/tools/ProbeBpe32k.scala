package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Measured 32k-merge BPE proof (round-11 verdict item 4): X108's
 *  kernel is merge-count-independent BY DESIGN — per-token cost is
 *  O(len · maxPatternLen) substring probes of a broadcast rank
 *  table — and the driver fold trains in O(1) Spark jobs at any
 *  merge count. This probe turns both claims into numbers on the
 *  documents corpus: train a production-scale vocabulary (up to 32k
 *  merges — the corpus's pair stock bounds what is achievable) and
 *  time ENCODE at vocabulary prefixes spanning 16 → full, reporting
 *  tokens/sec and maxPatternLen so the substring-probe bound is
 *  confirmed, not assumed. One JSON line per row — the artifact
 *  PLANS/SCALE cite. Usage:
 *    SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProbeBpe32k'
 */
object ProbeBpe32k {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val target = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "32768").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val natural = graft.sources.Sources.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true) // timing excludes the source read
    // 1) the NATURAL corpus, honestly: its synthetic word vocabulary
    // is tiny, so the pair stock exhausts far below 32k — the row
    // records where (training stops cleanly, X108's exhaustion
    // contract)
    val t0 = System.nanoTime()
    val natMerges = Bpe.train(natural, "text", target)
    println(s"""{"probe":"bpe_train_natural","requested":$target,""" +
      s""""achieved":${natMerges.size},""" +
      s""""train_sec":${(System.nanoTime() - t0) / 1e9},"sf":"$sfDir"}""")
    // 2) the 32k-merge measurement needs a corpus whose type
    // vocabulary can SUSTAIN 32k merges: map every token to one of
    // 997 deterministic pseudoword variants (base-36 of h60(token,
    // doc-position class) ≈ 12 chars — a 100k+-type vocabulary with
    // natural-language-like skew from the token distribution).
    // Deterministic, derived from the documents corpus, and exactly
    // the regime a web-scale tokenizer trains in.
    val docs = natural.select(col("doc_id"),
        concat_ws(" ", transform(
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"),
          (t, i) => lower(conv(graft.functions.Hashing.h60(
            concat(t, lit("#"),
              ((col("doc_id") + i) % 997).cast("string"))).cast("string"),
            10, 36)))).as("text"))
      .localCheckpoint(true)
    val t1 = System.nanoTime()
    val merges = Bpe.train(docs, "text", target)
    val trainSec = (System.nanoTime() - t1) / 1e9
    println(s"""{"probe":"bpe_train_enriched","requested":$target,""" +
      s""""achieved":${merges.size},"train_sec":$trainSec,"sf":"$sfDir"}""")
    for (m <- Seq(16, 1200, 8192, merges.size).distinct.filter(_ <= merges.size)) {
      val sub = merges.take(m)
      val maxPat = sub.map { case (l, r) => l.length + r.length }.max
      // warmup (codegen compile for this literal table), then timed
      val frame = Bpe.encode(docs, "text", "doc_id", sub)
      frame.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      frame.write.format("noop").mode("overwrite").save()
      val encSec = (System.nanoTime() - t2) / 1e9
      val toks = Bpe.encode(docs, "text", "doc_id", sub)
        .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
      println(s"""{"probe":"bpe_encode","merges":$m,"max_pattern_len":$maxPat,""" +
        s""""encode_sec":$encSec,"tokens":$toks,""" +
        s""""tokens_per_sec":${(toks / encSec).toLong},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
