package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: replicate a driver testdata dir N× into
 *  a scratch dir, for MEASURING how every query's wall-clock scales
 *  (SCALE.md) — correctness still runs only on driver-generated data.
 *
 *  Replication is workload-honest, not naive row copying:
 *   - key offsets are multiples of 2 520 000 (divisible by every
 *     modulus the query set filters on: %2 %5 %7 %10 …), so each
 *     replica contributes the same proportion to every modular
 *     predicate and join fan-outs stay uniform;
 *   - FK families (orderkey, custkey, partkey, suppkey) shift
 *     together, so joins match within a replica exactly as in the
 *     original — dimension tables (region, nation) stay unreplicated
 *     like real dims at scale;
 *   - document TEXT is perturbed per replica (a replica token spliced
 *     after every 3rd word), so shingle/minhash/simhash near-dup
 *     GROUPS stay within-replica: dup counts scale ~linearly instead
 *     of forming cross-replica cliques whose pair output would grow
 *     quadratically by construction;
 *   - embeddings get per-replica deterministic jitter, so "nearest"
 *     pairs are not exact-zero-distance replica artifacts.
 *
 *  Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <replicas> */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, dst, reps) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val O = 2520000L // lcm(1..9)=2520 times 1000: clears every id range
    def shift(c: String, r: Int): org.apache.spark.sql.Column =
      col(c) + lit(r * O)

    def rep(name: String, parts: Int)(f: (DataFrame, Int) => DataFrame): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      (0 until reps).map(r => f(df, r)).reduce(_ unionAll _)
        .coalesce(parts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$reps done")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet").coalesce(1)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name copied (dim)")
    }

    copy("region"); copy("nation")
    rep("customer", 4)((d, r) => d.withColumn("c_custkey", shift("c_custkey", r)))
    rep("supplier", 2)((d, r) => d.withColumn("s_suppkey", shift("s_suppkey", r)))
    rep("part", 4)((d, r) => d.withColumn("p_partkey", shift("p_partkey", r)))
    rep("orders", 8)((d, r) => d
      .withColumn("o_orderkey", shift("o_orderkey", r))
      .withColumn("o_custkey", shift("o_custkey", r)))
    rep("lineitem", 16)((d, r) => d
      .withColumn("l_orderkey", shift("l_orderkey", r))
      .withColumn("l_partkey", shift("l_partkey", r))
      .withColumn("l_suppkey", shift("l_suppkey", r)))
    // events: ids shift, event TIME does not — scaling = more traffic
    // over the same span (denser windows), the realistic growth mode
    rep("events", 8)((d, r) => d
      .withColumn("event_id", shift("event_id", r))
      .withColumn("user_id", shift("user_id", r)))
    // multi-part is fine for the streaming rows: AvailableNow without
    // maxFilesPerTrigger drains ALL listed files as one micro-batch —
    // but a SINGLE part would serialize every doc-heavy query on one
    // core (parquet splits by file first)
    // splice a DOC-KEYED replica token every 3 words: a shared
    // constant token would put ~25% common token mass into every
    // replica-r doc, correlating their simhash/minhash signatures and
    // inflating near-dup candidate collisions by construction — the
    // perturbation must decorrelate docs, not correlate them
    rep("documents", 8)((d, r) => d
      .withColumn("doc_id", shift("doc_id", r))
      .withColumn("text",
        if (r == 0) col("text")
        else regexp_replace(col("text"), lit("(\\S+ \\S+ \\S+ )"),
          concat(lit(s"$$1z$r" + "w"), (col("doc_id") % 997).cast("string"),
            lit(" ")))))
    rep("embeddings", 4)((d, r) => d
      .withColumn("vec_id", shift("vec_id", r))
      .withColumn("embedding",
        if (r == 0) col("embedding")
        else expr(s"transform(embedding, (x, i) -> " +
          s"cast(x + ${0.05 * r} * sin(i * 1.7d + vec_id * 0.13d) as float))")))
    spark.stop()
  }
}
