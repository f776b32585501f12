package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev probe (cited by SCALE.md): candidate mass of the q91
 *  exact-pair workload at a given SF dir — Σ occ_a·occ_b over the
 *  ±1-probe key join, computed from per-key occupancies without
 *  materializing a single pair row. Measured r7: 166 k (sf0.1) →
 *  36.2 M (sf1) → 21.6 B (sf10) — the ScaleUp replica jitter makes
 *  the corpus clustered at the τ=0.999 cell scale, so the EXACT pair
 *  list is out of its documented tight-threshold regime at 100×. */
object ProbeQ91 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.core.GraftSession.builder("local[32]", 256).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Sources.table(spark, dir, "embeddings")
    val bumped = base.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> " +
        "cast(cast(x as double) * (case when i = cast(vec_id % 64 as int) " +
        "then 2.0D else 1.0D end) as float))").as("embedding"),
      col("label"))
    val emb = base.unionByName(bumped)
    val (_, a, b) = Similarity.pairProbeFrames(emb, 64, 0.999, 5)
    val occA = a.groupBy("ck").agg(count(lit(1)).as("na"))
    val occB = b.groupBy("ck").agg(count(lit(1)).as("nb"))
    val mass = occA.join(occB, Seq("ck"))
      .agg(sum(col("na") * col("nb"))).first().getLong(0)
    println(s"PROBE n=${emb.count()} candidateMass=$mass")
    spark.stop()
  }
}
