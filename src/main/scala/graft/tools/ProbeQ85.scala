package graft.tools
import org.apache.spark.sql.functions._

/** Dev probe: does the q85 certificate resolve labels at a given SF,
 *  and what is the candidate-join mass? Prints resolved/unresolved
 *  label counts from prunedPairPhase at the q85 parameters. */
object ProbeQ85 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.core.GraftSession.builder("local[32]", 256).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Sources.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val twins = e.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      expr("transform(embedding, x -> " +
        "cast(cast(x as double) * 1.0009765625d as float))").as("embedding"),
      col("label"))
    val t0 = System.nanoTime()
    val (resolved, unresolved) = graft.operators.Similarity
      .prunedPairPhase(e.union(twins), 64, 3, 5, 0.98)
    val nRes = resolved.count()
    println(f"PROBE dir=$dir resolved=$nRes unresolved=${unresolved.size} " +
      f"phase=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
