package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Spec coverage for the two r7 closing-block operators that shipped
 *  oracle-only: SemDeDup survivor apply (X69/q97) and gzipped-JSONL
 *  interchange (X71/q99). */
class SemDedupJsonlSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** The q91/q97 fixture: each vector plus a perturbed near-twin. */
  private lazy val twinned = emb.unionByName(emb.select(
    (col("vec_id") + 1000000L).as("vec_id"),
    expr("transform(embedding, (x, i) -> " +
      "cast(cast(x as double) * (case when i = cast(vec_id % 64 as int) " +
      "then 2.0D else 1.0D end) as float))").as("embedding"),
    col("label")))

  test("semanticDedupSurvivors equals the brute-force dominated-set rule") {
    val out = Similarity.semanticDedupSurvivors(twinned, 64, 0.999, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // brute force: drop every vector with a smaller-id >= tau neighbor
    val e = twinned.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorExpressions.dot(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    val dominated = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorExpressions.dot(col("va"), col("vb"))
        / (col("na") * col("nb")) >= 0.999)
      .select(col("id_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = twinned.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .filterNot(t => dominated.contains(t._1)).toSet
    assert(dominated.nonEmpty, "fixture produced no dominated vectors")
    assert(out == expect)
    // the rule keeps originals and drops their higher-id twins
    assert(dominated.forall(_ >= 1000000L))
  }

  test("blocked SemDeDup: superset of exact survivors, partition-invariant, high recall") {
    val exact = Similarity.semanticDedupSurvivors(twinned, 64, 0.999, 5)
      .collect().map(_.getLong(0)).toSet
    val blocked = Similarity.semanticDedupBlocked(twinned, 0.999, 2)
      .collect().map(_.getLong(0)).toSet
    // blocking can only MISS dominations (cross-cluster pairs), so the
    // blocked survivor set contains every exact survivor
    assert(exact.subsetOf(blocked),
      s"exact-only survivors leaked: ${(exact -- blocked).take(5)}")
    // recall sanity on the twinned fixture: twins sit ~cosine 0.94-0.9999
    // from their originals, so the clusters catch nearly all of the
    // tau-dominated twins
    val exactDropped = twinned.count() - exact.size
    val blockedDropped = twinned.count() - blocked.size
    assert(exactDropped > 0, "fixture produced no dominated vectors")
    assert(blockedDropped.toDouble / exactDropped >= 0.9,
      s"blocked recall too low: $blockedDropped of $exactDropped")
    val repart = Similarity.semanticDedupBlocked(twinned.repartition(13), 0.999, 2)
      .collect().map(_.getLong(0)).toSet
    assert(repart == blocked, "result must not depend on input partitioning")
  }

  test("jsonl.gz round-trip is byte-faithful through JSON escaping") {
    val gnarly = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and backslash \\ and tab\there"),
      (3L, "newline\ninside"),
      (4L, "unicode café — dash  control"),
      (5L, "")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec_")
      .toString
    gnarly.write.mode("overwrite").option("compression", "gzip").json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.exceptAll(gnarly).isEmpty && gnarly.exceptAll(back).isEmpty)
    // shards really are gzip members
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty, "no gzip shards written")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("explicit-schema jsonl read neither infers nor carries corrupt-record") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec2_")
      .toString
    Seq((1L, "a")).toDF("id", "t").write.mode("overwrite").json(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.StringType)))
    val plan = spark.read.schema(schema).json(dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,t:string>"), plan)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
