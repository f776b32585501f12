package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{MathCompiler, MathOp}
import graft.sources.Sources

/** Ingestion-surface spec: permissive malformed-record tolerance
 *  (reference O9) and operand resolution across every numeric type
 *  the reference coerces (SURVEY §1.2). */
class SourcesSpec extends SparkTestBase {

  test("permissive json: malformed records survive as _corrupt rows; math still applies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_").toFile
    val f = new java.io.File(dir, "data.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"a": 1.5, "b": 2}
        |this is not json
        |{"a": 10, "b": 0}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("a", DoubleType), StructField("b", DoubleType)))
    val df = Sources.permissiveJson(spark, f.getAbsolutePath, schema)
    val rows = df.collect() // full-row read: querying ONLY the corrupt
    // column from raw files is disallowed (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    assert(rows.length == 3) // nothing dropped, nothing thrown
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("_corrupt"))) == 1)
    // math over the frame: corrupt row's fields are null → operand 0.0
    val out = MathCompiler(df, MathOp("Operation" -> "sum", "Field" -> "a",
      "Field" -> "b", "Output_field" -> "o"))
      .select("o").collect().map(_.getDouble(0)).sorted.toSeq
    assert(out == Seq(0.0, 3.5, 10.0))
  }

  test("permissive csv: bad row kept, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_").toFile
    val f = new java.io.File(dir, "data.csv")
    java.nio.file.Files.writeString(f.toPath,
      "a,b\n1.5,2\nnot_a_number,xyz\n3,4\n")
    val schema = StructType(Seq(
      StructField("a", DoubleType), StructField("b", DoubleType)))
    val df = Sources.permissiveCsv(spark, f.getAbsolutePath, schema)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("_corrupt"))) == 1)
  }

  test("partitioned sink: reads prune partitions (filter never scans other dirs)") {
    import graft.sources.Sinks
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    Sinks.write(docs, dir, partitionCols = Seq("lang"))
    val back = Sinks.read(spark, dir).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in:\n$plan")
    assert(back.count() ==
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count())
  }

  test("orc round-trip preserves every row and schema") {
    import graft.sources.Sinks
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    Sinks.write(docs, dir, format = "orc")
    val back = Sinks.read(spark, dir, format = "orc")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("doc_id").select("doc_id", "text").collect().toSeq ==
      docs.orderBy("doc_id").select("doc_id", "text").collect().toSeq)
  }

  test("xml round-trip preserves rows (Spark 4 built-in XML source)") {
    import graft.sources.Sinks
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars") // flat scalars: xml-safe
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_").toString
    Sinks.write(docs, dir, format = "xml", options = Map("rowTag" -> "doc"))
    val back = Sinks.read(spark, dir, format = "xml",
      options = Map("rowTag" -> "doc"))
    assert(back.count() == docs.count())
    assert(back.orderBy("doc_id").select("doc_id", "lang", "n_chars")
      .collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("operand resolution coerces every numeric type (SURVEY §1.2)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("f32", FloatType), StructField("f64", DoubleType),
      StructField("dec", DecimalType(10, 2)),
      StructField("s", StringType)))
    val row = org.apache.spark.sql.Row(1L, 1.toByte, 2.toShort, 3, 4L,
      1.5f, 2.5, new java.math.BigDecimal("10.25"), "junk")
    val df = spark.createDataFrame(java.util.List.of(row), schema)
    def v(field: String): Double =
      MathCompiler(df, MathOp("Operation" -> "sum", "Field" -> field,
        "Constant" -> "100", "Output_field" -> "o"))
        .select("o").collect()(0).getDouble(0)
    assert(v("i8") == 101.0); assert(v("i16") == 102.0)
    assert(v("i32") == 103.0); assert(v("i64") == 104.0)
    assert(v("f32") == 101.5); assert(v("f64") == 102.5)
    assert(v("dec") == 110.25)
    assert(v("s") == 100.0) // string column: non-numeric → 0.0
  }
}
