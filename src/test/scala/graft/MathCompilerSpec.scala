package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._
import graft.sources.Sources

/** Execution semantics of the compiled Column vs the reference's hot
 *  loop (filter_math/math.c:146-265): operand resolution, IEEE-754
 *  folds, cast_to_int, withColumn replace divergence, map-payload
 *  mode — plus a randomized model test against MathOp.referenceEval. */
class MathCompilerSpec extends SparkTestBase {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, 10.0, 4.0),
      (2L, -7.5, 0.0),
      (3L, 0.0, 3.0)
    ).toDF("id", "a", "b")
  }

  private def out(op: MathOp, data: org.apache.spark.sql.DataFrame = df): Seq[Any] =
    MathCompiler(data, op).orderBy("id").select(op.outputField).collect().map(_.get(0)).toSeq

  test("sum/sub/mul fold left in operand order") {
    assert(out(MathOp("Operation" -> "sum", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o")) == Seq(14.0, -7.5, 3.0))
    assert(out(MathOp("Operation" -> "sub", "Field" -> "a", "Constant" -> "3",
      "Field" -> "b", "Output_field" -> "o")) == Seq(3.0, -10.5, -6.0))
    assert(out(MathOp("Operation" -> "mul", "Field" -> "a", "Constant" -> "2.7",
      "Output_field" -> "o")) == Seq(20.0, -15.0, 0.0)) // 2.7 truncates to 2
  }

  test("div by zero is IEEE: +Inf, -Inf, NaN (math.c:212-215, no guard)") {
    val o = out(MathOp("Operation" -> "div", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o"))
    assert(o(0) == 2.5)
    assert(o(1) == Double.NegativeInfinity) // -7.5 / 0.0
    assert(o(2) == 0.0) // 0.0 / 3.0
  }

  test("0/0 is NaN") {
    import spark.implicits._
    val d = Seq((1L, 0.0, 0.0)).toDF("id", "a", "b")
    val o = out(MathOp("Operation" -> "div", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o"), d)
    assert(o(0).asInstanceOf[Double].isNaN)
  }

  test("division by negative zero honors the sign") {
    import spark.implicits._
    val d = Seq((1L, 5.0, -0.0), (2L, -5.0, -0.0), (3L, 0.0, 0.0)).toDF("id", "a", "b")
    val o = out(MathOp("Operation" -> "div", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o"), d)
    assert(o(0) == Double.NegativeInfinity)
    assert(o(1) == Double.PositiveInfinity)
    assert(o(2).asInstanceOf[Double].isNaN) // 0/0
  }

  test("missing field resolves to 0.0, even as first operand (math.c:164)") {
    assert(out(MathOp("Operation" -> "sub", "Field" -> "nope", "Field" -> "a",
      "Output_field" -> "o")) == Seq(-10.0, 7.5, 0.0))
  }

  test("null numeric cell resolves to 0.0 (missing msgpack key analog)") {
    val d = spark.createDataFrame(
      java.util.List.of(Row(1L, java.lang.Double.valueOf(2.0)), Row(2L, null)),
      StructType(Seq(StructField("id", LongType), StructField("a", DoubleType))))
    assert(out(MathOp("Operation" -> "sum", "Field" -> "a", "Constant" -> "5",
      "Output_field" -> "o"), d) == Seq(7.0, 5.0))
  }

  test("case-insensitive field match; non-numeric column skipped for a numeric one (math.c:149-163)") {
    import spark.implicits._
    // Columns "A" (string, earlier) and "a" (double, later): the string
    // match is skipped and the scan continues — the double wins.
    val d = Seq((1L, "junk", 2.0)).toDF("id", "A", "a")
    assert(out(MathOp("Operation" -> "sum", "Field" -> "A", "Constant" -> "1",
      "Output_field" -> "o"), d) == Seq(3.0))
  }

  test("only-non-numeric match resolves to 0.0") {
    import spark.implicits._
    val d = Seq((1L, "junk")).toDF("id", "s")
    assert(out(MathOp("Operation" -> "sum", "Field" -> "s", "Constant" -> "4",
      "Output_field" -> "o"), d) == Seq(4.0))
  }

  test("cast_to_int truncates toward zero, negatives included (math.c:258-260)") {
    import spark.implicits._
    val d = Seq((1L, 7.9, 2.0), (2L, -7.9, 2.0)).toDF("id", "a", "b")
    assert(out(MathOp("Operation" -> "div", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o", "cast_to_int" -> "true"), d) == Seq(3L, -3L))
  }

  test("output field REPLACES an existing column (documented divergence from append, SURVEY O7)") {
    val r = MathCompiler(df, MathOp("Operation" -> "sum", "Field" -> "a",
      "Field" -> "b", "Output_field" -> "a"))
    assert(r.columns.count(_ == "a") == 1)
    assert(r.orderBy("id").select("a").collect().map(_.getDouble(0)).toSeq
      == Seq(14.0, -7.5, 3.0))
  }

  test("dotted field names are literal flat keys, not paths (math.c:149, SURVEY §1.1)") {
    val d = spark.createDataFrame(
      java.util.List.of(Row(1L, 4050908.0, 476.0)),
      StructType(Seq(StructField("id", LongType),
        StructField("Mem.total", DoubleType), StructField("Mem.used", DoubleType))))
    assert(out(MathOp("Operation" -> "sub", "Field" -> "Mem.total",
      "Field" -> "Mem.used", "Output_field" -> "o"), d) == Seq(4050432.0))
  }

  test("map-payload mode: case-insensitive key, non-numeric skipped, missing→0") {
    import spark.implicits._
    val d = Seq(
      (1L, """{"Mem.used": 476, "Mem.total": 4050908}"""),
      (2L, """{"mem.USED": 10}"""),
      (3L, """{"Mem.used": "junk", "other": 1}"""),
      (4L, """not json at all""")
    ).toDF("id", "json")
    val payload = Sources.jsonPayload(d, "json")
    val op = MathOp("Operation" -> "sum", "Field" -> "Mem.used",
      "Constant" -> "100", "Output_field" -> "o")
    val r = MathCompiler.applyToMap(payload, op, "payload")
      .orderBy("id").select("o").collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(576.0, 110.0, 100.0, 100.0))
  }

  test("variant-payload mode: exact key, dotted keys literal, malformed→0, missing→0") {
    import spark.implicits._
    val d = Seq(
      (1L, """{"Mem.used": 476, "Mem.total": 4050908}"""),
      (2L, """{"Mem.used": "junk"}"""),
      (3L, """not json at all""")
    ).toDF("id", "json")
    val payload = Sources.variantPayload(d, "json")
    val op = MathOp("Operation" -> "sum", "Field" -> "Mem.used",
      "Constant" -> "100", "Output_field" -> "o")
    val r = MathCompiler.applyToVariant(payload, op, "payload")
      .orderBy("id").select("o").collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(576.0, 100.0, 100.0))
  }

  test("payload modes on MIXED-CASE keys: map/json case-insensitive, variant exact, variant-CI opt-in matches") {
    import spark.implicits._
    // keys deliberately mis-cased vs the op's Field ("mem.USED");
    // row 4 has keys that COLLIDE after lowering — the CI ingest must
    // keep the LAST occurrence, not throw DUPLICATED_MAP_KEY
    val d = Seq(
      (1L, """{"MEM.Used": 476, "Mem.Total": 4050908}"""),
      (2L, """{"mem.used": 7}"""),
      (3L, """{"unrelated": 1}"""),
      (4L, """{"MEM.Used": 40, "mem.used": 2}""")
    ).toDF("id", "json")
    val op = MathOp("Operation" -> "sum", "Field" -> "mem.USED",
      "Constant" -> "100", "Output_field" -> "o")
    def outs(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.orderBy("id").select("o").collect().map(_.getDouble(0)).toSeq

    // map mode: reference-faithful case-insensitive FIRST-wins scan
    // (row 4: "MEM.Used" appears first → 40)
    val asMap = d.withColumn("payload",
      from_json(col("json"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.DoubleType)))
    assert(outs(MathCompiler.applyToMap(asMap, op, "payload"))
      == Seq(576.0, 107.0, 100.0, 140.0))
    // JSON byte-kernel mode: same case-insensitive first-wins semantics
    assert(outs(MathCompiler.applyToJson(d, op, "json"))
      == Seq(576.0, 107.0, 100.0, 140.0))
    // plain variant mode: exact-key — mis-cased keys MISS (documented)
    assert(outs(MathCompiler.applyToVariant(
        Sources.variantPayload(d, "json"), op, "payload"))
      == Seq(100.0, 100.0, 100.0, 100.0))
    // variant-CI opt-in: lowered keys at ingest + lowered query key
    // restore case-insensitive resolution; colliding keys keep the
    // LAST occurrence (documented divergence from first-wins: row 4
    // resolves 2, not 40)
    assert(outs(MathCompiler.applyToVariantCI(
        Sources.variantPayloadCI(d, "json"), op, "payload"))
      == Seq(576.0, 107.0, 100.0, 102.0))
  }

  test("randomized model test: engine ≡ referenceEval (math.c:167-195)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val fields = Vector("a", "b", "c", "missing")
    for (_ <- 1 to 60) {
      val opName = Seq("sum", "sub", "mul", "div")(rnd.nextInt(4))
      val nOps = 2 + rnd.nextInt(4)
      val props = Seq("Operation" -> opName) ++ (1 to nOps).map { _ =>
        if (rnd.nextBoolean()) "Field" -> fields(rnd.nextInt(fields.size))
        else "Constant" -> (1 + rnd.nextInt(9)).toString
      } ++ Seq("Output_field" -> "o")
      val op = MathOp(props: _*)

      val row = (rnd.nextDouble() * 20 - 10,
        if (rnd.nextInt(4) == 0) 0.0 else rnd.nextDouble() * 6 - 3,
        rnd.nextInt(10).toDouble)
      val d = Seq(row).toDF("a", "b", "c")
      val resolve: String => Double = {
        case "a" => row._1; case "b" => row._2; case "c" => row._3; case _ => 0.0
      }
      val expected = op.referenceEval(resolve)
      val got = MathCompiler(d, op).select("o").collect()(0).getDouble(0)
      assert(got == expected || (got.isNaN && expected.isNaN),
        s"props=$props row=$row got=$got expected=$expected")
    }
  }
}
