package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{MathCompiler, MathOp}
import graft.functions.{JsonExpressions, JsonOps}
import graft.sources.Sources

/** Semantics of the fused JSON-key scan kernel (JsonOps/JsonFirstNumeric)
 *  — the codegen replacement for from_json map-payload mode, pinned to
 *  the reference's operand resolution (filter_math/math.c:146-165):
 *  case-insensitive forward scan, first NUMERIC value wins, non-numeric
 *  matches are skipped and the scan continues, missing/malformed → 0.0. */
class JsonKernelSpec extends SparkTestBase {

  private def kernel(json: String, key: String): Option[Double] =
    Option(JsonOps.firstNumeric(
      UTF8String.fromString(json), UTF8String.fromString(key).toLowerCase))
      .map(_.doubleValue())

  test("extracts a top-level numeric value, case-insensitively") {
    assert(kernel("""{"k": 69}""", "k") == Some(69.0))
    assert(kernel("""{"Mem.used": 476, "Mem.total": 4050908}""", "mem.USED") == Some(476.0))
    assert(kernel("""  { "K" : -2.5e3 }  """, "k") == Some(-2500.0))
  }

  test("first numeric duplicate wins; non-numeric matches are skipped (math.c:149-163)") {
    // forward scan: first match numeric → taken
    assert(kernel("""{"k": 1, "k": 2}""", "k") == Some(1.0))
    // first match holds a string → scan CONTINUES, later duplicate wins
    assert(kernel("""{"k": "junk", "K": 5}""", "k") == Some(5.0))
    // only non-numeric matches → miss
    assert(kernel("""{"k": "junk", "k": true, "k": null, "k": [1], "k": {"k":2}}""", "k") == None)
  }

  test("nested keys never match (top-level scan only, like the map path)") {
    assert(kernel("""{"a": {"k": 5}, "b": [{"k": 6}, 7]}""", "k") == None)
    assert(kernel("""{"a": {"k": 5}, "k": 9}""", "k") == Some(9.0))
  }

  test("missing key, non-object, or malformed document → miss") {
    assert(kernel("""{"other": 1}""", "k") == None)
    assert(kernel("""not json at all""", "k") == None)
    assert(kernel("""[1, 2]""", "k") == None)
    assert(kernel("""42""", "k") == None)
    assert(kernel("""{"k": 5""", "k") == None)          // unterminated
    assert(kernel("""{"k": 5} trailing""", "k") == None) // trailing garbage
    assert(kernel("""{"k": 01}""", "k") == None)         // leading zero
    assert(kernel("""{"k": .5}""", "k") == None)         // bare fraction
    assert(kernel("""{"k": +5}""", "k") == None)         // leading plus
    assert(kernel("""{k: 5}""", "k") == None)            // unquoted key
    assert(kernel("", "k") == None)
  }

  test("malformedness after a match still voids the document (≡ from_json null map)") {
    assert(kernel("""{"k": 5, garbage""", "k") == None)
  }

  test("strict JSON number grammar, parsed correctly rounded") {
    assert(kernel("""{"k": 0}""", "k") == Some(0.0))
    assert(kernel("""{"k": -0.5}""", "k") == Some(-0.5))
    assert(kernel("""{"k": 1e-3}""", "k") == Some(0.001))
    assert(kernel("""{"k": 1E+2}""", "k") == Some(100.0))
    assert(kernel("""{"k": 1e309}""", "k") == Some(Double.PositiveInfinity))
    assert(kernel("""{"k": 9007199254740993}""", "k") == Some(9007199254740992.0))
  }

  test("escaped and unicode-escaped keys decode before comparison") {
    assert(kernel("""{"ak": 7}""", "ak") == Some(7.0))
    assert(kernel("""{"a\"b": 8}""", "a\"b") == Some(8.0))
    assert(kernel("""{"tab\tkey": 9}""", "TAB\tKEY") == Some(9.0))
    // escapes in VALUES (skipped path) must not confuse the scan
    assert(kernel("""{"s": "a\"}b", "k": 3}""", "k") == Some(3.0))
  }

  test("string values are never coerced (msgpack has no string numbers)") {
    // from_json would map "NaN"/"Infinity" special strings to doubles;
    // the reference's msgpack type check skips strings outright
    // (math.c:149-163) — the kernel is the faithful one. Documented
    // divergence from the from_json fallback path.
    assert(kernel("""{"k": "NaN"}""", "k") == None)
    assert(kernel("""{"k": "5"}""", "k") == None)
  }

  test("applyToJson ≡ applyToMap on numeric-valued documents") {
    import spark.implicits._
    val d = Seq(
      (1L, """{"Mem.used": 476, "Mem.total": 4050908}"""),
      (2L, """{"mem.USED": 10}"""),
      (3L, """{"other": 1}"""),
      (4L, """not json at all"""),
      (5L, """{}"""),
      (6L, """{"Mem.used": -2.5e-1}""")
    ).toDF("id", "json")
    val op = MathOp("Operation" -> "sum", "Field" -> "Mem.used",
      "Constant" -> "100", "Output_field" -> "o")
    val viaMap = MathCompiler.applyToMap(Sources.jsonPayload(d, "json"), op, "payload")
      .orderBy("id").select("o").collect().map(_.getDouble(0)).toSeq
    val viaJson = MathCompiler.applyToJson(d, op, "json")
      .orderBy("id").select("o").collect().map(_.getDouble(0)).toSeq
    assert(viaJson == viaMap)
    assert(viaJson == Seq(576.0, 110.0, 100.0, 100.0, 100.0, 99.75))
  }

  test("pathological nesting degrades to a miss, never a StackOverflowError") {
    // from_json (Jackson) caps depth at 1000 and degrades to a null
    // map → 0.0; the kernel must match that failure mode, not blow
    // the task's stack inside whole-stage codegen.
    val deep = "{\"k\": " + ("[" * 50000) + ("]" * 50000) + "}"
    assert(kernel(deep, "k") == None)
    // under the cap: structurally skipped fine
    val ok = "{\"a\": " + ("[" * 900) + "5" + ("]" * 900) + ", \"k\": 7}"
    assert(kernel(ok, "k") == Some(7.0))
  }

  test("invalid escapes are rejected in skipped strings too (≡ decoded path)") {
    // the skip path validates escapes, so a document from_json rejects
    // cannot sneak through just because the bad escape sits in a value
    assert(kernel("""{"s": "a\x", "k": 3}""", "k") == None)
    assert(kernel("{\"s\": \"a\\" + "u00ZZ\", \"k\": 3}", "k") == None)
    assert(kernel("""{"s": "aA", "k": 3}""", "k") == Some(3.0))
  }

  test("DOCUMENTED DIVERGENCE from the from_json map path on mixed-type docs") {
    // from_json's lenient Jackson conversion nulls the WHOLE map when
    // any value fails double conversion, so the map path yields 0.0
    // here; the kernel strict-parses per key and finds the later
    // numeric duplicate — the reference-faithful behavior
    // (math.c:149-163 continues the forward scan past non-numbers).
    import spark.implicits._
    val d = Seq((1L, """{"k": "junk", "K": 5}""")).toDF("id", "json")
    val op = MathOp("Operation" -> "sum", "Field" -> "k",
      "Constant" -> "100", "Output_field" -> "o")
    val viaMap = MathCompiler.applyToMap(Sources.jsonPayload(d, "json"), op, "payload")
      .select("o").collect().head.getDouble(0)
    val viaJson = MathCompiler.applyToJson(d, op, "json")
      .select("o").collect().head.getDouble(0)
    assert(viaMap == 100.0)  // Jackson: "junk" kills the map → k = 0.0
    assert(viaJson == 105.0) // kernel: skip, continue, take the 5
  }

  test("kernel column runs inside whole-stage codegen (no fallback)") {
    import spark.implicits._
    val d = Seq((1L, """{"k": 5}""")).toDF("id", "json")
    val df = d.select(JsonExpressions.jsonFirstNumeric(col("json"), "k").as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Fallback"), s"unexpected codegen fallback:\n$plan")
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(5.0))
  }
}
