package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Config-parsing parity with the reference's configure()
 *  (filter_math/math.c:37-132) — every quirk SURVEY §1.3 records. */
class MathOpSpec extends AnyFunSuite {

  private def ok(props: (String, String)*): MathOp =
    MathOp.fromProperties(props).fold(e => fail(e.message), identity)
  private def err(props: (String, String)*): String =
    MathOp.fromProperties(props).fold(_.message, op => fail(s"parsed: $op"))

  test("operation matches case-insensitively on first 3 chars (math.c:56)") {
    assert(ok("Operation" -> "SUMMARY", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o").operation == Operation.Sum)
    assert(ok("Operation" -> "subtract", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o").operation == Operation.Sub)
    assert(ok("Operation" -> "division", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o").operation == Operation.Div)
    assert(ok("Operation" -> "MuLtIpLy", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o").operation == Operation.Mul)
  }

  test("operation shorter than 3 chars never matches (C hits the NUL)") {
    assert(err("Operation" -> "su", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o").contains("invalid value"))
  }

  test("a later invalid Operation is ignored once a valid one was set (math.c:61-66)") {
    val op = ok("Operation" -> "mul", "Operation" -> "garbage",
      "Field" -> "a", "Field" -> "b", "Output_field" -> "o")
    assert(op.operation == Operation.Mul)
  }

  test("last valid Operation wins") {
    val op = ok("Operation" -> "sum", "Operation" -> "div",
      "Field" -> "a", "Field" -> "b", "Output_field" -> "o")
    assert(op.operation == Operation.Div)
  }

  test("property keys are case-insensitive; unknown keys are a hard error (math.c:108-111)") {
    assert(ok("OPERATION" -> "sum", "FIELD" -> "a", "field" -> "b",
      "OUTPUT_FIELD" -> "o").outputField == "o")
    // the offending key is echoed VERBATIM, not lowercased
    assert(err("Operation" -> "sum", "Field" -> "a", "Field" -> "b",
      "Output_field" -> "o", "Bogus" -> "x").contains("'Bogus'"))
  }

  test("constants truncate toward zero at parse time (math.h:61)") {
    assert(MathOp.parseConstant("2.7") == 2)
    assert(MathOp.parseConstant("-2.7") == -2)
    assert(MathOp.parseConstant("10") == 10)
    assert(MathOp.parseConstant("3e2") == 300)
    assert(MathOp.parseConstant("2.7abc") == 2) // strtod prefix parse
    assert(MathOp.parseConstant("abc") == 0)
  }

  test("strtod also accepts hex and inf/nan forms (C99 7.20.1.3)") {
    assert(MathOp.parseConstant("0x1A") == 26)
    assert(MathOp.parseConstant("-0X1a") == -26)
    assert(MathOp.parseConstant("0x1p4") == 16) // binary exponent
    assert(MathOp.parseConstant("0x1.8p1") == 3) // hex fraction: 1.5 * 2
    assert(MathOp.parseConstant("0x1pz") == 1) // trailing 'p' backs off
    assert(MathOp.parseConstant("0x") == 0) // bare prefix → "0"
    assert(MathOp.parseConstant("0xZZ") == 0)
    // inf saturates (C UB; documented JVM-saturation divergence)
    assert(MathOp.parseConstant("inf") == Int.MaxValue)
    assert(MathOp.parseConstant("-Infinity") == Int.MinValue)
    // nan truncates to 0 → rejected downstream as a zero constant
    assert(MathOp.parseConstant("nan") == 0)
  }

  test("hex constant is accepted as non-zero where decimal-only parsing rejected it") {
    assert(ok("Operation" -> "sum", "Field" -> "a", "Constant" -> "0x1A",
      "Output_field" -> "o").operands.contains(Const(26)))
  }

  test("constant truncating to zero is rejected (math.c:100-104)") {
    assert(err("Operation" -> "sum", "Field" -> "a", "Constant" -> "0.5",
      "Output_field" -> "o").contains("different than 0"))
  }

  test("operands keep config order in one mixed list (math.c:87,105)") {
    val op = ok("Operation" -> "sub", "Field" -> "a", "Constant" -> "3",
      "Field" -> "b", "Output_field" -> "o")
    assert(op.operands == Seq(FieldRef("a"), Const(3), FieldRef("b")))
  }

  test("validation order: output_field, then operation, then >=2 operands (math.c:114-129)") {
    assert(err("Operation" -> "sum", "Field" -> "a", "Field" -> "b")
      .contains("Output_field"))
    assert(err("Field" -> "a", "Field" -> "b", "Output_field" -> "o")
      .contains("sum, sub, mul or div"))
    assert(err("Operation" -> "sum", "Field" -> "a", "Output_field" -> "o")
      .contains("at least 2 operands"))
  }

  test("cast_to_int: flb_utils_bool semantics incl. garbage→true (math.c:69)") {
    def cast(v: String) = ok("Operation" -> "sum", "Field" -> "a",
      "Field" -> "b", "Output_field" -> "o", "cast_to_int" -> v).castToInt
    assert(cast("true") && cast("On") && cast("YES"))
    assert(!cast("false") && !cast("off") && !cast("no"))
    assert(cast("wat")) // flb_utils_bool -1 coerces to C true
  }
}
