package graft.core

/**
 * Logical model of the reference's math filter (its "query language").
 *
 * The reference (fopina/fluent-bit-filter-math) configures one stateless
 * projection per filter instance from fluent-bit key/value properties
 * (filter_math/math.c:37-132). This ADT is the Spark-side logical plan:
 * it is compiled to a Catalyst `Column` by [[MathCompiler]] — never
 * interpreted per record.
 *
 * Faithful quirks replicated here (all cited into the reference):
 *  - property keys matched case-insensitively; unknown keys are a hard
 *    error (math.c:54-111).
 *  - `Operation` values match case-insensitively on the FIRST 3 CHARS
 *    only (`strncasecmp(val, OPERATION_STRING[i], 3)`, math.c:56), so
 *    "SUMMARY" parses as sum and "division" as div. A later invalid
 *    `Operation` value is an error only if no valid one was seen before
 *    (math.c:61-66: the `== -1` guard no longer fires once set).
 *  - `Constant` is parsed with strtod but stored into an `int` struct
 *    member (math.h:61, math.c:99) → fractional constants silently
 *    truncate toward zero ("2.7" → 2) and any value truncating to 0 is
 *    rejected (math.c:100-104).
 *  - `cast_to_int` uses fluent-bit's flb_utils_bool (math.c:69):
 *    true/on/yes → true, false/off/no → false, anything else returns -1
 *    which a C `bool` coerces to TRUE — replicated, documented.
 *  - validation: `Output_field` required, a valid operation required,
 *    ≥2 operands required (math.c:114-129). Operands keep config order
 *    in one mixed field/constant list (mk_list_add appends,
 *    math.c:87,105) — order matters for sub/div.
 */
sealed abstract class Operation(val name: String) {
  /** Left-fold step, IEEE-754 double semantics (math.c:197-215: no
   *  zero-guard on div — Infinity/NaN propagate). */
  def fold(acc: Double, v: Double): Double
}

object Operation {
  case object Sum extends Operation("sum") { def fold(a: Double, v: Double): Double = a + v }
  case object Sub extends Operation("sub") { def fold(a: Double, v: Double): Double = a - v }
  case object Mul extends Operation("mul") { def fold(a: Double, v: Double): Double = a * v }
  case object Div extends Operation("div") { def fold(a: Double, v: Double): Double = a / v }

  val all: Seq[Operation] = Seq(Sum, Sub, Mul, Div)

  /** First-3-chars case-insensitive match (math.c:56). Values shorter
   *  than 3 chars never match (the C comparison hits the NUL). */
  def parse(value: String): Option[Operation] =
    if (value.length < 3) None
    else all.find(op => value.substring(0, 3).equalsIgnoreCase(op.name))
}

sealed trait Operand
/** A record-field operand; resolution semantics in [[MathCompiler]]. */
final case class FieldRef(name: String) extends Operand
/** A constant operand. C stores it as `int` (math.h:61) — value is
 *  already truncated at parse time. */
final case class Const(value: Int) extends Operand

final case class MathOp(
    operation: Operation,
    operands: Seq[Operand],
    outputField: String,
    castToInt: Boolean = false) {

  /** Reference model of the fold (math.c:167-195): first operand seeds
   *  the accumulator; used by property-based tests as the executable
   *  spec, never by the engine itself. */
  def referenceEval(resolve: String => Double): Double = {
    val vals = operands.map {
      case Const(c)    => c.toDouble
      case FieldRef(f) => resolve(f)
    }
    vals.tail.foldLeft(vals.head)(operation.fold)
  }
}

final case class MathConfigError(message: String) extends Exception(message)

object MathOp {

  /** strtod + C `double → int` truncation (math.c:99, math.h:61):
   *  parses the longest leading prefix accepted by C strtod — decimal
   *  ("2.7abc" → 2.7, "abc" → 0.0), hexadecimal with optional binary
   *  exponent ("0x1A" → 26, "0x1p4" → 16; C99 7.20.1.3 makes the
   *  exponent optional for strtod), and case-insensitive
   *  "inf"/"infinity"/"nan" — then truncates toward zero into a 32-bit
   *  int. Out-of-range / inf / nan double→int is UB in C; we pick the
   *  JVM's saturating semantics (±inf → Int.Max/MinValue and is
   *  accepted, nan → 0 and is rejected as a zero constant) —
   *  documented divergence. */
  def parseConstant(value: String): Int = {
    val t = value.dropWhile(_.isWhitespace) // strtod skips leading isspace
    val (sign, rest) =
      if (t.startsWith("-")) (-1.0, t.drop(1))
      else if (t.startsWith("+")) (1.0, t.drop(1))
      else (1.0, t)
    val lower = rest.toLowerCase
    val d: Double =
      if (lower.startsWith("inf")) Double.PositiveInfinity
      else if (lower.startsWith("nan")) Double.NaN
      else if (lower.startsWith("0x") && {
        val b = rest.drop(2)
        b.headOption.exists(isHexDigit) ||
          (b.startsWith(".") && b.drop(1).headOption.exists(isHexDigit))
      }) parseHexPrefix(rest.drop(2))
      else {
        val Prefix = """(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?""".r
        Prefix.findPrefixOf(rest).map(_.toDouble).getOrElse(0.0)
      }
    (sign * d).toInt
  }

  private def isHexDigit(c: Char): Boolean = Character.digit(c, 16) >= 0

  /** Longest hex-float prefix AFTER the "0x": hexdigits[.hexdigits]
   *  [p±digits]. A trailing 'p' without digits backs off, like strtod. */
  private def parseHexPrefix(s: String): Double = {
    var i = 0
    var m = 0.0
    while (i < s.length && isHexDigit(s(i))) { m = m * 16 + Character.digit(s(i), 16); i += 1 }
    if (i < s.length && s(i) == '.') {
      i += 1
      var scale = 1.0 / 16
      while (i < s.length && isHexDigit(s(i))) {
        m += Character.digit(s(i), 16) * scale; scale /= 16; i += 1
      }
    }
    if (i < s.length && (s(i) == 'p' || s(i) == 'P')) {
      val Exp = """[+-]?\d+""".r
      Exp.findPrefixOf(s.substring(i + 1)).foreach(e => m *= math.pow(2, e.toDouble))
    }
    m
  }

  private def boolProperty(value: String): Boolean =
    value.toLowerCase match {
      case "true" | "on" | "yes" => true
      case "false" | "off" | "no" => false
      case _ => true // flb_utils_bool returns -1 → C bool true (math.c:69)
    }

  /** configure() parity (math.c:37-132). Properties are an ORDERED list
   *  (duplicates allowed — every Field/Constant appends an operand). */
  def fromProperties(props: Seq[(String, String)]): Either[MathConfigError, MathOp] = {
    var operation: Option[Operation] = None
    var outputField: Option[String] = None
    var castToInt = false
    val operands = Seq.newBuilder[Operand]
    var nOperands = 0

    for ((key, value) <- props) key.toLowerCase match {
      case "operation" =>
        Operation.parse(value) match {
          case Some(op) => operation = Some(op)
          case None if operation.isEmpty =>
            // math.c:61-66 — only errors while still unset
            return Left(MathConfigError(
              s"""Key "operation" has invalid value '$value'. Expected 'sum', 'sub', 'mul' or 'div'"""))
          case None => // silently ignored once a valid op was set
        }
      case "cast_to_int" => castToInt = boolProperty(value)
      case "output_field" => outputField = Some(value)
      case "field" =>
        operands += FieldRef(value); nOperands += 1
      case "constant" =>
        val c = parseConstant(value)
        if (c == 0)
          return Left(MathConfigError(
            "Constant should be an integer value (different than 0)"))
        operands += Const(c); nOperands += 1
      case _ =>
        // the reference prints the key VERBATIM, not lowercased
        return Left(MathConfigError(s"Invalid configuration key '$key'"))
    }

    // Sanity checks, in the reference's order (math.c:114-129)
    if (outputField.isEmpty)
      return Left(MathConfigError("Output_field is required or the operation is pointless"))
    if (operation.isEmpty)
      return Left(MathConfigError("Operation can only be: sum, sub, mul or div"))
    if (nOperands < 2)
      return Left(MathConfigError(
        "Any operation requires at least 2 operands ('field' or 'constant')"))

    Right(MathOp(operation.get, operands.result(), outputField.get, castToInt))
  }

  /** Throwing variant for fluent call sites. */
  def apply(props: (String, String)*): MathOp =
    fromProperties(props).fold(throw _, identity)
}
