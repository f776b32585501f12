package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused JSON-key extraction kernel for map-payload math mode.
 *
 * Why this exists (measured, rounds 1-2): the faithful schemaless path
 * was `from_json` → full `MapType(String, Double)` materialization →
 * higher-order `filter(map_entries(...))` scan per operand
 * (Sources.jsonPayload + MathCompiler.resolveInMap). `JsonToStructs`
 * is `CodegenFallback` — every record pays an interpreted Jackson
 * parse building a map nobody keeps — and the entry scan boxes each
 * entry. That made q29 the one per-query bench-gate violation in
 * round 2 (1.43 s → 3.12 s). The alternatives measured in SCALE.md
 * (VARIANT 0.47 s, `get_json_object` 0.45 s) are fast but drop the
 * reference's case-insensitive first-numeric-wins resolution
 * (filter_math/math.c:146-165, find_operand_val).
 *
 * This expression keeps the reference semantics at built-in speed:
 * ONE byte pass over the JSON document per operand, inside
 * whole-stage codegen, extracting the first entry whose key matches
 * case-insensitively AND holds a JSON number — skipping matching keys
 * with non-numeric values exactly like the reference's msgpack type
 * check continues its forward scan (math.c:149-163). No map, no
 * intermediate arrays, no boxing.
 *
 * Semantics (pinned by MathCompilerSpec / JsonKernelSpec):
 *  - document must be a single JSON object (leading/trailing
 *    whitespace allowed); anything else → NULL (caller coalesces to
 *    0.0, the reference's missing-operand value, math.c:164);
 *  - malformed documents → NULL even if a match was already seen —
 *    matching `from_json`'s all-or-nothing PERMISSIVE null map
 *    (the reference passes undecodable records through untouched,
 *    math.c:349-352 — either way the operand contributes 0.0);
 *  - key comparison is Unicode-lowercase equality, identical to the
 *    map path's `lower(key) = lower(name)` (the reference's
 *    strncasecmp is ASCII-only — same result for ASCII keys, and the
 *    two engine paths agree with each other on non-ASCII);
 *  - duplicate keys: forward scan, first NUMERIC value wins;
 *  - numbers follow strict JSON grammar (no leading '+', no leading
 *    zeros, no NaN/Infinity — what Jackson accepts by default),
 *    converted by `Double.parseDouble` (correctly rounded).
 */
object JsonOps {

  /** First numeric value for `keyLower` (pre-lowercased) in JSON
   *  object `s`, or null (missing / non-object / malformed). */
  def firstNumeric(s: UTF8String, keyLower: UTF8String): java.lang.Double =
    new JsonKeyScan(s.getBytes, keyLower).run()
}

/** Single-use, single-pass scanner. Not thread-shared; one instance
 *  per evaluation (escape-free documents allocate only for the
 *  extracted key slice). */
private object JsonKeyScan {
  /** Nesting cap: matches Jackson's default depth limit, so a
   *  pathological tens-of-thousands-deep document degrades to NULL →
   *  0.0 (exactly like the from_json path it replaced) instead of a
   *  StackOverflowError failing the whole task inside codegen. */
  final val MaxDepth = 1000
}

private final class JsonKeyScan(b: Array[Byte], keyLower: UTF8String) {
  private[this] var i = 0
  private[this] var found: java.lang.Double = null
  private[this] var bad = false
  private[this] var depth = 0

  private def ws(): Unit = {
    while (i < b.length &&
      (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
  }

  private def peek: Int = if (i < b.length) b(i) & 0xff else -1

  private def expect(c: Char): Unit = {
    if (peek == c) i += 1 else bad = true
  }

  /** Parse a JSON string; if `want`, return the decoded bytes for key
   *  comparison, else skip (nothing allocated). Leaves `i` after the
   *  closing quote. */
  private def parseString(want: Boolean): Array[Byte] = {
    if (peek != '"') { bad = true; return null }
    i += 1
    val start = i
    var hasEscape = false
    // fast scan to closing quote — escapes are VALIDATED here too, so
    // skipped strings reject exactly what decoded strings reject (an
    // unvalidated skip let documents from_json refuses slip through —
    // a lenient/strict divergence this scan otherwise avoids)
    while (i < b.length && b(i) != '"') {
      if (b(i) == '\\') {
        hasEscape = true
        if (i + 1 >= b.length) { bad = true; return null }
        b(i + 1) match {
          case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 2
          case 'u' =>
            if (i + 6 > b.length || hex4(i + 2) < 0) { bad = true; return null }
            i += 6
          case _ => bad = true; return null
        }
      } else i += 1
    }
    if (i >= b.length) { bad = true; return null }
    val end = i
    i += 1 // closing quote
    if (!want) return null
    if (!hasEscape) return java.util.Arrays.copyOfRange(b, start, end)
    // decode escapes (rare path: only for candidate keys)
    val out = new java.io.ByteArrayOutputStream(end - start)
    var j = start
    while (j < end) {
      val c = b(j) & 0xff
      if (c != '\\') { out.write(c); j += 1 }
      else if (j + 1 < end) {
        b(j + 1) match {
          case '"'  => out.write('"'); j += 2
          case '\\' => out.write('\\'); j += 2
          case '/'  => out.write('/'); j += 2
          case 'b'  => out.write('\b'); j += 2
          case 'f'  => out.write('\f'); j += 2
          case 'n'  => out.write('\n'); j += 2
          case 'r'  => out.write('\r'); j += 2
          case 't'  => out.write('\t'); j += 2
          case 'u' =>
            if (j + 6 > end) { bad = true; return null }
            val hi = hex4(j + 2)
            if (hi < 0) { bad = true; return null }
            var cp = hi
            var consumed = 6
            if (Character.isHighSurrogate(hi.toChar) && j + 12 <= end &&
                b(j + 6) == '\\' && b(j + 7) == 'u') {
              val lo = hex4(j + 8)
              if (lo >= 0 && Character.isLowSurrogate(lo.toChar)) {
                cp = Character.toCodePoint(hi.toChar, lo.toChar)
                consumed = 12
              }
            }
            out.write(new String(Character.toChars(cp))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            j += consumed
          case _ => bad = true; return null
        }
      } else { bad = true; return null }
    }
    out.toByteArray
  }

  private def hex4(at: Int): Int = {
    var v = 0
    var k = at
    while (k < at + 4) {
      val c = b(k) & 0xff
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = (v << 4) | d
      k += 1
    }
    v
  }

  /** Strict JSON number token starting at `i`; returns end index or -1. */
  private def numberEnd(): Int = {
    var j = i
    if (j < b.length && b(j) == '-') j += 1
    if (j >= b.length) return -1
    if (b(j) == '0') j += 1
    else if (b(j) >= '1' && b(j) <= '9') {
      while (j < b.length && b(j) >= '0' && b(j) <= '9') j += 1
    } else return -1
    if (j < b.length && b(j) == '.') {
      j += 1
      val fs = j
      while (j < b.length && b(j) >= '0' && b(j) <= '9') j += 1
      if (j == fs) return -1
    }
    if (j < b.length && (b(j) == 'e' || b(j) == 'E')) {
      j += 1
      if (j < b.length && (b(j) == '+' || b(j) == '-')) j += 1
      val es = j
      while (j < b.length && b(j) >= '0' && b(j) <= '9') j += 1
      if (j == es) return -1
    }
    j
  }

  private def expectWord(w: String): Unit = {
    var k = 0
    while (k < w.length) {
      if (i >= b.length || b(i) != w.charAt(k)) { bad = true; return }
      i += 1; k += 1
    }
  }

  /** Parse any JSON value at `i`. If `capture` and it is a number and
   *  no value captured yet, record it. */
  private def parseValue(capture: Boolean): Unit = {
    peek match {
      case '"' => parseString(want = false); ()
      case '{' =>
        depth += 1
        if (depth > JsonKeyScan.MaxDepth) bad = true
        else parseObject(inner = true)
        depth -= 1
      case '[' =>
        depth += 1
        if (depth > JsonKeyScan.MaxDepth) bad = true
        else {
          i += 1; ws()
          if (peek == ']') { i += 1 }
          else {
            var cont = true
            while (cont && !bad) {
              parseValue(capture = false); ws()
              if (peek == ',') { i += 1; ws() }
              else if (peek == ']') { i += 1; cont = false }
              else bad = true
            }
          }
        }
        depth -= 1
      case 't' => expectWord("true")
      case 'f' => expectWord("false")
      case 'n' => expectWord("null")
      case c if c == '-' || (c >= '0' && c <= '9') =>
        val end = numberEnd()
        if (end < 0) bad = true
        else {
          if (capture && found == null) {
            found = java.lang.Double.valueOf(
              new String(b, i, end - i, "US-ASCII"))
          }
          i = end
        }
      case _ => bad = true
    }
  }

  /** Parse an object at `i`. Top-level (`inner = false`) compares keys
   *  against the target; nested objects are skipped structurally. */
  private def parseObject(inner: Boolean): Unit = {
    expect('{'); ws()
    if (peek == '}') { i += 1; return }
    var cont = true
    while (cont && !bad) {
      val keyBytes = parseString(want = !inner)
      if (bad) return
      val matches = !inner && keyBytes != null &&
        UTF8String.fromBytes(keyBytes).toLowerCase.equals(keyLower)
      ws(); expect(':'); ws()
      if (bad) return
      parseValue(capture = matches)
      ws()
      if (peek == ',') { i += 1; ws() }
      else if (peek == '}') { i += 1; cont = false }
      else bad = true
    }
  }

  def run(): java.lang.Double = {
    ws()
    if (peek != '{') return null
    parseObject(inner = false)
    ws()
    if (bad || i != b.length) null else found
  }
}

/** `JsonFirstNumeric(json, key) → double` — see [[JsonOps]]. NULL in,
 *  NULL out; NULL also for missing key / non-numeric-only matches /
 *  malformed or non-object documents. */
case class JsonFirstNumeric(child: Expression, key: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val keyLower: UTF8String =
    UTF8String.fromString(key).toLowerCase

  override def nullSafeEval(input: Any): Any =
    JsonOps.firstNumeric(input.asInstanceOf[UTF8String], keyLower)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("graftJsonKey", keyLower,
      classOf[UTF8String].getName)
    val boxed = ctx.freshName("jsonNum")
    // nullSafeCodeGen declares ev.isNull/ev.value as locals before this
    // block (nullable expression), so the kernel's miss → NULL is a
    // plain flag set inside whole-stage codegen.
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Double $boxed = graft.functions.JsonOps.firstNumeric($c, $keyRef);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonFirstNumeric =
    copy(child = newChild)
}

object JsonExpressions {
  def jsonFirstNumeric(c: Column, key: String): Column =
    ColumnBridge.column(JsonFirstNumeric(ColumnBridge.expression(c), key))
}
