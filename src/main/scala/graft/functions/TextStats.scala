package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Single-scan text statistics, shared by quality scoring and token
 *  counting. One pass over the string computes what previously took
 *  three regexp_replace passes + a split + an interpreted
 *  higher-order stopword filter per row.
 *
 *  Field semantics replicate the regex formulation EXACTLY (a spec
 *  asserts equality against it on real data, and the DuckDB oracle
 *  still runs the regex form):
 *   - n_chars: codepoint count;
 *   - n_alpha: [A-Za-z] count;
 *   - n_punct: chars neither [A-Za-z0-9] nor Java-regex `\s`
 *     (= space \t \n \x0B \f \r);
 *   - n_nonws: chars not `\s`;
 *   - n_tok: `split(trim(lower(s)), "\\s+")` length — including
 *     Java split's empty first token when the space-trimmed text
 *     starts with non-space whitespace, and the [""] result for
 *     empty input;
 *   - n_stop: tokens that are English stopwords
 *     (TextFunctions.stopwords). */
object TextStatsUtil {
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwords.foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(u: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val s = u.toString
    var nChars = 0L; var nAlpha = 0L; var nPunct = 0L; var nNonWs = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      val alpha = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val digit = cp >= '0' && cp <= '9'
      val ws = cp < 128 && isWs(cp.toChar)
      if (alpha) nAlpha += 1
      if (!alpha && !digit && !ws) nPunct += 1
      if (!ws) nNonWs += 1
      i += Character.charCount(cp)
    }
    // tokens of split(trim(lower(s)), "\s+") — trim strips 0x20 only
    val lower = s.toLowerCase
    var b = 0; var e = lower.length
    while (b < e && lower.charAt(b) == ' ') b += 1
    while (e > b && lower.charAt(e - 1) == ' ') e -= 1
    var nTok = 0L; var nStop = 0L
    if (b == e) nTok = 1 // split("") = [""]
    else {
      var j = b
      if (isWs(lower.charAt(b))) nTok += 1 // Java split: leading empty token
      while (j < e) {
        while (j < e && isWs(lower.charAt(j))) j += 1
        if (j < e) {
          val st = j
          while (j < e && !isWs(lower.charAt(j))) j += 1
          nTok += 1
          if (stopSet.contains(lower.substring(st, j))) nStop += 1
        }
      }
      if (isWs(lower.charAt(e - 1))) nTok += 1 // trailing empty token
    }
    new GenericInternalRow(Array[Any](nChars, nAlpha, nPunct, nNonWs, nTok, nStop))
  }
}

case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_stats expects string, got ${dt.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextStatsUtil.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_nonws", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  def apply(c: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(c)))
}

/** Both token counts of q11 in ONE pass with no token arrays:
 *   - tok_ws ≡ `size(split(trim(s), "\\s+"))` — Spark trim strips
 *     0x20 only and Java split keeps leading/trailing empty tokens
 *     (the TextStatsUtil.n_tok walk, minus lowering: case cannot
 *     change a count);
 *   - tok_re ≡ `size(regexp_extract_all(s, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))`
 *     — alnum RUNS count once, every other non-ws CODE POINT counts
 *     once (astral pairs are one code point, as in Java regex).
 *  The regex formulations built two arrays per row through two regex
 *  engines just to take their lengths. */
object TokenCountsUtil {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(u: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val s = u.toString
    var tokRe = 0L
    var inAlnum = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp < 128 && isWs(cp.toChar)
      if (alnum) { if (!inAlnum) tokRe += 1; inAlnum = true }
      else { inAlnum = false; if (!ws) tokRe += 1 }
      i += Character.charCount(cp)
    }
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    var tokWs = 0L
    if (b == e) tokWs = 1 // split("") = [""]
    else {
      if (isWs(s.charAt(b))) tokWs += 1 // leading empty token
      var j = b
      while (j < e) {
        while (j < e && isWs(s.charAt(j))) j += 1
        if (j < e) {
          tokWs += 1
          while (j < e && !isWs(s.charAt(j))) j += 1
        }
      }
      if (isWs(s.charAt(e - 1))) tokWs += 1 // trailing empty token
    }
    new GenericInternalRow(Array[Any](tokWs, tokRe))
  }
}

case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenCounts.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_counts expects string, got ${dt.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenCountsUtil.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountsUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  val schema: StructType = StructType(Seq(
    StructField("tok_ws", LongType, nullable = false),
    StructField("tok_re", LongType, nullable = false)))

  def apply(c: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(c)))
}

/** Unicode NFC canonical composition (X59), the first step of the
 *  text-normalization operator. Pure JVM intrinsic
 *  (`java.text.Normalizer`) emitted into whole-stage codegen — the
 *  `isNormalized` quick-check skips the composition allocation for
 *  the (dominant, in real corpora) already-composed rows, so the
 *  common case is a scan, not a rebuild.
 *
 *  Cross-engine note: the DuckDB oracle's `nfc_normalize` (utf8proc)
 *  and the JDK implement the same Unicode canonical-composition
 *  algorithm; NFC is stability-guaranteed for assigned code points,
 *  so both engines compose identical output (spec-asserted on
 *  combining sequences, oracle-verified corpus-wide). */
object NfcNormalizeUtil {
  def compute(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${dt.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeUtil.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
