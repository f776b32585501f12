package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `DotProduct(array<double>, array<double>) → double` — the one place
 * this engine drops to a custom Catalyst `Expression`.
 *
 * Why: Spark's higher-order functions (`zip_with` + `aggregate`) are
 * `CodegenFallback` — per-row interpreted evaluation with boxing and
 * closure dispatch per element. Every similarity operator (kNN, LSH
 * bucketing, IVF, embedding near-dup) folds a 64-dim dot product per
 * candidate pair, which makes the fold itself the hot loop. This
 * expression emits a tight primitive `double` loop into whole-stage
 * codegen instead (preference order per the engine charter: compose
 * built-ins first — done everywhere else — then a native Expression
 * with doGenCode before ever considering a UDF).
 *
 * Semantics: acc = Σ a[i]·b[i] accumulated in ASCENDING index order —
 * bit-identical to the previous `aggregate(zip_with(...))` fold and
 * to the DuckDB oracle's `list_reduce` mirror. Inputs are non-null
 * array<double> of equal length (the engine always casts embeddings
 * up front); length mismatch takes the shorter prefix.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-DSL entry point for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/**
 * `RollingHash(string) → long` — codegen'd rolling polynomial
 * fingerprint: fold (acc·31 + codepoint) mod (2³¹−1) over the
 * string's Unicode codepoints, seed 0 (empty string → 0).
 *
 * Replaces the interpreted per-character HOF pipeline
 * (`aggregate(transform(sequence(...), i -> ascii(substring(...))))`),
 * which allocated a position array and a substring per character per
 * row. Iterating codepoints matches the DuckDB oracle's
 * `unicode(substr(...))` exactly, including outside the BMP.
 */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash expects string, got ${dt.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value} = (${ev.value} * 31L + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object TextExpressions {
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
