package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/**
 * SQL function surface — the engine analog of the reference's plugin
 * registration (`struct flb_filter_plugin`, math.c:377-384; SURVEY
 * §2.3): the math operators exposed as SQL functions so `spark.sql`
 * users get the same semantics as the Column DSL.
 *
 * Registered as catalyst EXPRESSION BUILDERS, not UDFs — the planner
 * sees the same `Coalesce/Cast/Add/…` trees `MathCompiler` emits, so
 * whole-stage codegen, constant folding and pushdown all still apply.
 * Two entry points:
 *  - [[GraftFunctions.register]]: imperative, on a live session;
 *  - [[GraftSparkExtensions]]: `spark.sql.extensions=graft.core.GraftSparkExtensions`
 *    for config-driven injection at session build (cluster-friendly).
 *
 * Semantics per SURVEY §2.1: every operand is
 * `coalesce(cast(x as double), 0.0)` (missing/null → 0.0, O5), folds
 * are left-associative in argument order (O6), and `graft_div` is
 * IEEE-754 — ±Inf/NaN on zero divisors (O4), unlike Spark's `/`.
 */
object GraftFunctions {

  private def operand(e: Expression): Expression =
    Coalesce(Seq(Cast(e, org.apache.spark.sql.types.DoubleType), Literal(0.0)))

  /** IEEE division expression: see MathCompiler.ieeeDiv. */
  private def ieeeDiv(a: Expression, b: Expression): Expression =
    If(EqualTo(b, Literal(0.0)),
      Multiply(a, Pow(b, Literal(-1.0))),
      Divide(a, b))

  private def fold(op: (Expression, Expression) => Expression)
      (args: Seq[Expression]): Expression = {
    require(args.size >= 2,
      "Any operation requires at least 2 operands ('field' or 'constant')")
    args.map(operand).reduceLeft(op)
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_sum" -> fold(Add(_, _)) _,
    "graft_sub" -> fold(Subtract(_, _)) _,
    "graft_mul" -> fold(Multiply(_, _)) _,
    "graft_div" -> fold(ieeeDiv) _,
    "graft_dot" -> { args: Seq[Expression] =>
      require(args.size == 2, "graft_dot(array<double>, array<double>)")
      graft.functions.DotProduct(args(0), args(1))
    },
    "graft_fingerprint" -> { args: Seq[Expression] =>
      require(args.size == 1, "graft_fingerprint(string)")
      graft.functions.RollingHash(args(0))
    },
    "graft_simhash" -> { args: Seq[Expression] =>
      require(args.size == 1, "graft_simhash(string)")
      graft.functions.SimHash32(args(0))
    },
    "graft_lang_id" -> { args: Seq[Expression] =>
      require(args.size == 1, "graft_lang_id(string)")
      graft.functions.LangIdOf(args(0))
    },
    "graft_shingle_hashes" -> { args: Seq[Expression] =>
      require(args.size == 2, "graft_shingle_hashes(string, k)")
      graft.functions.ShingleHashes(args(0), literalInt(args(1)))
    },
    "graft_minhash" -> { args: Seq[Expression] =>
      require(args.size == 3, "graft_minhash(string, k, perms)")
      graft.functions.MinHashSig(
        graft.functions.ShingleHashes(args(0), literalInt(args(1))),
        literalInt(args(2)))
    },
    "graft_json_first_numeric" -> { args: Seq[Expression] =>
      require(args.size == 2, "graft_json_first_numeric(json, 'key')")
      graft.functions.JsonFirstNumeric(args(0), literalString(args(1)))
    },
    "graft_token_counts" -> { args: Seq[Expression] =>
      require(args.size == 1, "graft_token_counts(string)")
      graft.functions.TokenCounts(args(0))
    },
    // aggregate: the analyzer wraps a bare AggregateFunction builder
    // result in AggregateExpression, same as Spark's own sum/min
    "graft_sim_top_k" -> { args: Seq[Expression] =>
      require(args.size == 3, "graft_sim_top_k(sim, id, k)")
      graft.functions.SimTopK(args(0), args(1), literalInt(args(2)))
    },
    "graft_redact" -> { args: Seq[Expression] =>
      require(args.size == 1, "graft_redact(string)")
      import graft.functions.TextFunctions.{emailPat, ipv4Pat, phonePat}
      RegExpReplace(
        RegExpReplace(
          RegExpReplace(args(0), Literal(emailPat), Literal("<EMAIL>")),
          Literal(ipv4Pat), Literal("<IP>")),
        Literal(phonePat), Literal("<PHONE>"))
    })

  private def literalInt(e: Expression): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  private def literalString(e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
      org.apache.spark.sql.types.StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"expected a string literal, got $other")
  }

  private def info(name: String) = new ExpressionInfo(
    GraftFunctions.getClass.getCanonicalName, null, name,
    s"$name(expr, expr, ...) - left-fold with reference operand semantics " +
      "(null/non-numeric -> 0.0; graft_div is IEEE, /0 -> +-Inf/NaN)",
    "", "", "", "math_funcs", "", "", "built-in")

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), b)
    }
}

/** Config-driven injection: `--conf spark.sql.extensions=graft.core.GraftSparkExtensions`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftSparkExtensions].getCanonicalName, null, name,
          s"$name(expr, expr, ...) - reference math fold",
          "", "", "", "math_funcs", "", "", "built-in"),
        b))
    }
}
