package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiles a [[MathOp]] logical config into a Catalyst `Column` tree.
 *
 * This is the Spark-native replacement for the reference's hot loop
 * (filter_math/math.c:290-366): instead of interpreting msgpack records
 * one at a time, the whole operator becomes a declarative expression —
 * `Coalesce(Cast(col, Double), 0.0)` operands folded left with
 * `Add/Subtract/Multiply/Divide` — that Catalyst constant-folds, prunes
 * and whole-stage-codegens. A projection is a narrow transformation:
 * no shuffle at any scale, embarrassingly parallel across executors.
 *
 * Operand resolution parity (math.c:146-165, find_operand_val):
 *  - case-insensitive exact key match (strncasecmp with exact length);
 *  - only numeric values count (msgpack POSITIVE/NEGATIVE_INTEGER,
 *    FLOAT32/64 → C double). A matching key holding a non-numeric value
 *    is skipped and the scan CONTINUES (a later duplicate key may win);
 *  - no match (or only non-numeric matches) → operand value 0.0;
 *  - dotted names like `Mem.used` are LITERAL flat keys (no path
 *    traversal anywhere in the reference) → backtick-quoted columns.
 *
 * Two payload modes share the semantics:
 *  - struct mode: typed columns (schema known — parquet path). Key scan
 *    resolves at COMPILE time against the schema: strictly better than
 *    the reference's per-record O(operands × map-size) scan
 *    (math.c:149-150) while observationally identical.
 *  - map mode: `MapType(String, Double)` payload column for schemaless
 *    ingestion (msgpack/JSON-like). The entry scan happens per record
 *    with codegen'd higher-order functions; non-numeric values arrive
 *    as null entries and are skipped, like the reference's type check.
 */
object MathCompiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Struct-mode field resolution (math.c:146-165). The first
   *  case-insensitive name match with a numeric type wins — by ORDINAL,
   *  so duplicate case-insensitive names (legal in a DataFrame, like
   *  duplicate msgpack keys) resolve like the reference's forward scan
   *  instead of throwing AMBIGUOUS_REFERENCE. */
  def resolveFieldIndex(name: String, schema: StructType): Option[Int] =
    schema.fields.indexWhere(f =>
      f.name.equalsIgnoreCase(name) && isNumeric(f.dataType)) match {
      case -1 => None
      case i  => Some(i)
    }

  /** Name-based resolution for callers composing over unambiguous
   *  frames; a NULL cell in a numeric column models a missing msgpack
   *  key → 0.0 (math.c:164). */
  def resolveField(name: String, schema: StructType): Column =
    resolveFieldIndex(name, schema) match {
      case Some(i) => coalesce(col(s"`${schema.fields(i).name}`").cast(DoubleType), lit(0.0))
      case None    => lit(0.0) // missing or non-numeric field (math.c:164)
    }

  /** Map-mode resolution: first entry whose key matches
   *  case-insensitively AND holds a (non-null ⇒ numeric) value; entry
   *  order is map order, matching the reference's forward scan. */
  def resolveInMap(mapCol: Column, name: String): Column = {
    val matches = filter(
      map_entries(mapCol),
      e => lower(e.getField("key")) === lit(name.toLowerCase) &&
        e.getField("value").isNotNull)
    coalesce(get(matches, lit(0)).getField("value"), lit(0.0))
  }

  /** IEEE-754 double division. The reference divides with NO zero guard
   *  (math.c:212-215) → ±Inf/NaN propagate; Spark's `Divide` instead
   *  returns NULL on a zero divisor (both ANSI and legacy modes), so we
   *  restore IEEE semantics with built-ins only: `pow(±0.0, -1)` is
   *  ±Infinity per IEEE (sign of zero honored), and `a * ±Inf` then
   *  yields ±Inf for a≠0 and NaN for a=0 — exactly `a / ±0.0`. Both
   *  branches whole-stage-codegen. */
  def ieeeDiv(a: Column, b: Column): Column =
    when(b === lit(0.0), a * pow(b, lit(-1.0))).otherwise(a / b)

  /** Left-fold in config order (math.c:167-195; first operand seeds the
   *  accumulator). `cast_to_int` truncates toward zero; C packs a
   *  32-bit int (math.c:258-260, UB on overflow) — we widen to
   *  LongType (SURVEY §2.1 O8, documented divergence). */
  def expression(op: MathOp, resolve: Operand => Column): Column = {
    val folded = op.operands.map(resolve).reduceLeft[Column] {
      (acc, v) => op.operation match {
        case Operation.Sum => acc + v
        case Operation.Sub => acc - v
        case Operation.Mul => acc * v
        case Operation.Div => ieeeDiv(acc, v)
      }
    }
    if (op.castToInt) folded.cast(LongType) else folded
  }

  /** Struct-mode compile against a known schema. */
  def column(op: MathOp, schema: StructType): Column =
    expression(op, {
      case Const(c)    => lit(c.toDouble)
      case FieldRef(f) => resolveField(f, schema)
    })

  /** Map-mode compile against a `MapType(String, Double)` payload. */
  def columnForMap(op: MathOp, mapCol: Column): Column =
    expression(op, {
      case Const(c)    => lit(c.toDouble)
      case FieldRef(f) => resolveInMap(mapCol, f)
    })

  /**
   * Apply the operator to a DataFrame — the `cb_math_filter` equivalent
   * (math.c:290-366), one narrow projection. Operands are bound by
   * ORDINAL through a positional rename (`toDF`), so duplicate or
   * exotically-named columns never hit name-resolution ambiguity; the
   * two extra projections collapse in the optimizer. NOTE (SURVEY §2.1
   * O7): the reference APPENDS the output key even when present
   * (duplicate map keys); we REPLACE in place — intentional, tested
   * divergence.
   */
  def apply(df: DataFrame, op: MathOp): DataFrame = {
    val names = df.columns
    val tmp = names.indices.map(i => s"__graft_c$i")
    val renamed = df.toDF(tmp: _*)
    val result = expression(op, {
      case Const(c) => lit(c.toDouble)
      case FieldRef(f) => resolveFieldIndex(f, df.schema) match {
        case Some(i) => coalesce(col(tmp(i)).cast(DoubleType), lit(0.0))
        case None    => lit(0.0)
      }
    })
    val outIdx = names.indexWhere(_.equalsIgnoreCase(op.outputField))
    val outCols =
      if (outIdx >= 0)
        tmp.indices.map(i =>
          if (i == outIdx) result.as(op.outputField)
          else col(tmp(i)).as(names(i)))
      else
        tmp.indices.map(i => col(tmp(i)).as(names(i))) :+ result.as(op.outputField)
    renamed.select(outCols: _*)
  }

  /** Map-payload variant of [[apply]]. */
  def applyToMap(df: DataFrame, op: MathOp, payloadCol: String): DataFrame =
    df.withColumn(op.outputField, columnForMap(op, col(payloadCol)))

  /** Fused JSON-payload resolution: the same case-insensitive
   *  first-numeric-wins forward scan as the map mode (math.c:146-165),
   *  but as ONE codegen'd byte pass per operand over the raw JSON
   *  text ([[graft.functions.JsonOps]]) instead of `from_json`
   *  materializing a full `MapType` per record (`JsonToStructs` is
   *  CodegenFallback — measured 2×+ slower; SCALE.md). Missing key,
   *  no numeric match, or a malformed document all resolve to 0.0
   *  exactly like [[resolveInMap]] over a null/empty map. The map
   *  path remains for payloads already materialized as maps
   *  (msgpack ingestion). */
  def resolveInJson(jsonCol: Column, name: String): Column =
    coalesce(graft.functions.JsonExpressions.jsonFirstNumeric(jsonCol, name),
      lit(0.0))

  /** JSON-text-payload compile + apply (schemaless fast path). */
  def columnForJson(op: MathOp, jsonCol: Column): Column =
    expression(op, {
      case Const(c)    => lit(c.toDouble)
      case FieldRef(f) => resolveInJson(jsonCol, f)
    })

  def applyToJson(df: DataFrame, op: MathOp, jsonCol: String): DataFrame =
    df.withColumn(op.outputField, columnForJson(op, col(jsonCol)))

  /** VARIANT-payload resolution (Spark 4): exact-key access via
   *  `try_variant_get` — missing key, non-numeric value, or NULL
   *  payload all resolve to 0.0 like the reference's scan. NOTE:
   *  Variant paths are case-SENSITIVE (documented divergence; the
   *  map path keeps the faithful case-insensitive scan). Bracket
   *  syntax so dotted flat keys like `Mem.used` stay literal. */
  def resolveInVariant(vCol: Column, name: String): Column =
    coalesce(try_variant_get(vCol, s"$$['$name']", "double"), lit(0.0))

  /** Variant-payload compile + apply. */
  def columnForVariant(op: MathOp, vCol: Column): Column =
    expression(op, {
      case Const(c)    => lit(c.toDouble)
      case FieldRef(f) => resolveInVariant(vCol, f)
    })

  def applyToVariant(df: DataFrame, op: MathOp, payloadCol: String): DataFrame =
    df.withColumn(op.outputField, columnForVariant(op, col(payloadCol)))

  /** Case-INSENSITIVE variant mode (opt-in, X27): pairs with
   *  [[graft.sources.Sources.variantPayloadCI]]'s lower-cased-key
   *  ingestion — the query key lowers here, the payload keys lowered
   *  at ingest, so lookup is case-insensitive end-to-end while the
   *  access itself stays the exact-key shredded-variant fast path. */
  def columnForVariantCI(op: MathOp, vCol: Column): Column =
    expression(op, {
      case Const(c)    => lit(c.toDouble)
      case FieldRef(f) =>
        resolveInVariant(vCol, f.toLowerCase(java.util.Locale.ROOT))
    })

  def applyToVariantCI(df: DataFrame, op: MathOp, payloadCol: String): DataFrame =
    df.withColumn(op.outputField, columnForVariantCI(op, col(payloadCol)))
}
