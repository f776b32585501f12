package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused one-pass hash kernels for the dedup/text operators, as native
 * codegen'd Catalyst expressions.
 *
 * Why these exist (measured, round 2): the MinHash signature, SimHash
 * and language-ID stages were built from Spark higher-order functions
 * (`transform`/`aggregate`/`filter`) or from explode + hash-aggregate
 * plans. HOFs are `CodegenFallback` — per-row interpreted evaluation
 * with boxing per element and one intermediate array per `transform` —
 * and the explode plans pay a full shuffle to do per-row work. Each
 * expression below computes the SAME value (bit-for-bit, DuckDB-oracle
 * verified) in a single tight JVM loop per row, inside whole-stage
 * codegen, with no intermediate arrays and no shuffle.
 *
 * All hashing derives from md5 via [[Hashing.h60]] (= first 15 hex
 * chars of md5 as a 60-bit BIGINT) so every value remains exactly
 * reproducible in the DuckDB oracle — computed here directly from the
 * digest bytes: big-endian u64 of bytes 0..7, >>> 4.
 */
object HashOps {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** h60 of raw UTF-8 bytes: == conv(substring(md5(s),1,15),16,10). */
  def h60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** h60 per element; mod > 0 additionally reduces mod `mod`. */
  def h60Array(arr: ArrayData, mod: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = h60(arr.getUTF8String(i).getBytes)
      out(i) = if (mod > 0) v % mod else v
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Distinct word-k-shingle h60 hashes of a token array, SORTED
   *  ascending — the whole `array_distinct(transform(sequence, i ->
   *  array_join(slice(toks,i,k))))` → md5-hash → sort_array pipeline
   *  in one pass. Token arrays shorter than k yield the single
   *  whole-array shingle (slice truncates), so no document drops out
   *  of dedup. Distinctness is by HASH, not string — identical unless
   *  two distinct shingles collide in 60 bits (p ≈ 2⁻⁶⁰ per pair;
   *  the DuckDB oracle still distincts strings, so a real collision
   *  would surface as a verification failure, not silent corruption). */
  def shingleHashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      val slice = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { slice(j - i) = arr.getUTF8String(j); j += 1 }
      val h = h60(UTF8String.concatWs(ShingleSep, slice: _*).getBytes)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, cnt)
    java.util.Arrays.sort(res)
    UnsafeArrayData.fromPrimitiveArray(res)
  }

  /** MinHash signature from precomputed h60 hashes ([[shingleHashes]]
   *  output): `perms` affine-permutation minima
   *  min_h (permA(i)·(h mod P) + permB(i)) mod P. Neither the sort
   *  order nor hash-dedup of the input can change a minimum, so this
   *  equals the HOF formulation over raw shingle strings. Empty input
   *  yields all-null elements — the exact value of
   *  array_min(empty-transform) in the HOF formulation, so downstream
   *  band hashing (array_join skips nulls) is unchanged. */
  def minhashSig(arr: ArrayData, perms: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](perms))
    val p = Hashing.P
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) % p
      var j = 0
      while (j < perms) {
        val v = (Hashing.permA(j) * h + Hashing.permB(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** 32-bit SimHash over token strings: bit b set iff the ±1 majority
   *  of h60(token) bit b is positive — identical to the explode +
   *  32-conditional-sums aggregation it replaces. */
  def simhash32(arr: ArrayData): Long = {
    val counts = new Array[Long](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = h60(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 32) {
        counts(b) += ((h >>> b) & 1L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) acc |= 1L << b; b += 1 }
    acc
  }

  /** |A ∩ B| of two SORTED distinct long arrays by merge-walk — no
   *  per-row hash set, no allocation (vs builtin array_intersect). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private val langNames: Array[UTF8String] =
    TextFunctions.langProfiles.map(p => UTF8String.fromString(p._1)).toArray
  private val langSets: Array[java.util.HashSet[UTF8String]] =
    TextFunctions.langProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** Stopword-profile argmax over tokens (every occurrence counts),
   *  ties broken toward the earlier profile — the same left fold as
   *  [[TextFunctions.langId]] / the DuckDB oracle. */
  def langId(arr: ArrayData): UTF8String = {
    val k = langSets.length
    val scores = new Array[Int](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      while (j < k) { if (langSets(j).contains(t)) scores(j) += 1; j += 1 }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < k) { if (scores(j) > scores(best)) best = j; j += 1 }
    langNames(best)
  }
}

private[functions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<string>, got ${dt.simpleString}")
  }
}

/** `H60Array(array<string>, mod) → array<long>` — vectorized
 *  [[Hashing.h60]] (optionally mod-reduced), replacing the interpreted
 *  `transform(sh, s -> conv(substring(md5(s),1,15),16,10))`. */
case class H60Array(child: Expression, mod: Long)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.h60Array(input.asInstanceOf[ArrayData], mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.h60Array($c, ${mod}L);")
  override protected def withNewChildInternal(newChild: Expression): H60Array =
    copy(child = newChild)
}

/** `ShingleHashes(array<string>, k) → array<long>` — fused distinct
 *  word-k-shingling + h60 + sort (see [[HashOps.shingleHashes]]). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.shingleHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.shingleHashes($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `MinHashSig(array<long>, perms) → array<long>` — the fused
 *  signature kernel (mod P → perms affine minima in one pass). */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    HashOps.minhashSig(input.asInstanceOf[ArrayData], perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.minhashSig($c, $perms);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `SimHash32(array<string>) → long` — fused bit-majority SimHash. */
case class SimHash32(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashOps.simhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.simhash32($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `SortedIntersectCount(array<long>, array<long>) → int` — merge-walk
 *  set-intersection size of two sorted distinct arrays (the verify
 *  hot loop of the near-dup joins). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashOps.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `LangIdOf(array<string>) → string` — single-pass stopword-profile
 *  argmax; replaces the explode + 5-conditional-sums aggregation (and
 *  its shuffle) with a narrow projection. */
case class LangIdOf(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashOps.langId(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.langId($c);")
  override protected def withNewChildInternal(newChild: Expression): LangIdOf =
    copy(child = newChild)
}

object HashExpressions {
  def h60Array(c: Column, mod: Long = 0L): Column =
    ColumnBridge.column(H60Array(ColumnBridge.expression(c), mod))
  def shingleHashes(c: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), k))
  def minhashSig(c: Column, perms: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), perms))
  def simhash32(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def langIdOf(c: Column): Column =
    ColumnBridge.column(LangIdOf(ColumnBridge.expression(c)))
}
