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

  /** ASCII whitespace, the class Java regex `\s` matches (and what
   *  Spark's `split(_, "\\s+")` therefore splits on). Multi-byte
   *  UTF-8 units are all ≥ 0x80, so byte-level scanning is safe. */
  private def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Visit the tokens of `split(trim(s), "\\s+")` over raw UTF-8
   *  bytes, replicating the builtin pipeline exactly: trim strips
   *  0x20 only; inner whitespace runs collapse; a leading/trailing
   *  non-space whitespace boundary yields an EMPTY token (split
   *  keeps boundary empties with limit -1); empty input yields one
   *  empty token. Callback gets (offset, length) into `b`. */
  private def forEachSplitToken(b: Array[Byte])(f: (Int, Int) => Unit): Unit = {
    var from = 0
    var to = b.length
    while (from < to && b(from) == 0x20) from += 1
    while (to > from && b(to - 1) == 0x20) to -= 1
    if (from == to) { f(from, 0); return }
    if (isWs(b(from))) f(from, 0)
    var i = from
    while (i < to) {
      while (i < to && isWs(b(i))) i += 1
      val start = i
      while (i < to && !isWs(b(i))) i += 1
      if (i > start) f(start, i - start)
    }
    if (isWs(b(to - 1))) f(to, 0)
  }

  /** h60 over a concatenation of byte slices joined by single spaces
   *  (a word shingle) without materializing the joined string. */
  private def h60Joined(b: Array[Byte], offs: Array[Int], lens: Array[Int],
      from: Int, until: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    var i = from
    while (i < until) {
      if (i > from) md.update(0x20.toByte)
      md.update(b, offs(i), lens(i))
      i += 1
    }
    val d = md.digest()
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v >>> 4
  }

  /** Distinct word-k-shingle h60 hashes of `lower(text)`'s whitespace
   *  tokens, SORTED ascending — the whole `split` → `transform(slice+
   *  array_join)` → `array_distinct` → md5 → `sort_array` pipeline in
   *  one pass over the bytes, with zero intermediate arrays or
   *  strings. Fewer than k tokens yield the single whole-sequence
   *  shingle (slice truncates), so no document drops out of dedup.
   *  Distinctness is by HASH, not string — identical unless two
   *  distinct shingles collide in 60 bits (p ≈ 2⁻⁶⁰ per pair; the
   *  DuckDB oracle still distincts strings, so a real collision would
   *  surface as a verification failure, not silent corruption). */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val b = s.toLowerCase.getBytes
    var offs = new Array[Int](16)
    var lens = new Array[Int](16)
    var n = 0
    forEachSplitToken(b) { (off, len) =>
      if (n == offs.length) {
        offs = java.util.Arrays.copyOf(offs, n * 2)
        lens = java.util.Arrays.copyOf(lens, n * 2)
      }
      offs(n) = off; lens(n) = len; n += 1
    }
    val m = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      val h = h60Joined(b, offs, lens, i, math.min(i + k, n))
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

  /** `bits`-wide SimHash (bits ≤ 60) over `lower(text)`'s whitespace
   *  tokens: bit b set iff the ±1 majority of h60(token) bit b is
   *  positive — identical to hashing the `split` token array
   *  (including its boundary empty tokens), with no token array
   *  materialized. 32 bits is the compact default; 60 bits is the
   *  scale width (hamming search over larger corpora needs the
   *  collision space — see SCALE.md). */
  def simhashBits(s: UTF8String, bits: Int): Long = {
    val bytes = s.toLowerCase.getBytes
    val counts = new Array[Long](bits)
    val md = mdLocal.get()
    forEachSplitToken(bytes) { (off, len) =>
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      val h = v >>> 4
      var b = 0
      while (b < bits) {
        counts(b) += ((h >>> b) & 1L) * 2L - 1L
        b += 1
      }
    }
    var acc = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) acc |= 1L << b; b += 1 }
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

  /** Per-document token frequencies: distinct non-empty tokens of
   *  `split(trim(lower(s)), "\\s+")` with occurrence counts, sorted by
   *  token (binary order) — `(t, n)` structs from one pass over the
   *  bytes. This is the NARROW-FIRST shape for corpus vocabulary
   *  aggregation: exploding it emits one row per distinct token PER
   *  DOCUMENT (then map-side partial agg combines across documents),
   *  where exploding the raw token array emits one row per token
   *  OCCURRENCE and pays generator + hash-agg probe cost per
   *  occurrence — the heaviest per-row work in the suite before this
   *  kernel existed. UTF8String keys wrap the lowercased byte buffer
   *  (no copy); struct rows are built only for the distinct survivors. */
  /** Document length + per-term frequencies of `lower(text)`'s
   *  whitespace tokens in ONE byte pass: out(0) = count of non-empty
   *  tokens, out(i+1) = occurrences of terms(i). Terms must arrive
   *  lowercased; matching is exact bytes. The BM25 feature kernel —
   *  per-doc tf against a BOUNDED query vocabulary without the
   *  explode + (doc, term) shuffle of the posting formulation. */
  def termCounts(s: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Long](terms.length + 1)
    forEachSplitToken(b) { (off, len) =>
      if (len > 0) {
        out(0) += 1L
        var i = 0
        while (i < terms.length) {
          val t = terms(i)
          if (t.length == len &&
              java.util.Arrays.equals(b, off, off + len, t, 0, t.length))
            out(i + 1) += 1L
          i += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def tokenFreqs(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val m = new java.util.HashMap[UTF8String, Array[Long]](32)
    forEachSplitToken(b) { (off, len) =>
      if (len > 0) {
        val t = UTF8String.fromBytes(b, off, len)
        val cur = m.get(t)
        if (cur == null) m.put(t, Array(1L)) else cur(0) += 1L
      }
    }
    sortedFreqRows(m)
  }

  /** Per-doc distinct ADJACENT-PAIR counts of `lower(text)`'s
   *  non-empty whitespace tokens, keys `"left right"` (single-space
   *  joined), sorted by key — the tokenizer-training twin of
   *  [[tokenFreqs]]: corpus-wide pair counts are the statistic one
   *  BPE merge step maximizes (Sennrich et al. 2016, arXiv:
   *  1508.07909), here over the whitespace pre-tokenization. Empty
   *  boundary tokens only ever occur at the string's edges, so
   *  pairing consecutive non-empty tokens equals pairing over the
   *  empty-filtered token list — the oracle's formulation. */
  def bigramFreqs(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val m = new java.util.HashMap[UTF8String, Array[Long]](32)
    var prevOff = 0
    var prevLen = 0
    forEachSplitToken(b) { (off, len) =>
      if (len > 0) {
        if (prevLen > 0) {
          val key = new Array[Byte](prevLen + 1 + len)
          System.arraycopy(b, prevOff, key, 0, prevLen)
          key(prevLen) = 0x20
          System.arraycopy(b, off, key, prevLen + 1, len)
          val t = UTF8String.fromBytes(key)
          val cur = m.get(t)
          if (cur == null) m.put(t, Array(1L)) else cur(0) += 1L
        }
        prevOff = off
        prevLen = len
      }
    }
    sortedFreqRows(m)
  }

  private def sortedFreqRows(
      m: java.util.HashMap[UTF8String, Array[Long]]): ArrayData = {
    val keys = m.keySet().toArray(new Array[UTF8String](m.size()))
    java.util.Arrays.sort(keys,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val rows = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      rows(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](keys(i), m.get(keys(i))(0)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  private val langNames: Array[UTF8String] =
    TextFunctions.langProfiles.map(p => UTF8String.fromString(p._1)).toArray
  private val langSets: Array[java.util.HashSet[UTF8String]] =
    TextFunctions.langProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** Stopword-profile argmax over `lower(text)`'s whitespace tokens
   *  (every occurrence counts), ties broken toward the earlier
   *  profile — the same left fold as [[TextFunctions.langId]] / the
   *  DuckDB oracle, with no token array materialized (empty boundary
   *  tokens can't match a stopword, so skipping vs counting them is
   *  indistinguishable here). */
  def langId(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val k = langSets.length
    val scores = new Array[Int](k)
    forEachSplitToken(bytes) { (off, len) =>
      if (len > 0) {
        val t = UTF8String.fromBytes(bytes, off, len)
        var j = 0
        while (j < k) { if (langSets(j).contains(t)) scores(j) += 1; j += 1 }
      }
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

private[functions] trait StringInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects string, got ${dt.simpleString}")
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

/** `ShingleHashes(string, k) → array<long>` — fused lowercasing +
 *  tokenization + distinct word-k-shingling + h60 + sort (see
 *  [[HashOps.shingleHashes]]). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.shingleHashes(input.asInstanceOf[UTF8String], k)
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

/** `SimHash32(string, bits) → long` — fused tokenize + bit-majority
 *  SimHash at a configurable width (≤ 60). */
case class SimHash32(child: Expression, bits: Int = 32)
    extends UnaryExpression with StringInput {
  require(bits >= 1 && bits <= 60, s"simhash width must be 1..60: $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashOps.simhashBits(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.simhashBits($c, $bits);")
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

/** `TokenFrequencies(string) → array<struct<t:string,n:bigint>>` —
 *  fused lowercase + tokenize + per-doc frequency map, sorted by
 *  token (see [[HashOps.tokenFreqs]]). Explode + sum replaces the
 *  per-occurrence explode + count in vocabulary aggregation. */
case class TokenFrequencies(child: Expression)
    extends UnaryExpression with StringInput {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.tokenFreqs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.tokenFreqs($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenFrequencies =
    copy(child = newChild)
}

/** `BigramFrequencies(string) → array<struct<t:string,n:bigint>>` —
 *  fused lowercase + tokenize + per-doc ADJACENT-PAIR frequency map,
 *  keys single-space joined, sorted (see [[HashOps.bigramFreqs]]).
 *  Same narrow-first shape as [[TokenFrequencies]]: exploding it
 *  emits one row per distinct pair per document, not per pair
 *  occurrence. */
case class BigramFrequencies(child: Expression)
    extends UnaryExpression with StringInput {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.bigramFreqs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.bigramFreqs($c);")
  override protected def withNewChildInternal(newChild: Expression): BigramFrequencies =
    copy(child = newChild)
}

/** `TermCounts(string, terms) → array<long>` — fused lowercase +
 *  tokenize + per-term counting against a bounded (broadcast-literal)
 *  term list: [dl, tf(terms(0)), tf(terms(1)), …] in one byte pass
 *  (see [[HashOps.termCounts]]). The retrieval/BM25 feature kernel. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with StringInput {
  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashOps.termCounts(input.asInstanceOf[UTF8String], termBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termBytes", termBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.termCounts($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** `LangIdOf(string) → string` — single-pass tokenize + stopword-
 *  profile argmax; replaces the explode + 5-conditional-sums
 *  aggregation (and its shuffle) with a narrow projection. */
case class LangIdOf(child: Expression)
    extends UnaryExpression with StringInput {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashOps.langId(input.asInstanceOf[UTF8String])
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
  def simhashBits(c: Column, bits: Int): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c), bits))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def langIdOf(c: Column): Column =
    ColumnBridge.column(LangIdOf(ColumnBridge.expression(c)))
  def tokenFrequencies(c: Column): Column =
    ColumnBridge.column(TokenFrequencies(ColumnBridge.expression(c)))
  def bigramFrequencies(c: Column): Column =
    ColumnBridge.column(BigramFrequencies(ColumnBridge.expression(c)))
  def termCounts(c: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(c), terms))
}
