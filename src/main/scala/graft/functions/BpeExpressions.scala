package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Vocab-scale BPE encode kernel (round-11 item 1). The round-10
 * encoder folded the learned merge list into `numMerges` NESTED
 * `replace()` calls — one codegen projection at the demonstrated 16
 * merges, but an expression tree LINEAR in vocabulary size: at a real
 * 32k-merge vocab it blows codegen's 64 KB method limit (the q91
 * lesson from r7) and, inside the `transform` HOF, costs 32k
 * interpreted `replace` evaluations per token. This kernel applies the
 * SAME fold through a broadcast merge-rank table with a FIXED-size
 * expression tree and per-token cost independent of vocabulary size.
 *
 * EXACT-EQUIVALENCE CONTRACT. The replace fold's semantics — for each
 * merge (l, r) in training order, one leftmost-non-overlapping literal
 * replace of `l SEP r` with `l r` over the symbol-joined string —
 * include the boundary-fusion artifact (a pattern's `l` may TAIL-MATCH
 * inside a previously fused symbol), and the committed oracles replay
 * exactly that. The kernel therefore simulates the fold, it does not
 * substitute textbook symbol-wise merging:
 *
 *  - a merge never changes the token's CHARS — replacing `l SEP r`
 *    with `lr` only deletes the separator. So the whole encode is a
 *    sequence of boundary deletions over a fixed char string;
 *  - an occurrence of `l SEP r` at boundary b (between chars b-1 and
 *    b) exists iff chars[b-|l|..b) == l, chars[b..b+|r|) == r, and no
 *    OTHER boundary lies strictly inside either span — so every
 *    occurrence any merge can ever match sits at a position derivable
 *    from the chars alone, boundary state only gates it;
 *  - `replace`'s left-to-right non-overlap rule ("resume after the
 *    replacement") maps to char coordinates as: the next match's
 *    l-start must be ≥ (previous match's boundary + |r|).
 *
 * So: enumerate all candidate (merge-rank, boundary) pairs by probing
 * the rank table with the token's substrings — O(len · maxPatternLen)
 * hash lookups, NO scan over the merge list — then sweep candidates in
 * (rank, boundary) order applying the three gates above. Equivalence
 * to the literal fold is property-pinned in BpeSpec against randomized
 * merge lists and tokens, tail-match fusions included.
 */
object BpeOps {

  /** Symbol separator (mirrors [[graft.operators.Bpe.Sep]]). */
  final val Sep: Char = '\u001F'

  /** Precompiled merge-rank table, broadcast to executors inside the
   *  serialized expression (merge-list-sized — the id-map posture of
   *  q129). Lookup structures rebuild lazily per JVM. */
  final class BpeCodec(val merges: Seq[(String, String)]) extends Serializable {
    private[BpeOps] val lefts: Array[String] = merges.map(_._1).toArray
    private[BpeOps] val rights: Array[String] = merges.map(_._2).toArray

    /** concat(l+r) → packed (lLen << 32 | rank) entries, rank asc. */
    @transient private[BpeOps] lazy val table: java.util.HashMap[String, Array[Long]] = {
      val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()
      var k = 0
      while (k < lefts.length) {
        val key = lefts(k) + rights(k)
        var b = m.get(key)
        if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty[Long]; m.put(key, b) }
        b += ((lefts(k).length.toLong << 32) | k.toLong)
        k += 1
      }
      val out = new java.util.HashMap[String, Array[Long]](m.size * 2)
      m.forEach((k, v) => out.put(k, v.toArray))
      out
    }

    @transient private[BpeOps] lazy val maxPatLen: Int =
      if (lefts.isEmpty) 0
      else { var mx = 0; var i = 0
        while (i < lefts.length) {
          val n = lefts(i).length + rights(i).length
          if (n > mx) mx = n; i += 1 }
        mx }

    // hashCode is cached and equals short-circuits on reference
    // identity: the per-task memo below keys a WeakHashMap on the
    // codec, and an O(|merges|) hash per encodeTokens CALL would tax
    // every row at 32k-merge scale
    private val hc: Int = merges.hashCode()
    override def equals(o: Any): Boolean = o match {
      case c: BpeCodec => (c eq this) || c.merges == merges
      case _ => false
    }
    override def hashCode(): Int = hc
  }

  /** Encode ONE token: returns its symbols joined by [[Sep]] — byte-
   *  identical to folding `replace(s, l+SEP+r, l+r)` over the merge
   *  list in order. */
  def encodeWord(w: String, codec: BpeCodec): String = {
    val L = w.length
    if (L <= 1 || codec.lefts.isEmpty) return w
    // boundary BEFORE char i (i in 1..L-1); all present initially
    val bnd = new Array[Boolean](L)
    java.util.Arrays.fill(bnd, 1, L, true)
    // ---- enumerate candidates: packed (rank << 20 | boundary).
    // L < 2^20 keeps the packing total-ordered by (rank, boundary);
    // alnum runs that long do not occur, but stay correct anyway via
    // the literal fold.
    if (L >= (1 << 20)) return foldLiteral(w, codec)
    val table = codec.table
    val maxPat = codec.maxPatLen
    var cands = new Array[Long](16)
    var nc = 0
    var start = 0
    while (start < L - 1) {
      val maxEnd = math.min(L, start + maxPat)
      var end = start + 2
      while (end <= maxEnd) {
        val hits = table.get(w.substring(start, end))
        if (hits != null) {
          var i = 0
          while (i < hits.length) {
            val lLen = (hits(i) >>> 32).toInt
            val rank = (hits(i) & 0xFFFFFFFFL).toInt
            val b = start + lLen
            if (b > start && b < end) {
              if (nc == cands.length)
                cands = java.util.Arrays.copyOf(cands, nc * 2)
              cands(nc) = (rank.toLong << 20) | b.toLong
              nc += 1
            }
            i += 1
          }
        }
        end += 1
      }
      start += 1
    }
    java.util.Arrays.sort(cands, 0, nc)
    // ---- sweep in (rank, boundary) order with the replace gates
    var i = 0
    var curRank = -1
    var resume = 0
    while (i < nc) {
      val rank = (cands(i) >>> 20).toInt
      val b = (cands(i) & 0xFFFFF).toInt
      if (rank != curRank) { curRank = rank; resume = 0 }
      if (bnd(b)) {
        val lLen = codec.lefts(rank).length
        val rLen = codec.rights(rank).length
        if (b - lLen >= resume) {
          var ok = true
          var j = b - lLen + 1
          while (ok && j < b) { if (bnd(j)) ok = false; j += 1 }
          j = b + 1
          while (ok && j < b + rLen) { if (bnd(j)) ok = false; j += 1 }
          if (ok) { bnd(b) = false; resume = b + rLen }
        }
      }
      i += 1
    }
    // ---- materialize the surviving boundaries
    val sb = new java.lang.StringBuilder(2 * L)
    var p = 0
    while (p < L) {
      if (p > 0 && bnd(p)) sb.append(Sep)
      sb.append(w.charAt(p))
      p += 1
    }
    sb.toString
  }

  /** The literal O(merges·len) fold — the safety net for tokens past
   *  the packing bound, and the spec's equivalence reference. */
  def foldLiteral(w: String, codec: BpeCodec): String = {
    var s = w.length match {
      case 0 | 1 => w
      case n =>
        val sb = new java.lang.StringBuilder(2 * n)
        var i = 0
        while (i < n) { if (i > 0) sb.append(Sep); sb.append(w.charAt(i)); i += 1 }
        sb.toString
    }
    var k = 0
    while (k < codec.lefts.length) {
      s = s.replace(codec.lefts(k) + Sep + codec.rights(k),
        codec.lefts(k) + codec.rights(k))
      k += 1
    }
    s
  }

  /** Per-THREAD encode memo, keyed by codec (round-13 optimization:
   *  the memo was per-call, so every document re-encoded its stop
   *  words — Zipfian corpora repeat most of their token mass across
   *  rows, and [[encodeWord]]'s candidate enumeration is ~100x a hash
   *  lookup). A ThreadLocal needs no synchronization on local[n]'s
   *  task threads; the WeakHashMap drops a codec's memo when its
   *  query's expressions are collected; the size cap bounds worst-case
   *  heap at ~a few MB per (thread, codec) on adversarial vocabularies
   *  while leaving real word distributions fully memoized. encodeWord
   *  is pure, so a memo hit is value-identical by construction. */
  private val MemoCap = 1 << 16
  private val memoTL: ThreadLocal[java.util.WeakHashMap[BpeCodec, java.util.HashMap[String, UTF8String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.WeakHashMap[BpeCodec, java.util.HashMap[String, UTF8String]]())

  /** Encode every token of `arr` (each element a `[a-z0-9]+` run);
   *  repeated tokens encode once via the per-thread memo. */
  def encodeTokens(arr: ArrayData, codec: BpeCodec): ArrayData = {
    val n = arr.numElements()
    val out = new Array[UTF8String](n)
    val memos = memoTL.get()
    var memo = memos.get(codec)
    if (memo == null) {
      memo = new java.util.HashMap[String, UTF8String]()
      memos.put(codec, memo)
    }
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).toString
      var enc = memo.get(w)
      if (enc == null) {
        enc = UTF8String.fromString(encodeWord(w, codec))
        if (memo.size < MemoCap) memo.put(w, enc)
      }
      out(i) = enc
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Byte-level alphabet render (see [[BpeMapBytes]]): every UTF-8
   *  byte of every element becomes the 2-byte encoding of U+0100+b. */
  def mapBytes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val b = arr.getUTF8String(i).getBytes
      val o = new Array[Byte](b.length * 2)
      var j = 0
      while (j < b.length) {
        val v = b(j) & 0xFF
        o(j * 2) = (0xC4 + (v >> 6)).toByte
        o(j * 2 + 1) = (0x80 | (v & 0x3F)).toByte
        j += 1
      }
      out(i) = UTF8String.fromBytes(o)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

/** `BpeEncodeTokens(array<string>) → array<string>` — each input token
 *  encoded to its SEP-joined BPE symbols under the codec's merge list
 *  (see [[BpeOps]]): the fixed-size-expression replacement for the
 *  per-merge nested `replace` fold. */
case class BpeEncodeTokens(child: Expression, codec: BpeOps.BpeCodec)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeOps.encodeTokens(input.asInstanceOf[ArrayData], codec)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec,
      classOf[BpeOps.BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.encodeTokens($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)
}

/** `BpeMapBytes(array<string>) → array<string>` — each element's
 *  UTF-8 BYTES rendered as mapped chars (byte b → U+0100+b), the
 *  byte-level alphabet of [[graft.operators.Bpe.trainBytes]]. One
 *  tight loop per document replacing the hex → regexp-pair-split →
 *  256-entry-literal-map-lookup chain, whose per-BYTE linear map
 *  scans measured as the byte-level rows' dominant cost. U+0100–
 *  U+01FF encode as exactly two UTF-8 bytes (0xC4+(b>>6),
 *  0x80|(b&0x3F)), so the output buffer is sized 2× input, no
 *  re-encoding pass. */
case class BpeMapBytes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeOps.mapBytes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.mapBytes($c);")
  override protected def withNewChildInternal(newChild: Expression): BpeMapBytes =
    copy(child = newChild)
}

object BpeExpressions {
  def encodeTokens(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeTokens(ColumnBridge.expression(c),
      new BpeOps.BpeCodec(merges)))

  def mapBytes(c: Column): Column =
    ColumnBridge.column(BpeMapBytes(ColumnBridge.expression(c)))
}
