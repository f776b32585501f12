package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregation for similarity search.
 *
 * `simTopK(sim, id, k)` groups to an array of the k best `(sim, n_id)`
 * pairs ordered by `(sim DESC, n_id ASC)` — exactly the
 * `row_number() OVER (PARTITION BY q ORDER BY sim DESC, id) <= k`
 * window contract, but with aggregation instead of a window:
 *
 *  - per-group state is a k-sized heap, O(k) regardless of corpus
 *    size (the window formulation shuffled EVERY scored row —
 *    |corpus|×|queries| — to the rank exchange and sorted it);
 *  - partial aggregation applies: each map task reduces its slice to
 *    ≤ k entries per query BEFORE the exchange, so the shuffle
 *    carries at most k × maps × queries rows' worth of heap bytes;
 *  - determinism: `n_id` is unique within a group, so the
 *    (sim DESC, n_id ASC) order is total — heap insertion order
 *    cannot change the result. Double comparison is
 *    `java.lang.Double.compare` (NaN greatest — Spark's and DuckDB's
 *    DESC-first behavior; the search norms are nonzero so NaN never
 *    arises in the shipped queries).
 *
 * Unwrap with `posexplode` → `rank = pos + 1`.
 */
object TopKAggregate {
  def simTopK(sim: Column, id: Column, k: Int): Column =
    ColumnBridge.column(SimTopK(ColumnBridge.expression(sim),
      ColumnBridge.expression(id), k).toAggregateExpression())

  def longMinK(key: Column, tie: Column, k: Int): Column =
    ColumnBridge.column(LongMinK(ColumnBridge.expression(key),
      ColumnBridge.expression(tie), k).toAggregateExpression())
}

/** Heap buffer: worst entry on top so inserts evict in O(log k). */
private[graft] final class TopKBuf(val k: Int) {
  // worse-first: lower sim first; on ties HIGHER id first (it loses
  // to the same-sim lower id under the (sim DESC, id ASC) contract)
  val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(sim: Double, id: Long): Unit = {
    if (heap.size < k) { heap.add((sim, id)); () }
    else {
      val worst = heap.peek()
      val better = java.lang.Double.compare(sim, worst._1) match {
        case 0 => id < worst._2
        case c => c > 0
      }
      if (better) { heap.poll(); heap.add((sim, id)); () }
    }
  }

  /** Entries best-first: (sim DESC, id ASC). */
  def sorted: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    java.util.Arrays.sort(arr, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    arr
  }
}

case class SimTopK(
    simExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {
  require(k > 0, "simTopK requires k > 0")

  override def left: Expression = simExpr
  override def right: Expression = idExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("n_id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = simExpr.eval(input)
    val n = idExpr.eval(input)
    if (s != null && n != null)
      buf.add(s.asInstanceOf[Double], n.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); buf.add(e._1, e._2) }
    buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.sorted.map { case (s, n) =>
      new GenericInternalRow(Array[Any](s, n)): Any
    })

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buf.heap.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e._1)
      out.writeLong(e._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuf(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimTopK =
    copy(simExpr = newLeft, idExpr = newRight)
  override def prettyName: String = "graft_sim_top_k"
}

/** Max-heap buffer for the k SMALLEST (key, tie) long pairs — exact
 *  64-bit comparisons (a double-keyed heap would lose bits past 2⁵³,
 *  which matters for 60-bit hash order). Worst (largest) pair on top. */
private[graft] final class MinKBuf(val k: Int) {
  val heap = new java.util.PriorityQueue[(Long, Long)](
    math.max(k, 1),
    (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(key: Long, tie: Long): Unit = {
    if (heap.size < k) { heap.add((key, tie)); () }
    else {
      val worst = heap.peek()
      val better = java.lang.Long.compare(key, worst._1) match {
        case 0 => tie < worst._2
        case c => c < 0
      }
      if (better) { heap.poll(); heap.add((key, tie)); () }
    }
  }

  /** Entries smallest-first: (key ASC, tie ASC). */
  def sorted: Array[(Long, Long)] = {
    val arr = heap.toArray(new Array[(Long, Long)](heap.size))
    java.util.Arrays.sort(arr, (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    arr
  }
}

/** `longMinK(key, tie, k)` → the k smallest (key, tie) pairs per
 *  group, ordered (key ASC, tie ASC) — the bounded-state twin of
 *  `row_number() OVER (ORDER BY key, tie) <= k` for LONG sort keys.
 *  Same partial-aggregation shape as [[SimTopK]]: each map task
 *  reduces to ≤ k pairs before the exchange. */
case class LongMinK(
    keyExpr: Expression,
    tieExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuf] with BinaryLike[Expression] {
  require(k > 0, "longMinK requires k > 0")

  override def left: Expression = keyExpr
  override def right: Expression = tieExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("tie", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MinKBuf = new MinKBuf(k)

  override def update(buf: MinKBuf, input: InternalRow): MinKBuf = {
    val key = keyExpr.eval(input)
    val tie = tieExpr.eval(input)
    if (key != null && tie != null)
      buf.add(key.asInstanceOf[Long], tie.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKBuf, other: MinKBuf): MinKBuf = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); buf.add(e._1, e._2) }
    buf
  }

  override def eval(buf: MinKBuf): Any =
    new GenericArrayData(buf.sorted.map { case (key, tie) =>
      new GenericInternalRow(Array[Any](key, tie)): Any
    })

  override def serialize(buf: MinKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buf.heap.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e._1)
      out.writeLong(e._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MinKBuf(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongMinK =
    copy(keyExpr = newLeft, tieExpr = newRight)
  override def prettyName: String = "graft_long_min_k"
}
