package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Fixed-width Gram-matrix aggregation: fold quantized embedding rows
 * (`array<bigint>` of length `dim`) into the upper triangle of
 * Σ q·qᵀ as ONE `array<bigint>` of d(d+1)/2 exact sums.
 *
 * This replaces the explode formulation (one (i, j, p) struct row per
 * upper-triangle entry per vector — |corpus|·d(d+1)/2 rows through
 * Generate + hash-agg probing; measured 1.9 s at sf0.1, ≈ 1.25 G agg
 * rows at sf10) with O(1)-state aggregation: each map task folds its
 * slice into a local long[2080] (dense multiply-add, no per-entry
 * hashing), partial buffers merge elementwise, and the exchange
 * carries ONE 2080-long buffer per task — the [[SimTopK]] bounded-
 * state shape applied to a dense accumulator. Sums are exact BIGINT,
 * so the result is identical to the explode form entry-for-entry.
 *
 * `eval` returns an EMPTY array when no rows were folded, so a
 * zero-row corpus unwraps to zero output rows — matching the
 * all-pairs oracle on empty input.
 */
object GramAggregate {
  def gramSum(quantized: Column, dim: Int): Column =
    ColumnBridge.column(GramSum(ColumnBridge.expression(quantized), dim)
      .toAggregateExpression())
}

/** Dense accumulator: upper-triangle sums + a row-seen flag. */
private[graft] final class GramBuf(val dim: Int) {
  val sums = new Array[Long](dim * (dim + 1) / 2)
  var seen = false
}

case class GramSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuf] with UnaryLike[Expression] {
  require(dim >= 1, "gramSum requires dim >= 1")

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): GramBuf = new GramBuf(dim)

  override def update(buf: GramBuf, input: InternalRow): GramBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gramSum expects $dim components, got ${arr.numElements()}")
      // local copy: each component is re-read ~dim times below
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = arr.getLong(i); i += 1 }
      val s = buf.sums
      var idx = 0
      i = 0
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) { s(idx) += qi * q(j); idx += 1; j += 1 }
        i += 1
      }
      buf.seen = true
    }
    buf
  }

  override def merge(buf: GramBuf, other: GramBuf): GramBuf = {
    val a = buf.sums; val b = other.sums
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    buf.seen ||= other.seen
    buf
  }

  override def eval(buf: GramBuf): Any =
    if (!buf.seen) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(buf.sums)

  override def serialize(buf: GramBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(9 + 8 * buf.sums.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeBoolean(buf.seen)
    var i = 0
    while (i < buf.sums.length) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new GramBuf(in.readInt())
    buf.seen = in.readBoolean()
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSum =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_sum"
}
