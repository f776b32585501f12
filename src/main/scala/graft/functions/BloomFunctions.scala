package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Column bindings for Spark's own Bloom-filter expressions
 * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
 * behind runtime-filter injection). They are registered only in the
 * INTERNAL function registry, so plain SQL can't reach them; these
 * builders expose them through the same [[ColumnBridge]] every other
 * graft expression uses. The aggregate has mergeable partials (the
 * filter builds distributed, never collect-then-build), and the probe
 * is a codegen'd scalar predicate.
 */
object BloomFunctions {

  /** Aggregate a long column into a serialized Bloom filter sized for
   *  `expectedItems` at `numBits` bits. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(c), Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())

  /** `might_contain(filter, x)` — false ⇒ definitely absent. */
  def mightContain(filter: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter), ColumnBridge.expression(c)))
}
