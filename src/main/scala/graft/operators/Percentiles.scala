package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Exact interpolated per-group percentiles (`quantile_cont` semantics)
 * by DISTRIBUTED SELECTION — the formulation for FEW, HUGE groups.
 *
 * Why not a window: `row_number() OVER (PARTITION BY g ORDER BY v)`
 * hash-partitions by `g`, so each group lands on ONE reducer in its
 * entirety — with 3 groups over 100 TB that is three 33 TB sorts on
 * three machines (the q37 shape: percentiles of a metric per a
 * low-cardinality flag). Selection never co-locates a group:
 *
 *  1. ONE range exchange on `(g, v)` + per-partition sort — every
 *     partition holds a contiguous slice of one-or-few groups, the
 *     sort is partition-local, and partition sizes are balanced by
 *     sampling regardless of group skew;
 *  2. per-(partition, group) counts collect to the driver — range
 *     contiguity bounds this at partitions + groups entries — and
 *     prefix-sum into global start offsets per partition;
 *  3. a second narrow pass emits ONLY the rows whose global rank is a
 *     percentile target (≤ 2×|ps| rows per group); interpolation runs
 *     on the driver over that handful.
 *
 * The group count must be driver-bounded (that is what "few, huge
 * groups" means); for MANY small groups the window formulation is
 * right and stays available — each group fits a partition there.
 *
 * Values run through `cast(double)` before ranking, and the
 * interpolation `lo·(⌈rn⌉−rn) + hi·(rn−⌊rn⌋)` with `rn = p·(n−1)`
 * reproduces DuckDB's `quantile_cont` bit-for-bit (the same
 * expression shape the oracle-green window formulation used).
 * Determinism: ranks are exact from actual counts, so the result is
 * invariant to partitioning; ties in `v` share the value either rank
 * would select.
 */
object Percentiles {

  /** @param ps (output column name, percentile in [0,1]) pairs. */
  def exactByGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p0 = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // NULL values are ignored, matching quantile_cont / percentile
    // semantics — without this they'd sort first, count toward n, and
    // unbox to 0.0 on a target rank
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
    val sorted = base.repartitionByRange(p0, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .persist(MEMORY_AND_DISK) // two passes: counts, then selection
    try {
      // pass 1: contiguous per-(partition, group) run lengths
      val runCounts: Array[((Int, Any), Long)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
          it.foreach { r => val g = r.get(0); m.update(g, m.getOrElse(g, 0L) + 1L) }
          m.iterator.map { case (g, c) => ((pid, g), c) }
        }.collect()
      val ns: Map[Any, Long] = runCounts.groupBy(_._1._2)
        .map { case (g, arr) => g -> arr.map(_._2).sum }
      // global start offset of each partition's run of each group
      val offsets: Map[(Int, Any), Long] = runCounts.groupBy(_._1._2)
        .flatMap { case (g, arr) =>
          var acc = 0L
          arr.sortBy(_._1._1).map { case ((pid, _), c) =>
            val entry = ((pid, g), acc); acc += c; entry
          }
        }
      val targets: Map[Any, Set[Long]] = ns.map { case (g, n) =>
        g -> ps.flatMap { case (_, p) =>
          val rn = p * (n - 1).toDouble
          Seq(math.floor(rn).toLong, math.ceil(rn).toLong)
        }.toSet
      }
      val bOff = spark.sparkContext.broadcast(offsets)
      val bTgt = spark.sparkContext.broadcast(targets)
      // pass 2: emit only target-rank rows (≤ 2·|ps| per group)
      val selected: Map[(Any, Long), Double] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val next = scala.collection.mutable.HashMap.empty[Any, Long]
          it.flatMap { r =>
            val g = r.get(0)
            val rank = next.getOrElse(g, bOff.value.getOrElse((pid, g), 0L))
            next(g) = rank + 1
            if (bTgt.value.getOrElse(g, Set.empty).contains(rank))
              Iterator.single((g, rank, r.getDouble(1)))
            else Iterator.empty
          }
        }.collect().map { case (g, r, v) => (g, r) -> v }.toMap
      val rows: Seq[Row] = ns.keys.toSeq.map { g =>
        val n = ns(g)
        val vals = ps.map { case (_, p) =>
          val rn = p * (n - 1).toDouble
          val lo = selected((g, math.floor(rn).toLong))
          val hi = selected((g, math.ceil(rn).toLong))
          if (math.floor(rn) == math.ceil(rn)) lo
          else lo * (math.ceil(rn) - rn) + hi * (rn - math.floor(rn))
        }
        Row.fromSeq(g +: vals)
      }
      val schema = StructType(
        StructField(groupCol, base.schema.head.dataType, nullable = true) +:
          ps.map { case (name, _) => StructField(name, DoubleType, nullable = true) })
      spark.createDataFrame(rows.asJava, schema)
    } finally { sorted.unpersist(); () }
  }
}
