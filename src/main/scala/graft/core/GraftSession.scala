package graft.core

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify/Bench/tests agree.
 *
 *  - `nanosAsLong`: earlier driver testdata generations carried
 *    TIMESTAMP(NANOS) parquet columns, which Spark's vectorized reader
 *    rejects by default; current generations write TIMESTAMP(MICROS)
 *    (read as TIMESTAMP_NTZ). Both normalize to the engine's
 *    epoch-micros BIGINT event-time contract in
 *    `Sources.withTsMicros`; the conf stays so nanos-era lakes still
 *    read. The reference treats the event timestamp as opaque
 *    (repacked verbatim, filter_math/math.c:239), so an integer
 *    carrier is semantically faithful.
 *  - UTC session TZ: deterministic timestamp rendering vs the oracle.
 *  - shuffle.partitions sized to local core count (the 200 default
 *    would fragment tiny local shuffles; on a real cluster this is
 *    superseded by AQE coalescing, which stays enabled).
 */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4 defaults ANSI on, which raises DIVIDE_BY_ZERO even for
      // doubles. The reference divides with no zero guard — IEEE-754
      // ±Inf/NaN propagate (math.c:212-215) — and C-style truncating
      // casts; non-ANSI is the faithful mode for the whole surface.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // ContextCleaner drains broadcast/shuffle/accumulator refs only
      // when driver GC collects them; on a heap far larger than the
      // working set (64 GB over sf1-sized data) GC simply never fires
      // and the backlog measurably strangles later queries (sf1
      // full-set run at 64 GB: q23 group-agg 32 s vs 0.8 s at 8 GB,
      // q22 6.3 s vs 0.3 s — same code, same data); the stock 30min
      // default never fires within a bench JVM's lifetime. The tick
      // is env-tunable because the OPPOSITE regime is also measured:
      // when the heap is sized TO the data (64 GB at sf10), natural
      // allocation pressure already drives GC — the cleaner rides it —
      // and a 1min explicit tick only adds concurrent-cycle CPU tax
      // on a busy 32-thread JVM (scattered 2-6x medians across the
      // sf10 sweep). Rule: 1min when heap >> data, stock when heap
      // tracks data.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "1min"))
      // NOTE (round-13, measured and REJECTED): a scan-parallelism
      // floor (spark.sql.files.minPartitionNum = cores +
      // openCostInBytes 64 KB) was tried to unserialize one-split
      // small-table scans (q86's posting stage ran 1 task / 7.6 s).
      // Single-query probes improved, but the FULL sf0.1 surface
      // regressed 190.9 -> 229.0 s: every tiny parquet read — state
      // segments, fixtures, shared-index sidecars, dozens per
      // streaming fold — fanned into up-to-32 scheduled tasks, and
      // the added scheduling overhead swamped the unlocked
      // parallelism (even a pure projection, q87, doubled; q86 itself
      // read 11.3 s isolated vs 8.1 before). Defaults stand; at
      // 100 TB splits are ≫ cores and the floor would be a no-op
      // anyway, so there is nothing to parameterize for production.

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
