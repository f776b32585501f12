package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/**
 * Deterministic sampling for training-data pipelines.
 *
 * Both operators key on a CONTENT hash (md5-derived [[Hashing.h60]]),
 * never on `rand()` or row position: the sample is a pure function of
 * the data, so it is identical across reruns, engines (DuckDB-oracle
 * verified), partitionings and cluster sizes — the property that makes
 * held-out splits and debug subsets trustworthy at 100 TB. Changing
 * `salt` draws an independent sample (e.g. train/val/test splits from
 * three salts).
 *
 * Scale posture: `hashSample` is a pure narrow filter (pushes below
 * everything Catalyst can move it past; no shuffle). `stratifiedCap`
 * selects winners with a bounded n-heap aggregation (map-side
 * partials; strata are typically FEW and HUGE, so a stratum-
 * partitioned rank window would sort each whole stratum on one
 * reducer) and keeps their rows via a broadcast-sized semi join —
 * the big side never sorts and never shuffles beyond the winner agg.
 */
object Sampling {

  private def splitHash(salt: String, key: Column): Column =
    Hashing.h60(concat(lit(salt), key.cast("string")))

  /** Keep a row iff h60(salt‖key) mod 10⁴ < rate·10⁴ — a deterministic
   *  Bernoulli(rate) sample with 0.01% rate granularity. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double,
      salt: String): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(splitHash(salt, keyCol) % 10000L < math.round(rate * 10000).toInt)
  }

  def hashSampleSqlPredicate(keyExpr: String, rate: Double, salt: String): String =
    s"${Hashing.h60Sql(s"'$salt' || CAST($keyExpr AS VARCHAR)")} % 10000 < ${math.round(rate * 10000)}"

  /** At most `n` rows per stratum, chosen in hash order (hash order ≡
   *  reshuffle-proof pseudo-random order; keyCol as tiebreak makes the
   *  pick total even under h60 ties — (hash, key) is unique per row,
   *  so the winner SET is identical to the rank-window formulation the
   *  oracle runs). Winners = k smallest (hash, key) pairs per stratum
   *  via [[graft.functions.TopKAggregate.longMinK]] (exact 64-bit
   *  compares; n×strata rows total), joined back broadcast-semi.
   *  `keyCol` must be integral (it rides the long tie slot). */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
      n: Int, salt: String): DataFrame = {
    val hashed = df.withColumn("__h", splitHash(salt, col(keyCol)))
    // winner columns are RENAMED before the join: both frames share a
    // lineage, and `hashed(c) === winners(c)` can silently resolve
    // both sides to the same attribute (Spark logs "trivially true
    // equals predicate") — here that was masked by (hash, key) being
    // globally unique, but a caller whose key repeats across strata
    // would get cross-stratum matches
    val winners = hashed
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopKAggregate.longMinK(
        col("__h"), col(keyCol).cast("long"), n).as("w"))
      .select(col(stratumCol).as("__ws"), explode(col("w")).as("e"))
      .select(col("__ws"), col("e.key").as("__wh"), col("e.tie").as("__wk"))
    hashed.join(
        broadcast(winners),
        col(stratumCol) === col("__ws") &&
          col("__h") === col("__wh") &&
          col(keyCol).cast("long") === col("__wk"),
        "left_semi")
      .drop("__h")
  }

  /** Epoch-weighted dataset mixing — the training-recipe primitive
   *  that turns per-source mixture weights into a materialized
   *  training set. `epochsCol` is the row's target repetition count
   *  (possibly fractional, possibly > 1: "2.6 epochs of wiki, 0.3 of
   *  crawl"): every row is emitted `floor(e)` times, plus one more
   *  iff h60(salt‖key) mod 10⁴ < frac(e)·10⁴ — so a source converges
   *  to EXACTLY its weight in expectation with 0.01%-granular,
   *  content-deterministic rounding (rerun/reshuffle/engine-stable,
   *  same property as [[hashSample]]; a fractional epoch keeps a
   *  hash-random SUBSET of the source, never a prefix). Output adds
   *  an `epoch` column (0-based copy index) so downstream shuffles
   *  can spread the copies and loaders can interleave by epoch.
   *
   *  Shape at 100 TB: one narrow projection + a 1→⌈e⌉ explode — no
   *  shuffle, no driver state; upsampling never materializes on one
   *  executor because copies ride the source partitioning. The
   *  epochs column typically arrives from a broadcast-joined
   *  per-source weight table (q93 derives it arithmetically).
   *
   *  All comparisons are integer (basis-points of an epoch): the one
   *  double op is `round(e·10⁴)`, absorbing the representation error
   *  of decimal weight literals identically in both engines. */
  def mixEpochs(df: DataFrame, epochsCol: Column, keyCol: Column,
      salt: String): DataFrame = {
    val bps = round(epochsCol * 10000).cast("long")
    val frac = pmod(bps, lit(10000L))
    val whole = ((bps - frac) / 10000).cast("long") // exact: numerator is a multiple
    val extra = when(splitHash(salt, keyCol) % 10000L < frac, 1L).otherwise(0L)
    df.withColumn("__copies", whole + extra)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(expr("sequence(0, __copies - 1)")))
      .drop("__copies")
  }

  /** Temperature-flattened source mixing at T = ½ (X89) — the
   *  multilingual/multi-source sampling schedule (the √-flattening of
   *  exponential-smoothing mixture weights, as in massively
   *  multilingual pretraining): target share p_s ∝ √n_s, so small
   *  sources are up-weighted and dominant ones down-weighted, then
   *  every row is emitted its source's epoch factor
   *  f_s = p_s·N/n_s = (r_s·N)/(n_s·S) times (r_s = ⌊√n_s⌋,
   *  S = Σ r_s) through the [[mixEpochs]] copies machinery.
   *
   *  Determinism contract: the whole weight chain is INTEGER —
   *  ⌊√n⌋ (sqrt of an integer-valued double is correctly rounded in
   *  every IEEE libm, floor is exact), integer sums, and ONE integral
   *  division to basis-points (`div`/`//`) — so both engines derive
   *  bit-identical rates from the data alone; the per-row accept is
   *  the h60 basis-point compare of [[hashSample]]. A general
   *  temperature composes by swapping the r_s expression, at the cost
   *  of pinning a pow() quantization; T = ½ needs none.
   *
   *  Shape at 100 TB: one tiny per-source count agg (map-side
   *  partial), a broadcast of the source→bps table (|sources| rows by
   *  definition), and the narrow 1→⌈f⌉ explode — no wide shuffle, no
   *  driver state. Output adds `epoch` (0-based copy index). */
  def mixTemperature(df: DataFrame, sourceCol: String, keyCol: String,
      salt: String): DataFrame =
    mixWithRates(df, sourceCol, keyCol, salt,
      counts => bpsForSources(counts))

  /** GENERAL-temperature source mixing (X89 extended, round-9 item
   *  6): target share p_s ∝ n_s^T for rational T = p/q — T = 0.7
   *  (p=7, q=10) is the published multilingual schedule; T = ½
   *  remains [[mixTemperature]]'s closed integer form. The flattening
   *  weight is [[powFp]]'s DETERMINISTIC fixed-point n^T: a 2⁻³⁰
   *  quantization whose every step is integer arithmetic or an IEEE
   *  operation with a correctly-rounded result contract (×, ÷2, √,
   *  compare) — no libm pow/log/exp anywhere, so Spark and the
   *  DuckDB oracle derive BIT-IDENTICAL rates from the data alone
   *  (the "pinned-pow quantization" trade the T=½ docstring named,
   *  paid with a pin both engines can actually honor). Rate chain and
   *  per-row accept are [[mixTemperature]]'s, with the weight R_s
   *  swapped in: bps_s = ⌊10⁴·R_s·N / (n_s·Σ R)⌋, exact BigInt. */
  def mixTemperatureRational(df: DataFrame, sourceCol: String,
      keyCol: String, salt: String, p: Int, q: Int): DataFrame =
    mixWithRates(df, sourceCol, keyCol, salt,
      counts => bpsForSourcesRational(counts, p, q))

  private def mixWithRates(df: DataFrame, sourceCol: String,
      keyCol: String, salt: String,
      rates: Seq[(String, Long)] => Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the per-source count table is |sources| rows BY DEFINITION —
    // collected driver-side (the codebook pattern) so the rate
    // arithmetic runs in exact BigInt: the naive in-plan form
    // 10000·r·N div (n·S) overflows Long around N ~ 10¹² rows (the
    // very scale the operator targets), and with ANSI off Spark would
    // WRAP where DuckDB raises — a silently dropped source and an
    // engine divergence in one bug
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .as[(String, Long)].collect().toSeq
    // a NULL source would silently vanish through the inner rate join
    // below (both engines agree, but the loss is invisible) — fail
    // loudly instead; callers route null-source rows explicitly
    require(counts.forall(_._1 != null),
      s"mixTemperature: NULL in source column '$sourceCol' " +
        s"(${counts.collectFirst { case (null, n) => n }.getOrElse(0L)} " +
        "rows) — null-source rows would be dropped silently; filter or " +
        "relabel them first")
    val wtable = broadcast(rates(counts).toSeq.toDF(sourceCol, "__bps"))
    val frac = pmod(col("__bps"), lit(10000L))
    df.join(wtable, Seq(sourceCol))
      .withColumn("__copies",
        ((col("__bps") - frac) / 10000).cast("long") +
          when(splitHash(salt, col(keyCol)) % 10000L < frac, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(expr("sequence(0, __copies - 1)")))
      .drop("__copies", "__bps")
  }

  /** Deterministic fixed-point ⌊n^(p/q)·2³⁰ + ½⌋-style weight —
   *  "style" because the SPEC is this exact algorithm, not the real
   *  power function (they differ by ~1e-9 relative, irrelevant to a
   *  sampling schedule; what matters is that BOTH engines compute the
   *  same integer). Construction:
   *   1. e = ⌊log2 n⌋ by bit position — integer-exact;
   *   2. 30 bits of frac(log2 n) by repeated squaring of the exact
   *      mantissa m = n/2^e ∈ [1,2): square (IEEE ×, deterministic),
   *      halve if ≥ 2 (exact), emit the bit;
   *   3. the target exponent ⌊p·(e·2³⁰+frac)/q⌋ — integer-exact;
   *   4. 2^frac' by binary exponentiation over the constants
   *      K_i = 2^(2⁻ⁱ) generated by ITERATED √2 (correctly-rounded
   *      sqrt is an IEEE-754 requirement both engines honor — this is
   *      what lets the constants exist without libm pow), ascending-i
   *      multiplication order;
   *   5. one exact 2^whole · 2³⁰ scale, +½, floor.
   *  Every double op is ×, ÷2, √ or compare — no transcendental
   *  whose last ulp could differ between engines. */
  private[graft] def powFp(n: Long, p: Int, q: Int, bits: Int = 30): Long = {
    require(n >= 1 && n < (1L << 53),
      s"powFp needs 1 <= n < 2^53 (doubles exact), got $n")
    require(p >= 1 && q >= 1 && p <= q,
      s"powFp is for flattening temperatures 0 < p/q <= 1, got $p/$q")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var m = n.toDouble / java.lang.Math.scalb(1.0, e) // exact: pow2 divide
    var acc = 0L
    var i = 0
    while (i < bits) {
      m = m * m
      acc <<= 1
      if (m >= 2.0) { m = m / 2.0; acc |= 1L }
      i += 1
    }
    val ltot = (e.toLong << bits) | acc      // ⌊log2(n)·2^bits⌋ (spec'd)
    val et = p.toLong * ltot / q             // ⌊T·log2(n)·2^bits⌋
    val whole = (et >> bits).toInt
    val fr = et & ((1L << bits) - 1)
    var r = 1.0
    var kk = 2.0
    i = 1
    while (i <= bits) {
      kk = math.sqrt(kk)                     // K_i = 2^(2^-i), iterated √
      if (((fr >> (bits - i)) & 1L) == 1L) r = r * kk
      i += 1
    }
    math.floor(r * java.lang.Math.scalb(1.0, whole)
      * java.lang.Math.scalb(1.0, bits) + 0.5).toLong
  }

  /** The general-T basis-point rate per source: [[bpsForSources]]'s
   *  exact BigInt chain with ⌊√n⌋ replaced by [[powFp]]'s fixed-point
   *  n^(p/q). Package-private for the 10¹²-magnitude overflow and
   *  golden-value specs. */
  private[graft] def bpsForSourcesRational(counts: Seq[(String, Long)],
      p: Int, q: Int): Map[String, Long] = {
    require(counts.nonEmpty, "at least one source")
    val r = counts.map { case (s, n) => s -> powFp(n, p, q) }.toMap
    val tn = counts.map(c => BigInt(c._2)).sum
    val ts = counts.map(c => BigInt(r(c._1))).sum
    counts.map { case (s, n) =>
      val bps = BigInt(10000) * r(s) * tn / (BigInt(n) * ts)
      require(bps.isValidLong,
        s"mixTemperatureRational rate overflow for source '$s': bps=$bps")
      s -> bps.toLong
    }.toMap
  }

  /** The T=½ basis-point rate per source, exact BigInt arithmetic:
   *  bps_s = ⌊10⁴·r_s·N / (n_s·S)⌋ with r = ⌊√n⌋. Exposed
   *  (package-private) so the overflow contract is unit-testable at
   *  synthetic 10¹²-row magnitudes. The RESULT must fit a Long —
   *  bps ≤ 10⁴·N/S, which only approaches 2⁶³ for corpora beyond any
   *  physical size — but it is require()d rather than assumed. */
  private[graft] def bpsForSources(counts: Seq[(String, Long)]): Map[String, Long] = {
    require(counts.nonEmpty, "at least one source")
    def isqrt(n: Long): Long = math.sqrt(n.toDouble).toLong
    val tn = counts.map(c => BigInt(c._2)).sum
    val ts = counts.map(c => BigInt(isqrt(c._2))).sum
    counts.map { case (s, n) =>
      val bps = BigInt(10000) * isqrt(n) * tn / (BigInt(n) * ts)
      require(bps.isValidLong,
        s"mixTemperature rate overflow for source '$s': bps=$bps")
      s -> bps.toLong
    }.toMap
  }

  /** DuckDB oracle twin: identical integer chain — ⌊√n⌋ weights,
   *  integral `//` to basis-points, h60 fractional accept,
   *  `unnest(range(copies))` epochs. (The oracle keeps the in-plan
   *  BIGINT form — DuckDB RAISES on overflow rather than wrapping,
   *  and oracle runs are small-SF by construction.) */
  def mixTemperatureSql(from: String, cols: Seq[String],
      sourceCol: String, keyExpr: String, salt: String): String = {
    val h = Hashing.h60Sql(s"'$salt' || CAST($keyExpr AS VARCHAR)")
    s"""SELECT ${cols.map(c => s"d.$c").mkString(", ")}, epoch FROM (
       |  SELECT d.*, unnest(range((w.bps // 10000) +
       |      (CASE WHEN $h % 10000 < w.bps % 10000 THEN 1 ELSE 0 END)))
       |    AS epoch
       |  FROM $from d JOIN (
       |    SELECT $sourceCol,
       |      (10000 * r * (SELECT CAST(sum(cnt) AS BIGINT) FROM (
       |         SELECT count(*) AS cnt FROM $from GROUP BY $sourceCol)))
       |      // (n * (SELECT CAST(sum(CAST(floor(sqrt(cnt)) AS BIGINT))
       |                    AS BIGINT) FROM (
       |         SELECT count(*) AS cnt FROM $from GROUP BY $sourceCol)))
       |      AS bps
       |    FROM (SELECT $sourceCol, CAST(count(*) AS BIGINT) AS n,
       |            CAST(floor(sqrt(count(*))) AS BIGINT) AS r
       |          FROM $from GROUP BY $sourceCol)
       |  ) w USING ($sourceCol)
       |) d""".stripMargin
  }

  /** DuckDB oracle twin of [[mixTemperatureRational]]: the IDENTICAL
   *  [[powFp]] algorithm spelled as two 30-step recursive CTEs —
   *  every arithmetic step carries an explicit DOUBLE cast (DuckDB's
   *  bare `1.0` is DECIMAL) and uses only integer ops, IEEE ×, ÷2, √
   *  and compares, so the rates are bit-identical to the Spark
   *  driver's (spot-checked over 71 magnitudes up to 10¹² during
   *  development; the q-row hash is the standing proof). The bps
   *  chain runs in HUGEINT — the 10⁴·R·N product passes 2⁶³ exactly
   *  where the Scala side's BigInt does. */
  def mixTemperatureRationalSql(from: String, cols: Seq[String],
      sourceCol: String, keyExpr: String, salt: String,
      p: Int, q: Int): String = {
    val h = Hashing.h60Sql(s"'$salt' || CAST($keyExpr AS VARCHAR)")
    s"""WITH RECURSIVE
       |src AS (SELECT $sourceCol AS s, CAST(count(*) AS BIGINT) AS n
       |        FROM $from GROUP BY 1),
       |ee AS (SELECT s, n, (SELECT max(i) FROM range(0, 63) t(i)
       |                     WHERE (1::BIGINT << CAST(i AS INT)) <= n) AS e
       |       FROM src),
       |lg AS (
       |  SELECT s, n, e, 0 AS i,
       |    CAST(n AS DOUBLE) / CAST(1::BIGINT << CAST(e AS INT) AS DOUBLE) AS m,
       |    0::BIGINT AS acc FROM ee
       |  UNION ALL
       |  SELECT s, n, e, i + 1,
       |    CASE WHEN m*m >= CAST(2 AS DOUBLE) THEN m*m/CAST(2 AS DOUBLE)
       |         ELSE m*m END,
       |    acc * 2 + CASE WHEN m*m >= CAST(2 AS DOUBLE) THEN 1 ELSE 0 END
       |  FROM lg WHERE i < 30),
       |lgf AS (SELECT s, n, ((CAST(e AS BIGINT) << 30) | acc) AS ltot
       |        FROM lg WHERE i = 30),
       |ett AS (SELECT s, n, ($p * ltot) // $q AS et FROM lgf),
       |ex AS (
       |  SELECT s, n, et >> 30 AS wh, et & 1073741823 AS fr, 0 AS i,
       |    CAST(1 AS DOUBLE) AS r, CAST(2 AS DOUBLE) AS kk FROM ett
       |  UNION ALL
       |  SELECT s, n, wh, fr, i + 1,
       |    CASE WHEN ((fr >> (30 - (i+1))) & 1) = 1 THEN r * sqrt(kk)
       |         ELSE r END,
       |    sqrt(kk)
       |  FROM ex WHERE i < 30),
       |rq AS (SELECT s, n,
       |    CAST(floor(r * CAST(1::BIGINT << CAST(wh AS INT) AS DOUBLE)
       |      * CAST(1073741824 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
       |      AS rr
       |  FROM ex WHERE i = 30),
       |w AS (SELECT s, CAST(
       |    (10000::HUGEINT * rr * (SELECT CAST(sum(n) AS HUGEINT) FROM src))
       |    // (CAST(n AS HUGEINT) * (SELECT CAST(sum(rr) AS HUGEINT) FROM rq))
       |    AS BIGINT) AS bps FROM rq)
       |SELECT ${cols.map(c => s"d.$c").mkString(", ")}, epoch FROM (
       |  SELECT d.*, unnest(range((w.bps // 10000) +
       |      (CASE WHEN $h % 10000 < w.bps % 10000 THEN 1 ELSE 0 END)))
       |    AS epoch
       |  FROM $from d JOIN w ON d.$sourceCol = w.s
       |) d""".stripMargin
  }

  /** DuckDB oracle twin: emits `SELECT <cols>, unnest(range(copies))
   *  AS epoch` over the same integer basis-point arithmetic
   *  (`range(0)` is empty, so zero-copy rows vanish exactly like the
   *  Spark filter). `epochsExpr`/`keyExpr` are SQL fragments over
   *  `from`'s columns. */
  def mixEpochsSql(from: String, cols: Seq[String], epochsExpr: String,
      keyExpr: String, salt: String): String = {
    val h = Hashing.h60Sql(s"'$salt' || CAST($keyExpr AS VARCHAR)")
    s"""SELECT ${cols.mkString(", ")}, unnest(range(copies)) AS epoch FROM (
       |  SELECT *, (bps // 10000) +
       |      (CASE WHEN $h % 10000 < bps % 10000 THEN 1 ELSE 0 END) AS copies
       |  FROM (SELECT *, CAST(round(($epochsExpr) * 10000) AS BIGINT) AS bps
       |        FROM $from)
       |)""".stripMargin
  }

  // -------------------------------------- deterministic global shuffle

  /** The seeded-order key [[deterministicShuffle]] sorts by: the 15
   *  hex chars of md5(salt‖key) (string sort ≡ numeric sort of the
   *  60-bit hash) with the zero-padded key appended as a tiebreak, so
   *  the key is UNIQUE per row even under h60 collisions — the
   *  contract [[Curation.withRunningTotal]] requires. `key` must
   *  stringify to a non-negative integer; the 19-digit pad covers the
   *  full Long range, and a violating key (negative, non-integer,
   *  wider) RAISES rather than silently degrading the uniqueness
   *  tiebreak via lpad truncation. */
  private def shuffleKey(salt: String, key: Column): Column = {
    val ks = when(key.cast("string").rlike("^[0-9]{1,19}$"), key.cast("string"))
      .otherwise(raise_error(concat(
        lit("deterministicShuffle key must stringify to a non-negative " +
          "integer of <= 19 digits, got: "), key.cast("string"))))
    concat(substring(md5(concat(lit(salt), ks)), 1, 15),
      lit("|"), lpad(ks, 19, "0"))
  }

  /** Deterministic global training-order shuffle: assign every row its
   *  0-based position in the seeded pseudo-random permutation of the
   *  corpus — the "shuffle the training set, reproducibly" step every
   *  pretraining run needs (data order is part of the training recipe;
   *  a rerun, a different cluster, or a different engine must produce
   *  the SAME order). The order is a pure function of (salt, key):
   *  content-deterministic like [[hashSample]], and a new salt draws an
   *  independent permutation per epoch.
   *
   *  Shape at 100 TB: `row_number() OVER (ORDER BY hash)` computes
   *  this on ONE reducer (a global order has a single window
   *  partition); this formulation never does — it range-exchanges on
   *  the hash key (the same exchange a global sort pays, uniform by
   *  construction because the leading 60 bits are a hash), then
   *  assigns positions with [[Curation.withRunningTotal]]'s
   *  O(partitions) driver offsets. Emitting (key, position) rather
   *  than reordered rows lets the loader join or bucket-write by
   *  `pos` without moving document payloads through the sort.
   *  Output: (key, pos), pos ∈ [0, n). */
  def deterministicShuffle(df: DataFrame, keyCol: String,
      salt: String): DataFrame =
    Curation.withRunningTotal(
        df.select(col(keyCol), shuffleKey(salt, col(keyCol)).as("__sk"),
          lit(1L).as("__one")),
        "__sk", "__one", "pos")
      .select(col(keyCol), col("pos"))

  /** DuckDB oracle twin: the one-reducer window formulation this
   *  operator exists to avoid is CORRECT at oracle scale — same key,
   *  same order, `row_number() − 1`. */
  def deterministicShuffleSql(from: String, keyExpr: String,
      salt: String): String = {
    val k = s"substr(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 15) " +
      s"|| '|' || lpad(CAST($keyExpr AS VARCHAR), 19, '0')"
    s"""SELECT $keyExpr, CAST(row_number() OVER (ORDER BY $k) - 1 AS BIGINT)
       |    AS pos
       |FROM $from""".stripMargin
  }

  // ------------------------------------------------ training shards

  /** Contiguous-range shard assignment over the seeded permutation:
   *  `shard = ⌊pos · shards / n⌋` — shard sizes differ by at most one,
   *  each shard is a contiguous slice of the shuffled order, and the
   *  whole assignment is a pure function of (salt, key, shards) — the
   *  step that turns a shuffled corpus into the fixed shard files a
   *  training run streams. Returns (key, pos, shard).
   *
   *  Shape at 100 TB: [[deterministicShuffle]]'s one range exchange;
   *  the shard id is a narrow integer projection on top (n comes from
   *  the already-materialized position frame — a metadata-cheap
   *  count, no extra corpus scan). A writer then partitions output
   *  by `shard` and range-writes each slice. */
  def shardAssign(df: DataFrame, keyCol: String, salt: String,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val pos = deterministicShuffle(df, keyCol, salt)
    val n = pos.count()
    pos.select(col(keyCol), col("pos"),
      expr(s"(pos * $shards) div ${math.max(n, 1L)}").as("shard"))
  }

  /** Per-shard manifest: doc count, payload weight, and the position
   *  range each shard covers — the sidecar a loader reads to plan a
   *  run without opening shards. `weightCol` is any integral payload
   *  measure on `df` (chars, tokens, bytes). The weight join is on
   *  the shuffle key (skinny assignment frame ⋈ (key, weight)); at
   *  scale both sides hash-partition on the key, or the assignment
   *  broadcasts when it fits. */
  def shardManifest(df: DataFrame, keyCol: String, weightCol: String,
      salt: String, shards: Int): DataFrame =
    shardAssign(df, keyCol, salt, shards)
      .join(df.select(col(keyCol), col(weightCol)), Seq(keyCol))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("sum_weight"),
        min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))

  /** DuckDB oracle twin of [[shardManifest]] (window-formulated
   *  positions, same integer shard arithmetic). */
  def shardManifestSql(from: String, keyExpr: String, weightExpr: String,
      salt: String, shards: Int): String =
    s"""SELECT (pos * $shards) // c AS shard, count(*) AS n_docs,
       |  CAST(sum(w) AS BIGINT) AS sum_weight,
       |  min(pos) AS min_pos, max(pos) AS max_pos
       |FROM (SELECT pos, $weightExpr AS w FROM (
       |        SELECT *, CAST(row_number() OVER (ORDER BY
       |          substr(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 15)
       |          || '|' || lpad(CAST($keyExpr AS VARCHAR), 19, '0')) - 1
       |          AS BIGINT) AS pos
       |        FROM $from)),
       |  (SELECT count(*) AS c FROM $from)
       |GROUP BY 1""".stripMargin
}
