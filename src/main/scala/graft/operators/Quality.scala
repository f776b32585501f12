package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality gates (SURVEY §2.5 X54/X55) — the dbt-test /
 * Great-Expectations primitives a production ingest pipeline runs
 * before promoting a batch: declarative rules evaluated in ONE scan,
 * and a per-column profile (the ANALYZE TABLE shape).
 *
 * Scale posture: every rule compiles to a conditional partial
 * aggregate inside the same HashAggregate — adding a rule adds one
 * agg expression, never a scan or a shuffle. The only exceptions are
 * uniqueness / distinct counts, which genuinely require a distinct
 * hash aggregation; Spark plans the mixed distinct/non-distinct agg
 * through one Expand + two-stage aggregate (still a single scan).
 * The result is a handful of rows (rules or columns), so gating
 * logic (`fail if violations > 0`) is driver-trivial.
 */
object Quality {

  /** One declarative expectation. `name` keys the output row;
   *  `violations` is an aggregate expression counting offending rows
   *  (never null — coalesced to 0 on empty input). */
  sealed abstract class Rule(val name: String) {
    def violations: Column
    protected def cnt(bad: Column): Column =
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L))
  }

  /** NULL is a violation. */
  final case class NotNull(c: String) extends Rule(s"not_null:$c") {
    def violations: Column = cnt(col(c).isNull)
  }

  /** Non-null value outside [lo, hi] is a violation (NULLs pass —
   *  compose with [[NotNull]] to also reject those). */
  final case class InRange(c: String, lo: Double, hi: Double)
      extends Rule(s"in_range:$c:[$lo,$hi]") {
    def violations: Column =
      cnt(col(c).isNotNull && (col(c) < lo || col(c) > hi))
  }

  /** Non-null value outside the accepted set is a violation. */
  final case class Accepted(c: String, vals: Seq[String])
      extends Rule(s"accepted:$c") {
    def violations: Column =
      cnt(col(c).isNotNull && !col(c).isin(vals: _*))
  }

  /** Non-null value NOT matching `pattern` is a violation. Keep
   *  patterns in the Java∩RE2 subset if an oracle must mirror them. */
  final case class Matches(c: String, pattern: String)
      extends Rule(s"matches:$c") {
    def violations: Column = cnt(col(c).isNotNull && !col(c).rlike(pattern))
  }

  /** Duplicate rows on the key are violations: rows with a FULLY
   *  non-null key, minus distinct keys. Rows with any NULL key
   *  component are excluded from both sides (SQL COUNT(DISTINCT)
   *  skips them; counting them against a distinct count that ignores
   *  them would flag unique rows as duplicates) — compose with
   *  [[NotNull]] to reject null keys themselves. */
  final case class Unique(cols: Seq[String])
      extends Rule(s"unique:${cols.mkString(",")}") {
    def violations: Column =
      cnt(cols.map(col(_).isNotNull).reduce(_ && _)) -
        countDistinct(col(cols.head), cols.tail.map(col): _*)
  }

  /** Evaluate every rule in one aggregate pass over one scan and
   *  return (rule, violations) rows — the batch-promotion gate.
   *
   *  The unpivot is built from Column expressions with `lit()` rule
   *  names — never by interpolating names into SQL text, so a rule
   *  over a column whose name carries quotes/backticks/dots unpivots
   *  correctly instead of breaking the parse (rule BODIES reference
   *  columns through standard `col()` resolution, where dotted names
   *  mean nested fields as everywhere in Spark). */
  def expectations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val wide = df.agg(
      rules.head.violations.as("r0"),
      rules.tail.zipWithIndex.map { case (r, i) =>
        r.violations.as(s"r${i + 1}") }: _*)
    wide.select(stack(
      lit(rules.size) +:
        rules.zipWithIndex.flatMap { case (r, i) =>
          Seq(lit(r.name), col(s"r$i")) }: _*)
      .as(Seq("rule", "violations")))
  }

  /** Attach the rules as an `observe` metric set instead of a
   *  separate aggregation job: violation counts materialize as
   *  observation metrics per ACTION (batch) or per MICRO-BATCH
   *  (streaming, via `StreamingQueryListener` progress events)
   *  riding the existing job — zero extra scans, zero plan change.
   *  This is the shape for CONTINUOUS quality monitoring on an
   *  ingest stream, where a second expectations() pass per batch
   *  would double the read. Distinct-based rules ([[Unique]]) are
   *  not expressible as observation metrics (Spark rejects distinct
   *  aggregates there) — run those through [[expectations]] on the
   *  promoted batch instead. */
  def observed(df: DataFrame, rules: Seq[Rule],
      name: String = "graft_quality"): DataFrame = {
    observable(rules)
    df.observe(name, rules.head.violations.as(rules.head.name),
      rules.tail.map(r => r.violations.as(r.name)): _*)
  }

  /** Batch-side variant binding an [[org.apache.spark.sql.Observation]]
   *  handle: `obs.get` blocks until the first action and returns the
   *  rule-name → violation-count map. */
  def observed(df: DataFrame, rules: Seq[Rule],
      obs: org.apache.spark.sql.Observation): DataFrame = {
    observable(rules)
    df.observe(obs, rules.head.violations.as(rules.head.name),
      rules.tail.map(r => r.violations.as(r.name)): _*)
  }

  private def observable(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "at least one rule")
    require(!rules.exists(_.isInstanceOf[Unique]),
      "Unique needs a distinct aggregate — not observable; use expectations()")
  }

  /** Per-column profile of numeric columns — rows of
   *  (col_name, n, n_null, n_distinct, min_d, max_d), one
   *  SINGLE-distinct aggregation per column, unioned in one action.
   *  A multi-column-distinct one-scan form would plan through Expand
   *  (rows × (columns+1) with mostly-null shadows — allocation-heavy
   *  and GC-sensitive: the r8 drift investigation measured its
   *  medians inflating ~60% under memory pressure); per-column scans
   *  read ONE pruned parquet column each and keep the partial-distinct
   *  two-phase plan, so total bytes read are identical and no row is
   *  ever widened. SCOPE of that claim: it holds for column-prunable
   *  scans (parquet/ORC — this engine's lake contract). A frame with
   *  an EXPENSIVE upstream plan (joins, aggregations, generators,
   *  ScalaUDF projections, csv/json inference) instead profiles in
   *  ONE aggregation pass: a single agg carrying every column's five
   *  statistics (the multi-distinct rewrite plans through Expand —
   *  rows × (distinct-columns+1) shadows), then a driver-free
   *  unpivot. Upstream cost is paid exactly once (spec-pinned with an
   *  execution-count accumulator) and NOTHING is pinned: the round-9
   *  sf10 sweep measured eager localCheckpoint blocks bypassing
   *  CacheManager and accumulating until driver GC (SCALE.md
   *  residency rule), so the Expand widening — confined here to the
   *  expensive-upstream case, where upstream cost dominates it — is
   *  the right trade. Bare scans keep the direct per-column plan: a
   *  checkpoint or Expand there would widen/rewrite the table for no
   *  saved work — strictly worse than N pruned column reads.
   *  Labels are lit()-built, so a column named with
   *  dots, quotes or backticks labels its row verbatim instead of
   *  breaking a parse. min/max are raw parquet values cast to double:
   *  no arithmetic, so they match any engine bit-for-bit. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    if (bareScan(df.queryExecution.analyzed))
      cols.map { c =>
        df.select(col(c).as("__v"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(when(col("__v").isNull, 1L).otherwise(0L)), lit(0L))
              .as("n_null"),
            countDistinct(col("__v")).as("n_distinct"),
            min(col("__v").cast("double")).as("min_d"),
            max(col("__v").cast("double")).as("max_d"))
          .select(lit(c).as("col_name"), col("n"), col("n_null"),
            col("n_distinct"), col("min_d"), col("max_d"))
      }.reduce(_ unionAll _)
    else {
      // one pass, zero residency: every column's stats in one agg,
      // then a stack() unpivot back to (col_name, ...) rows
      val wide = df.agg(
        count(lit(1)).as("__n"),
        cols.zipWithIndex.flatMap { case (c, i) => Seq(
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"__null$i"),
          countDistinct(col(c)).as(s"__dist$i"),
          min(col(c).cast("double")).as(s"__min$i"),
          max(col(c).cast("double")).as(s"__max$i")) }: _*)
      wide.select(stack(
        lit(cols.size) +: cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(lit(c), col("__n"), col(s"__null$i"), col(s"__dist$i"),
            col(s"__min$i"), col(s"__max$i")) }: _*)
        .as(Seq("col_name", "n", "n_null", "n_distinct", "min_d", "max_d")))
    }
  }

  /** Is this analyzed plan a BARE column-prunable scan — nothing but
   *  narrow per-row nodes (project/filter/alias/limit) over a single
   *  relation? Matched by node class name so the check tracks any
   *  relation flavor (v1 LogicalRelation, v2 DataSourceV2*Relation,
   *  LocalRelation, a checkpointed LogicalRDD, a cached
   *  InMemoryRelation — all cheap to re-read). Anything else (join,
   *  aggregate, generate, window, union, SQL over csv/json) takes the
   *  single-pass path, as does a Project/Filter whose EXPRESSIONS
   *  carry user code (ScalaUDF / PythonUDF) — a UDF over a scan is
   *  arbitrarily expensive per row, so re-running it once per column
   *  would break the pay-once contract. Built-in functions (including
   *  ones that compile to StaticInvoke internally) stay bare: they
   *  are per-row codegen'd compute, cheaper to repeat over a pruned
   *  column than to widen every row through Expand. */
  private def bareScan(plan: org.apache.spark.sql.catalyst.plans
      .logical.LogicalPlan): Boolean = {
    val cheap = Set("Project", "Filter", "SubqueryAlias", "GlobalLimit",
      "LocalLimit", "View", "LogicalRelation", "DataSourceV2Relation",
      "DataSourceV2ScanRelation", "StreamingRelationV2", "LocalRelation",
      "LogicalRDD", "InMemoryRelation", "OneRowRelation")
    val userCode = Set("ScalaUDF", "PythonUDF")
    plan.collect { case n => n }.forall { n =>
      cheap.contains(n.getClass.getSimpleName) &&
        !n.expressions.exists(_.exists(e =>
          userCode.contains(e.getClass.getSimpleName)))
    }
  }

  /** Unigram language-model quality score (the CCNet/Gopher "LM
   *  filter" shape): score every document by the mean corpus
   *  frequency of its tokens, low scores = rare-token-heavy docs
   *  (boilerplate, code dumps, mojibake) that an LM-perplexity
   *  filter would also flag. The per-token weight is the DECIMAL
   *  DIGIT COUNT of the token's corpus count — i.e. ⌊log₁₀ n⌋+1, a
   *  log-frequency bucketed surprisal computed in pure integer/string
   *  ops so the score is bit-identical cross-engine (a float `ln`
   *  here would hostage the oracle hash to libm rounding; a
   *  production deployment can swap in `ln(n/total)` — the plan shape
   *  is unchanged). Output: (id, n_tokens, mean_logfreq_micro) where
   *  mean_logfreq_micro = ⌊10⁶·Σ tf·digits(n) / Σ tf⌋.
   *
   *  Shape at 100 TB: ONE corpus text scan through the fused
   *  [[graft.functions.HashExpressions.tokenFrequencies]] kernel
   *  (per-doc distinct (token, count) pairs — the explode carries one
   *  row per distinct token per doc, not per instance), persisted
   *  because it feeds both the unigram table (hash agg on token) and
   *  the scoring join; the unigram table is vocab-sized and
   *  materializable exactly like the q83 retrieval lexicon when the
   *  corpus is static. The scoring join is a standard posting join on
   *  the token key; the final agg folds back to one row per doc. */
  def unigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // NO materialization of the token frame — the fused kernel runs
    // twice (once into the unigram agg, once into the scoring join)
    // and nothing is pinned. Measured verdict (round-9 q94 controls,
    // BASELINE.md): the MEMORY_AND_DISK persist was the bench's drift
    // source (0.57 s median with 4.8–6.1 s cache-fill maxes at
    // sf0.1); an eager localCheckpoint fixed the cliff isolated but
    // its blocks bypass CacheManager — in a many-query session they
    // accumulate until driver GC (the sf10 sweep measured repeats
    // CLIMBING under exactly that pressure). Tokenize-twice measured
    // within noise of both (0.52 s median / 1.2 max) with ZERO
    // residency — and at 100 TB, rescanning the text column beats
    // materializing a token-level frame ~5× its size. */
    def tf = docs.select(col(idCol), explode(
        graft.functions.HashExpressions.tokenFrequencies(col(textCol)))
        .as("tf"))
      .select(col(idCol), col("tf.t").as("t"), col("tf.n").as("n"))
    val uni = tf.groupBy(col("t")).agg(sum(col("n")).as("cnt"))
    tf.join(uni, Seq("t"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * length(col("cnt").cast("string"))).as("__num"))
      .select(col(idCol), col("n_tokens"),
        expr("(__num * 1000000) div n_tokens").as("mean_logfreq_micro"))
  }

  /** DuckDB oracle twin: same tokenization (lowered whitespace split,
   *  empties dropped — the [[graft.functions.HashExpressions.tokenFrequencies]]
   *  contract), same digit-count weight via VARCHAR length, same
   *  integer micro-unit floor. */
  def unigramSurprisalSql(table: String, idCol: String,
      textExpr: String): String = {
    val toks = graft.functions.TextFunctions.lowerTokensSql(textExpr)
    s"""WITH tok AS (
       |  SELECT $idCol, t, count(*) AS n FROM (
       |    SELECT $idCol, unnest($toks) AS t FROM $table)
       |  WHERE t <> '' GROUP BY 1, 2),
       |uni AS (SELECT t, CAST(sum(n) AS BIGINT) AS cnt FROM tok GROUP BY 1)
       |SELECT $idCol, CAST(sum(n) AS BIGINT) AS n_tokens,
       |  CAST((sum(n * length(CAST(cnt AS VARCHAR))) * 1000000) // sum(n)
       |    AS BIGINT) AS mean_logfreq_micro
       |FROM tok JOIN uni USING (t) GROUP BY $idCol""".stripMargin
  }

  /** Model-based quality score, the fastText/CCNet linear-classifier
   *  shape: score = mean over the doc's tokens of a weight looked up
   *  by HASHED feature bucket — the "hashing trick" (Weinberger et
   *  al. 2009) that lets a classifier with a fixed-width weight
   *  vector score an unbounded vocabulary. Here the weight table is
   *  DERIVED (weight(b) = h60(salt‖b) mod 2001 − 1000 ∈ [−1000,
   *  1000]) so both engines reconstruct it arithmetically; a real
   *  deployment broadcasts trained weights as a `buckets`-row map —
   *  the plan is identical because the lookup is per-token compute,
   *  not a join.
   *
   *  Shape at 100 TB: ONE narrow codegen projection — the fused
   *  [[graft.functions.HashExpressions.tokenFrequencies]] kernel
   *  folds each doc to distinct (token, count) pairs (the weight is
   *  hashed once per DISTINCT token, not per occurrence), and two
   *  `aggregate` higher-order folds produce Σ tf·w and Σ tf without
   *  an explode, a shuffle, or a driver round-trip. All arithmetic
   *  before the final division is exact BIGINT; the division itself
   *  is one IEEE double op on integers ≪ 2⁵³ (exactly representable),
   *  so the score is bit-identical cross-engine. Output: (id, n_tok,
   *  score), score NULL for token-free docs. */
  def hashedClassifierScore(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, salt: String): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def weight(t: Column): Column =
      graft.functions.Hashing.h60(concat(lit(salt + "|"),
        (graft.functions.Hashing.h60(t) % buckets).cast("string"))) %
        2001L - 1000L
    docs.select(col(idCol),
        graft.functions.HashExpressions.tokenFrequencies(col(textCol))
          .as("__tf"))
      .select(col(idCol),
        aggregate(transform(col("__tf"), x => x.getField("n")),
          lit(0L), (a, b) => a + b).as("n_tok"),
        aggregate(
          transform(col("__tf"),
            x => x.getField("n") * weight(x.getField("t"))),
          lit(0L), (a, b) => a + b).as("__wsum"))
      .select(col(idCol), col("n_tok"),
        when(col("n_tok") === 0L, lit(null).cast("double"))
          .otherwise(col("__wsum").cast("double") / col("n_tok").cast("double"))
          .as("score"))
  }

  /** DuckDB oracle twin: per-OCCURRENCE weight sum over the same
   *  token model — Σ_occurrences w(tok) ≡ Σ_distinct tf·w(tok), so
   *  the list formulation needs no grouping. */
  def hashedClassifierScoreSql(table: String, idCol: String,
      textExpr: String, buckets: Int, salt: String): String = {
    val toks = graft.functions.TextFunctions.lowerTokensSql(textExpr)
    val bucket = s"CAST(${graft.functions.Hashing.h60Sql("t")} % $buckets AS VARCHAR)"
    val w = s"${graft.functions.Hashing.h60Sql(s"'$salt|' || $bucket")} % 2001 - 1000"
    s"""SELECT $idCol, CAST(length(toks) AS BIGINT) AS n_tok,
       |  CASE WHEN length(toks) = 0 THEN NULL
       |       ELSE CAST(CAST(list_sum(list_transform(toks, t -> $w))
       |              AS BIGINT) AS DOUBLE)
       |            / CAST(length(toks) AS BIGINT) END AS score
       |FROM (SELECT $idCol, list_filter($toks, x -> x <> '') AS toks
       |      FROM $table)""".stripMargin
  }

  // ------------------------------------------------- Gopher rule gate

  /** Bullet markers and the stopword list of the Gopher repetition/
   *  quality rules (Rae et al. 2021 §A.1.1). The stopword rule counts
   *  DISTINCT list members present, so a doc spamming "the" doesn't
   *  pass on one word. Shared by the Spark and SQL twins — any edit
   *  lands in both automatically. */
  private val gopherBullets = Seq("•", "‣", "▪", "-", "*")
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality heuristics (Rae et al. 2021, "Scaling
   *  Language Models" §A.1.1) as a single fused projection — the
   *  rule gate MassiveWeb-style curation runs before dedup. Per doc:
   *
   *   - r_words:    50 ≤ n_words ≤ 100 000
   *   - r_word_len: mean word length in [3, 10] chars
   *   - r_symbol:   (count '#' + count '...') / n_words ≤ 0.1
   *   - r_bullet:   ≤ 90% of lines start with a bullet marker
   *   - r_ellipsis: ≤ 30% of lines end with '...'/'…'
   *   - r_alpha:    ≥ 80% of words contain ≥ 1 [A-Za-z] char
   *   - r_stop:     ≥ 2 DISTINCT Gopher stopwords present
   *   - keep:       every rule holds
   *
   *  Every ratio test is a CROSS-MULTIPLIED integer comparison
   *  (10·n_sym ≤ n_words, 3·n ≤ chars ≤ 10·n, 10·bullets ≤ 9·lines,
   *  10·ell ≤ 3·lines, 5·alpha ≥ 4·n) — no float division anywhere,
   *  so the booleans are bit-identical cross-engine by construction.
   *  Words are the engine-wide whitespace-token contract (trimmed
   *  split, empties dropped); lines split on '\n' with trailing
   *  empties KEPT (Spark needs the explicit -1 limit; DuckDB's
   *  string_split keeps them natively); "alphabetic" is ASCII
   *  [A-Za-z] — the Java/RE2-identical class (the repo-wide regex
   *  parity rule) — which makes r_alpha an ENGLISH gate exactly as
   *  Gopher intends.
   *
   *  Shape at 100 TB: one narrow whole-stage-codegen projection —
   *  zero shuffles, zero joins, embarrassingly parallel; codegen
   *  subexpression elimination dedups the repeated split() trees.
   *  Output is corpus-sized (id + 2 counts + 8 booleans). */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = filter(split(trim(t), "\\s+"), w => w =!= "")
    val wordsL = transform(words, w => lower(w))
    val lines = split(t, "\n", -1)
    val nW = size(words).cast("long")
    val nL = size(lines).cast("long")
    val chars = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (a, b) => a + b)
    val nSym = (length(t) - length(regexp_replace(t, lit("#"), lit("")))).cast("long") +
      ((length(t) - length(regexp_replace(t, lit("\\.\\.\\."), lit("")))) / 3).cast("long")
    val firstChar = (l: Column) => substring(ltrim(l), 1, 1)
    val nBullet = size(filter(lines,
      l => firstChar(l).isInCollection(gopherBullets))).cast("long")
    val nEll = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(array(gopherStops.map(lit): _*),
      s => array_contains(wordsL, s))).cast("long")
    docs.select(col(idCol), nW.as("__nw"), nL.as("__nl"), chars.as("__ch"),
        nSym.as("__sym"), nBullet.as("__bul"), nEll.as("__ell"),
        nAlpha.as("__al"), nStop.as("__st"))
      .select(col(idCol),
        col("__nw").as("n_words"), col("__nl").as("n_lines"),
        (col("__nw") >= 50L && col("__nw") <= 100000L).as("r_words"),
        (lit(3L) * col("__nw") <= col("__ch") &&
          col("__ch") <= lit(10L) * col("__nw")).as("r_word_len"),
        (lit(10L) * col("__sym") <= col("__nw")).as("r_symbol"),
        (lit(10L) * col("__bul") <= lit(9L) * col("__nl")).as("r_bullet"),
        (lit(10L) * col("__ell") <= lit(3L) * col("__nl")).as("r_ellipsis"),
        (lit(5L) * col("__al") >= lit(4L) * col("__nw")).as("r_alpha"),
        (col("__st") >= 2L).as("r_stop"))
      .withColumn("keep",
        col("r_words") && col("r_word_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop"))
  }

  /** DuckDB oracle twin of [[gopherRules]] — same whitespace-token
   *  contract ([[graft.functions.TextFunctions.wsClassSql]]: RE2's \s
   *  excludes VT), same '\n' line split with trailing empties kept,
   *  same cross-multiplied integer comparisons. */
  def gopherRulesSql(table: String, idCol: String, textExpr: String): String = {
    val ws = graft.functions.TextFunctions.wsClassSql
    val bullets = gopherBullets.map(b => s"'$b'").mkString(", ")
    val stops = gopherStops.map(s => s"'$s'").mkString(", ")
    s"""SELECT $idCol, nw AS n_words, nl AS n_lines,
       |  (nw >= 50 AND nw <= 100000) AS r_words,
       |  (3 * nw <= ch AND ch <= 10 * nw) AS r_word_len,
       |  (10 * sym <= nw) AS r_symbol,
       |  (10 * bul <= 9 * nl) AS r_bullet,
       |  (10 * ell <= 3 * nl) AS r_ellipsis,
       |  (5 * al >= 4 * nw) AS r_alpha,
       |  (st >= 2) AS r_stop,
       |  (nw >= 50 AND nw <= 100000 AND 3 * nw <= ch AND ch <= 10 * nw
       |    AND 10 * sym <= nw AND 10 * bul <= 9 * nl
       |    AND 10 * ell <= 3 * nl AND 5 * al >= 4 * nw AND st >= 2) AS keep
       |FROM (
       |  SELECT $idCol,
       |    CAST(length(words) AS BIGINT) AS nw,
       |    CAST(length(lines) AS BIGINT) AS nl,
       |    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0)
       |      AS BIGINT) AS ch,
       |    CAST(length(t) - length(replace(t, '#', ''))
       |      + (length(t) - length(replace(t, '...', ''))) // 3 AS BIGINT) AS sym,
       |    CAST(length(list_filter(lines,
       |      l -> substr(ltrim(l), 1, 1) IN ($bullets))) AS BIGINT) AS bul,
       |    CAST(length(list_filter(lines, l -> l LIKE '%...'
       |      OR l LIKE '%' || chr(8230))) AS BIGINT) AS ell,
       |    CAST(length(list_filter(words,
       |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
       |    CAST(length(list_filter([$stops],
       |      s -> list_contains(list_transform(words, w -> lower(w)), s)))
       |      AS BIGINT) AS st
       |  FROM (
       |    SELECT $idCol, t,
       |      list_filter(regexp_split_to_array(trim(t), '$ws+'),
       |        w -> w <> '') AS words,
       |      string_split(t, chr(10)) AS lines
       |    FROM (SELECT $idCol, $textExpr AS t FROM $table)))""".stripMargin
  }
}
