package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for the LLM-data-pipeline surface (engine
 * extension beyond the reference, SURVEY §0/§7.2(5)): token counting,
 * quality scoring, language-ID heuristic, document fingerprinting.
 *
 * Everything is a pure `Column` expression (whole-stage codegen, no
 * UDFs, embarrassingly parallel — a narrow projection at any scale).
 * Each builder has a sibling `*Sql` producing the EXACT DuckDB
 * equivalent used as the correctness oracle; keeping both in one file
 * keeps the two dialects in lock-step. Double arithmetic is written
 * with identical association on both sides so results are
 * bit-identical.
 */
object TextFunctions {

  /** English stopword sample for quality scoring. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "that", "it", "for")

  /** Tiny per-language stopword profiles for the lang-ID heuristic.
   *  Order matters: ties break toward the EARLIER entry. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "fr" -> Seq("le", "les", "et", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "我"))

  /** Java's default `\s` set spelled explicitly — ` \t\n\x0B\f\r`.
   *  RE2 (DuckDB's regex engine) `\s` EXCLUDES vertical tab U+000B,
   *  so every oracle-twin SQL string uses these classes instead of
   *  `\s`/`\S`: a document containing VT would otherwise tokenize
   *  differently across engines (round-10 fix; the Spark side and the
   *  native kernels already agree on the Java set). The escapes are
   *  left for the REGEX engine to interpret — DuckDB single-quoted
   *  literals pass them through verbatim. */
  val wsCharsSql = " \\t\\n\\f\\r\\x0B"
  val wsClassSql = s"[$wsCharsSql]"
  val nonWsClassSql = s"[^$wsCharsSql]"

  /** ASCII-safe "BPE-ish" token pattern: alnum runs or single
   *  non-alnum-non-space symbols (Java side; the SQL twin spells the
   *  whitespace set via [[wsCharsSql]]). */
  val tokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  // ---------------------------------------------------------------- tokens

  /** Whitespace tokens of trimmed text. Empty text yields [""] (size
   *  1) in both Spark and DuckDB — counted as-is for parity. */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCountWs(c: Column): Column = size(wsTokens(c))

  def tokenCountRegex(c: Column): Column =
    size(regexp_extract_all(c, lit(tokenPattern), lit(0)))

  def wsTokensSql(c: String) = s"regexp_split_to_array(trim($c), '$wsClassSql+')"
  def tokenCountWsSql(c: String) = s"length(${wsTokensSql(c)})"
  def tokenCountRegexSql(c: String) =
    s"length(regexp_extract_all($c, '[A-Za-z0-9]+|[^A-Za-z0-9$wsCharsSql]'))"

  // --------------------------------------------------------------- quality

  /** Quality score in [0,1]: alpha ratio, 1−punct ratio, stopword
   *  ratio, capped average word length — equal-weighted. A standard
   *  cheap pretraining-quality heuristic (length/punct/stopword
   *  ratios). */
  def qualityScore(c: Column): Column = {
    val n = greatest(length(c).cast("double"), lit(1.0))
    val alphaRatio = length(regexp_replace(c, "[^A-Za-z]", "")).cast("double") / n
    val punctRatio = length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") / n
    val toks = wsTokens(lower(c))
    val nTok = greatest(size(toks).cast("double"), lit(1.0))
    val stopArr = array(stopwords.map(lit): _*)
    val stopRatio = size(filter(toks, t => array_contains(stopArr, t))).cast("double") / nTok
    val avgWordLen = length(regexp_replace(c, "\\s", "")).cast("double") / nTok
    lit(0.25) * alphaRatio + lit(0.25) * (lit(1.0) - punctRatio) +
      lit(0.25) * stopRatio + lit(0.25) * least(avgWordLen / lit(8.0), lit(1.0))
  }

  /** Fused single-scan quality score — identical values to
   *  [[qualityScore]] (spec-asserted per-row on real data), computed
   *  from one [[TextStats]] pass instead of three regex passes + an
   *  interpreted stopword filter. The oracle keeps the regex form. */
  def qualityScoreFast(c: Column): Column = {
    val s = TextStats(c)
    val n = greatest(s.getField("n_chars").cast("double"), lit(1.0))
    val alphaRatio = s.getField("n_alpha").cast("double") / n
    val punctRatio = s.getField("n_punct").cast("double") / n
    val nTok = greatest(s.getField("n_tok").cast("double"), lit(1.0))
    val stopRatio = s.getField("n_stop").cast("double") / nTok
    val avgWordLen = s.getField("n_nonws").cast("double") / nTok
    lit(0.25) * alphaRatio + lit(0.25) * (lit(1.0) - punctRatio) +
      lit(0.25) * stopRatio + lit(0.25) * least(avgWordLen / lit(8.0), lit(1.0))
  }

  def qualityScoreSql(c: String): String = {
    val n = s"greatest(CAST(length($c) AS DOUBLE), 1.0)"
    val alpha = s"CAST(length(regexp_replace($c, '[^A-Za-z]', '', 'g')) AS DOUBLE) / $n"
    val punct = s"CAST(length(regexp_replace($c, '[A-Za-z0-9$wsCharsSql]', '', 'g')) AS DOUBLE) / $n"
    val toks = wsTokensSql(s"lower($c)")
    val nTok = s"greatest(CAST(length($toks) AS DOUBLE), 1.0)"
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val stop = s"CAST(length(list_filter($toks, t -> list_contains($stopList, t))) AS DOUBLE) / $nTok"
    val awl = s"CAST(length(regexp_replace($c, '$wsClassSql', '', 'g')) AS DOUBLE) / $nTok"
    s"0.25 * ($alpha) + 0.25 * (1.0 - ($punct)) + 0.25 * ($stop) + 0.25 * least(($awl) / 8.0, 1.0)"
  }

  // --------------------------------------------------------------- lang-ID

  /** Stopword-profile hit count for one language. */
  private def langScore(toks: Column, profile: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(profile.map(lit): _*), t)))

  /** n-gram/stopword language-ID heuristic: argmax of profile hits,
   *  ties → earlier profile. Word-salad testdata mostly lands "en";
   *  the point is the deterministic, scale-free operator shape. */
  def langId(c: Column): Column = {
    val toks = wsTokens(lower(c))
    val scores = langProfiles.map { case (lang, prof) => lang -> langScore(toks, prof) }
    // argmax, first-wins: lang_i is the answer iff score_i >= score_j for all j>i
    // and score_i > score_j for all j<i … equivalently a left fold keeping max.
    scores.tail.foldLeft((lit(langProfiles.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Single-pass lang-ID via the fused [[LangIdOf]] codegen kernel —
   *  same counts and first-wins argmax as [[langId]], as ONE narrow
   *  projection with no explode shuffle. This is the engine's
   *  production path (and the 100 TB shape: embarrassingly
   *  parallel). */
  def langIdFast(c: Column): Column = HashExpressions.langIdOf(c)

  /** DataFrame-level lang-ID via EXPLODE + hash aggregation: one
   *  conditional-count per language over exploded tokens (map-side
   *  partial agg, fully codegen'd), argmax in a final projection.
   *  Same counts as [[langId]] — Spark's higher-order `filter` is
   *  CodegenFallback and interprets per row, which made the
   *  Column-only form the bench hotspot. Output: (idCol, lang_pred). */
  def langIdByExplode(df: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(idCol),
      explode(lowerTokens(col(textCol))).as("t"))
    val scoreCols = langProfiles.map { case (lang, prof) =>
      val inList = prof.map(s => s"'$s'").mkString("(", ", ", ")")
      sum(expr(s"IF(t IN $inList, 1, 0)")).as(s"score_$lang")
    }
    val scored = tok.groupBy(col(idCol)).agg(scoreCols.head, scoreCols.tail: _*)
    val best = langProfiles.tail.foldLeft(
      (lit(langProfiles.head._1), col(s"score_${langProfiles.head._1}"))) {
      case ((bestLang, bestScore), (lang, _)) =>
        val s = col(s"score_$lang")
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }._1
    scored.select(col(idCol), best.as("lang_pred"))
  }

  def langIdSql(c: String): String = {
    val toks = wsTokensSql(s"lower($c)")
    val scores = langProfiles.map { case (lang, prof) =>
      val l = prof.map(s => s"'$s'").mkString("[", ", ", "]")
      lang -> s"length(list_filter($toks, t -> list_contains($l, t)))"
    }
    // identical left fold, expressed as nested CASE
    scores.tail.foldLeft((s"'${langProfiles.head._1}'", scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (s"(CASE WHEN ($score) > ($bestScore) THEN '$lang' ELSE $bestLang END)",
          s"(CASE WHEN ($score) > ($bestScore) THEN ($score) ELSE $bestScore END)")
    }._1
  }

  // --------------------------------------------------------- fingerprinting

  /** Rolling polynomial hash over character codepoints:
   *  fold (acc*31 + code) mod (2^31−1), seed 0 — a deterministic
   *  64-bit-safe document fingerprint (no overflow: acc < 2^31,
   *  acc*31+code < 2^36). Codegen'd custom expression
   *  ([[graft.functions.RollingHash]]); empty text folds to 0. */
  def fingerprint(name: String): Column =
    TextExpressions.rollingHash(col(name))

  def fingerprintSql(c: String): String =
    s"CASE WHEN length($c) = 0 THEN 0 ELSE " +
      s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($c) + 1), " +
      s"i -> unicode(substr($c, i::INT, 1))::BIGINT)), " +
      "(acc, x) -> (acc * 31 + x) % 2147483647) END"

  // --------------------------------------------------------------- shingles

  /** Character k-shingles of lowered text (near-dup building block).
   *  Texts shorter than k yield a single short shingle (the whole
   *  text) so no document drops out of dedup silently. Takes a column
   *  NAME (the lambda body is a SQL fragment). */
  def shingles(name: String, k: Int): Column =
    expr(s"transform(sequence(1, greatest(length(lower(`$name`)) - ${k - 1}, 1)), " +
      s"i -> substring(lower(`$name`), i, $k))")

  def shinglesSql(c: String, k: Int): String =
    s"list_transform(range(1, greatest(length(lower($c)) - ${k - 1}, 1) + 1), " +
      s"i -> substr(lower($c), i::INT, $k))"

  /** Distinct word k-shingles from a TOKEN-ARRAY column (join tokens
   *  with single spaces). Far more selective than char shingles on
   *  natural text; the near-dup operators build on this. Takes a
   *  column NAME holding array<string>. */
  def wordShingles(toksName: String, k: Int): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(size(`$toksName`) - ${k - 1}, 1)), " +
      s"i -> array_join(slice(`$toksName`, i, $k), ' ')))")

  def wordShinglesSql(toksExpr: String, k: Int): String =
    s"list_distinct(list_transform(range(1, greatest(length($toksExpr) - ${k - 1}, 1) + 1), " +
      s"i -> array_to_string(array_slice($toksExpr, i, i + ${k - 1}), ' ')))"

  /** ALL word k-windows (positional, WITH duplicates — unlike
   *  [[wordShingles]]): one window per token position, so window
   *  counts measure text volume, not vocabulary. Texts shorter than
   *  k yield their single whole-text window (same no-silent-drop
   *  rule as [[shingles]]). Takes a column NAME holding
   *  array<string>. */
  def wordWindows(toksName: String, k: Int): Column =
    expr(s"transform(sequence(1, greatest(size(`$toksName`) - ${k - 1}, 1)), " +
      s"i -> array_join(slice(`$toksName`, i, $k), ' '))")

  def wordWindowsSql(toksExpr: String, k: Int): String =
    s"list_transform(range(1, greatest(length($toksExpr) - ${k - 1}, 1) + 1), " +
      s"i -> array_to_string(array_slice($toksExpr, i, i + ${k - 1}), ' '))"

  /** Lowercased whitespace tokens — the shared tokenizer for
   *  shingling/SimHash (column name variant for expr composition). */
  def lowerTokens(c: Column): Column = split(trim(lower(c)), "\\s+")
  def lowerTokensSql(c: String): String =
    s"regexp_split_to_array(trim(lower($c)), '$wsClassSql+')"

  // ------------------------------------------------------ PII redaction

  /** PII masking patterns (X53), deliberately restricted to the
   *  regex subset Java (`RegExpReplace`) and RE2 (DuckDB) interpret
   *  identically — ASCII classes, greedy counted repeats, `\b` word
   *  boundaries, no backrefs or lookaround — so the two engines
   *  produce byte-identical redactions. */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pat = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phonePat = "\\+[0-9]{7,15}"

  /** Mask emails, IPv4 addresses, and international phone numbers, in
   *  that fixed order (emails first so their digit-dot tails can't be
   *  half-eaten as IPs). A pure codegen'd `regexp_replace` chain —
   *  narrow projection, embarrassingly parallel at any scale; the
   *  compiled Pattern is reused across rows by the expression. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPat, "<EMAIL>"),
        ipv4Pat, "<IP>"),
      phonePat, "<PHONE>")

  /** DuckDB oracle twin ('g' = replace all, Spark's default). */
  def redactPiiSql(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($c, " +
      s"'$emailPat', '<EMAIL>', 'g'), '$ipv4Pat', '<IP>', 'g'), " +
      s"'$phonePat', '<PHONE>', 'g')"

  // ------------------------------------------------- text normalization

  /** Control characters to STRIP: the C0 block minus the whitespace
   *  the collapse step handles (\t \n \r), plus DEL. Hex escapes are
   *  interpreted identically by Java regex and RE2. */
  val ctrlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Whitespace runs to COLLAPSE to one space. Spelled as an explicit
   *  class because Java's `\s` includes \x0B where RE2's does not —
   *  \x0B and \f are already gone after the control strip, so the
   *  explicit class is exactly the whitespace that can remain. */
  val wsRunPattern = "[ \\t\\n\\r]+"

  /** Canonical text normalization (X59) — the standard first pass of
   *  a training-data pipeline: Unicode NFC composition (decomposed
   *  accent sequences → composed code points, so dedup/fingerprint/
   *  tokenize see ONE spelling per grapheme), control-character strip,
   *  whitespace-run collapse, edge trim. Order matters and is fixed:
   *  NFC first (it never creates control or whitespace characters
   *  from non-whitespace), strip, collapse, trim.
   *
   *  One narrow codegen'd projection — the NFC step is the custom
   *  [[NfcNormalize]] expression (no UDF), the rest is Spark's own
   *  `regexp_replace`/`trim`; embarrassingly parallel at any scale. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(NfcNormalize(c), ctrlPattern, ""),
      wsRunPattern, " "))

  /** DuckDB oracle twin: utf8proc NFC + the same RE2-safe patterns.
   *  Both regex strings contain no quotes, so plain interpolation
   *  into a SQL literal is safe. */
  def normalizeTextSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(nfc_normalize($c), " +
      s"'$ctrlPattern', '', 'g'), '$wsRunPattern', ' ', 'g'))"

  // ------------------------------------------- homoglyph skeletonization

  /** Zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) — invisible padding a
   *  duplicate uses to dodge an exact hash. The pattern carries the
   *  LITERAL characters (built here from Scala escapes, so the source
   *  stays visible): Java regex says `\uhhhh` where RE2 says
   *  `\x{hhhh}`, and a literal class is the one spelling both engines
   *  read identically. */
  val zeroWidthPattern: String =
    "[" + "\u200B\u200C\u200D\uFEFF" + "]"

  /** Confusable → Latin fold (the UTS #39 skeleton idea reduced to a
   *  curated table): per-script lookalikes to their Latin (or digit)
   *  targets, curated by glyph identity from the public Unicode
   *  confusables data — restricted to the subset `translate` can
   *  express (single BMP source char → single target char; multi-char
   *  skeletons like œ→oe are out of scope by design). FROM/TO are
   *  parallel same-length strings consumed by `translate` in both
   *  engines, built from per-script pairs below; Armenian and
   *  Cherokee sources are spelled as code points (a literal glyph is
   *  unreviewable in most editors). Length and FROM-uniqueness are
   *  require()-checked at load. */
  private val confusablePairs: Seq[(String, String)] = Seq(
    // Cyrillic — the r8 core set (а е о р с х у і + capitals)...
    "аеорсхуі" -> "aeopcxyi",
    "АЕОРСХУІ" -> "AEOPCXYI",
    // ...widened r9: dze, je, komi de, qa, we, ghe→r, ka, ze→digit 3
    "ѕјԁԛԝгкз" -> "sjdqwrk3",
    "ЅЈВКМНТЗ" -> "SJBKMHT3",
    // Greek: omicron + the glyph-identical alpha/gamma/iota/kappa/
    // nu/rho/upsilon/chi rows and their capitals
    "οαγικνρυχ" -> "oayikvpux",
    "ΟΑΒΕΖΗΙΚΜΝΡΤΥΧ" -> "OABEZHIKMNPTYX",
    // Armenian: օ ս հ ո յ զ + capitals Օ Ս
    Seq(0x0585, 0x057D, 0x0570, 0x0578, 0x0575, 0x0566)
      .map(_.toChar).mkString -> "ouhnjq",
    Seq(0x0555, 0x054D).map(_.toChar).mkString -> "OU",
    // Cherokee: the capital-Latin lookalike syllabics
    // Ꭰ Ꭱ Ꭲ Ꭺ Ꭻ Ꭼ Ꮃ Ꮇ Ꮋ Ꮍ Ꮐ Ꮓ Ꮩ Ꮮ Ꮯ Ꮲ Ꮶ Ᏼ
    Seq(0x13A0, 0x13A1, 0x13A2, 0x13AA, 0x13AB, 0x13AC, 0x13B3,
        0x13B7, 0x13BB, 0x13BD, 0x13C0, 0x13C3, 0x13D9, 0x13DE,
        0x13DF, 0x13E2, 0x13E6, 0x13F4)
      .map(_.toChar).mkString -> "DRTAJEWMHYGZVLCPKB",
    // fullwidth ASCII forms
    ((0xFF21 to 0xFF3A).map(_.toChar).mkString -> ('A' to 'Z').mkString),
    ((0xFF41 to 0xFF5A).map(_.toChar).mkString -> ('a' to 'z').mkString),
    ((0xFF10 to 0xFF19).map(_.toChar).mkString -> ('0' to '9').mkString))

  val confusableFrom: String = confusablePairs.map(_._1).mkString
  val confusableTo: String = confusablePairs.map(_._2).mkString
  require(confusableFrom.length == confusableTo.length,
    "confusable FROM/TO tables must be parallel")
  require(confusableFrom.distinct.length == confusableFrom.length,
    "confusable FROM table must not map a char twice")
  require(!confusableFrom.contains('\'') && !confusableTo.contains('\''),
    "confusable tables are interpolated into SQL literals")

  /** Homoglyph skeleton (X90): zero-width strip → confusable fold →
   *  lowercase. Two texts with the same skeleton read identically to
   *  a human but hash apart — the spam/SEO duplicate disguise exact
   *  dedup (X5) cannot see. One narrow builtin
   *  regexp_replace/translate/lower chain: codegen, no UDF,
   *  stream-applicable verbatim. */
  def homoglyphSkeleton(c: Column): Column =
    lower(translate(
      regexp_replace(c, zeroWidthPattern, ""),
      confusableFrom, confusableTo))

  /** DuckDB oracle twin — identical chain; the pattern and both
   *  translate tables contain no quotes, so plain interpolation into
   *  SQL literals is safe. */
  def homoglyphSkeletonSql(c: String): String =
    s"lower(translate(regexp_replace($c, '$zeroWidthPattern', '', 'g'), " +
      s"'$confusableFrom', '$confusableTo'))"

  // ------------------------------------------------- HTML text extraction

  /** `<script>`/`<style>` blocks drop WITH their contents ((?s) makes
   *  `.` span newlines; lazy `.*?` stops at the first close tag —
   *  both Java-regex and RE2 semantics). Case-insensitive to catch
   *  `<SCRIPT>`. Two PAIRED alternatives, not `<(script|style)>...
   *  </(script|style)>`: the mixed form would let a `</style>` inside
   *  script text (`document.write('<style>…</style>')` is common
   *  inline JS) terminate the `<script>` block and leak code into the
   *  extracted text. */
  val scriptStylePattern =
    "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"

  /** Any remaining tag (open, close, comment-free) — replaced by ONE
   *  space so `word<br>word` keeps its boundary; the whitespace
   *  collapse folds the extras. */
  val tagPattern = "<[^>]*>"

  /** The fixed entity table, decode order load-bearing (see
   *  [[htmlToText]]). */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML-to-text extraction (X80), the crawl pipeline's very first
   *  content step (the trafilatura/jusText job, reduced to its
   *  relational core): drop script/style WITH contents, strip every
   *  remaining tag to a space, decode the five XML entities plus
   *  `&nbsp;` and numeric `&#39;`, collapse whitespace, trim. Entity
   *  order is fixed and load-bearing: `&amp;` decodes LAST, so
   *  `&amp;lt;` yields the literal text `&lt;` rather than
   *  double-decoding to `<` — the standard single-pass contract.
   *
   *  One narrow chain of builtin `regexp_replace`/`replace` calls —
   *  whole-stage codegen, no parser state, embarrassingly parallel;
   *  patterns live in the Java∩RE2 common subset so the DuckDB twin
   *  is byte-identical. (A production extractor adds boilerplate
   *  heuristics on top — [[graft.operators.Curation.c4LineClean]]
   *  is that next stage.) */
  def htmlToText(c: Column): Column = {
    val untagged = regexp_replace(
      regexp_replace(c, scriptStylePattern, " "), tagPattern, " ")
    val decoded = htmlEntities.foldLeft(untagged) { case (col0, (e, r)) =>
      replace(col0, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, wsRunPattern, " "))
  }

  /** DuckDB oracle twin — same patterns, same entity order, literal
   *  `replace` on both sides (no regex in the entity step). */
  def htmlToTextSql(c: String): String = {
    val untagged = s"regexp_replace(regexp_replace($c, " +
      s"'$scriptStylePattern', ' ', 'g'), '$tagPattern', ' ', 'g')"
    val decoded = htmlEntities.foldLeft(untagged) { case (sql, (e, r)) =>
      val lit = if (r == "'") "''" else r
      s"replace($sql, '$e', '$lit')"
    }
    s"trim(regexp_replace($decoded, '$wsRunPattern', ' ', 'g'))"
  }
}
