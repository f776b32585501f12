package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Learned byte-pair-encoding tokenizer — train + apply (X97, round-10
 * item 2). Round 9 computed BPE's merge-step pair statistic (q98);
 * this operator ITERATES it to an ordered merge list and ENCODES text
 * with the learned vocabulary, closing the "every token-count consumer
 * keys on regex/whitespace tokens" gap: real pipelines tokenize with
 * the model's tokenizer.
 *
 * Algorithm (Sennrich et al. 2016, word-internal BPE):
 *   - the corpus folds to a WORD-COUNT table once (one scan, hash
 *     agg); training never touches the corpus again — every merge
 *     iteration runs over the vocabulary-sized table;
 *   - a word's symbol sequence is its ASCII chars joined by a U+001F
 *     separator; merge (l, r) rewrites `l SEP r` → `l r`-concatenated
 *     via plain substring replace, whose leftmost-non-overlapping
 *     semantics (identical in Spark, DuckDB, and `java.lang.String
 *     .replace`) give the greedy left-to-right merge pass: in `a a a`
 *     under merge (a,a) the first two fuse to `aa` and the third
 *     survives, because the fused symbol no longer equals `l`. The
 *     substring match carries one deliberate artifact BOTH in
 *     training and in encode: a pattern's `l` can TAIL-MATCH inside a
 *     previously fused symbol (`ab SEP c` under merge (b,c) fuses to
 *     the single symbol `abc`), so the learned list and the emitted
 *     symbols can diverge from a textbook symbol-wise BPE on corpora
 *     where such tails occur — the engine, the kernel, and every
 *     oracle twin share the artifact bit-for-bit (the out-of-vocab
 *     symbols it mints encode as [[UnkId]]);
 *   - each iteration picks argmax pair count with a TOTAL tie-break
 *     (count DESC, then left then right symbol ascending), so the
 *     merge list is deterministic and both engines derive the same
 *     list independently — the oracle twin replays training, it is
 *     never handed the answer.
 *
 * Tokens are lowered ASCII alnum runs (`[a-z0-9]+`) — the one token
 * class whose per-CHARACTER split is byte-identical across engines
 * (no surrogate-pair / grapheme divergence), and U+001F cannot occur
 * inside one. Word-boundary markers (`</w>`) are omitted: merges are
 * word-internal either way, and every consumer here counts symbols.
 *
 * Scale shape (round-11 items 1+2 — vocab-scale gear):
 *   - TRAINING folds the corpus to the word-count table once; when
 *     that table fits the driver (it SATURATES on real corpora —
 *     SCALE.md pins q125 flat across two decades) the merge loop runs
 *     LOCALLY against the collected table with `String.replace` —
 *     total Spark job count O(1) in numMerges (one count + one
 *     collect), where the distributed loop pays 2 vocab-sized jobs
 *     PER MERGE (~64k jobs at a real 32k vocab). Over-threshold
 *     corpora keep the distributed loop; both paths are replace-exact
 *     and spec-pinned equal.
 *   - ENCODE is one narrow codegen projection per document through
 *     the fused [[graft.functions.BpeOps]] kernel: a broadcast
 *     merge-rank table probed by token substrings, FIXED-size
 *     expression tree at any merge count, per-token cost independent
 *     of vocabulary size (the nested-replace fold it replaces grew an
 *     expression tree linear in numMerges — past ~1k merges it blew
 *     codegen's 64 KB method limit). No shuffle, no UDF,
 *     embarrassingly parallel at any scale.
 */
object Bpe {

  /** Symbol separator: U+001F (unit separator), impossible inside an
   *  `[a-z0-9]+` token. */
  val Sep = "\u001F"

  private def wordTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** A token's initial symbol string: its chars joined by [[Sep]]. */
  private def charsJoined(tok: Column): Column =
    array_join(regexp_extract_all(tok, lit("."), lit(0)), Sep)

  private def symbols(s: Column): Column =
    split(s, java.util.regex.Pattern.quote(Sep))

  /** Adjacent-pair counts of the current segmentation, weighted by
   *  word count — the q98 statistic over evolving symbols. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"), symbols(col("s")).as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("cnt"), explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1))).as("z"))
      .groupBy(col("z").getField("0").as("l"), col("z").getField("1").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** Train `numMerges` merges on the corpus; returns the ordered
   *  merge list (shorter iff the vocabulary runs out of adjacent
   *  pairs first). Deterministic: spec-pinned that two runs agree and
   *  that a hand-checkable fixture yields the textbook sequence.
   *
   *  When the word-count table holds at most `driverFoldMaxWords`
   *  rows, the merge loop runs on the DRIVER against the collected
   *  table (the k-means shape: a saturating, vocabulary-sized
   *  statistic coordinates iteration) — total job count O(1) in
   *  numMerges instead of 2 jobs per merge, which is the difference
   *  between 2 jobs and ~64k at a real 32k-merge vocabulary. The
   *  default threshold (4M words ≈ a few hundred MB of driver heap)
   *  is far above any natural-language vocabulary; corpora past it
   *  fall back to the distributed loop. Both paths share the literal
   *  `replace` rewrite, so they are bit-equal (spec-pinned). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      driverFoldMaxWords: Long = 4000000L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val words = docs
      .select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(charsJoined(col("w")).as("s"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (words.count() <= driverFoldMaxWords)
        trainLocalIndexed(words.collect().map(r => (r.getString(0), r.getLong(1))),
          numMerges)
      else trainDistributed(words, numMerges)
    } finally { words.unpersist(); () }
  }

  /** The distributed merge loop: 2 vocab-sized jobs per merge over
   *  the persisted word table — the over-threshold path of [[train]].
   *  Lineage note: each accepted merge stacks one `replace` projection
   *  on `cur`; at driver-scale merge counts the local path runs
   *  instead, so this chain stays shallow in practice. */
  private def trainDistributed(words: DataFrame,
      numMerges: Int): Seq[(String, String)] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur: DataFrame = words
    var exhausted = false
    while (acc.size < numMerges && !exhausted) {
      val best = pairCounts(cur)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        acc += ((l, r))
        cur = cur.withColumn("s",
          replace(col("s"), lit(l + Sep + r), lit(l + r)))
      }
    }
    acc.toSeq
  }

  /** Driver-side merge loop over the collected (symbol-string, count)
   *  table — replace-exact twin of [[trainDistributed]]: identical
   *  pair statistic, identical (count DESC, l ASC, r ASC) argmax
   *  (ASCII keys, so Java string order == UTF8 binary order), and the
   *  identical leftmost-non-overlapping `String.replace` rewrite. */
  private[graft] def trainLocal(rows: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var cur = rows
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (acc.size < numMerges && !exhausted) {
      val pc = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < cur.length) {
        val (s, cnt) = cur(i)
        var from = 0
        var sep = s.indexOf(Sep.charAt(0))
        while (sep >= 0) {
          val next = s.indexOf(Sep.charAt(0), sep + 1)
          val until = if (next >= 0) next else s.length
          // key = "l SEP r" — reuses the string's own separator; the
          // separator (0x1F) sorts below every [a-z0-9] char, so key
          // order == (l, r) lexicographic order, the argmax tie-break
          val key = s.substring(from, until)
          pc.put(key, pc.getOrDefault(key, 0L) + cnt)
          from = sep + 1
          sep = next
        }
        i += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        var bestKey: String = null
        var bestC = -1L
        pc.forEach { (k, c) =>
          if (c > bestC || (c == bestC && k.compareTo(bestKey) < 0)) {
            bestKey = k; bestC = c
          }
        }
        val cut = bestKey.indexOf(Sep.charAt(0))
        val (l, r) = (bestKey.substring(0, cut), bestKey.substring(cut + 1))
        acc += ((l, r))
        val pat = l + Sep + r
        val rep = l + r
        cur = cur.map { case (s, c) => (s.replace(pat, rep), c) }
      }
    }
    acc.toSeq
  }

  /** INDEXED driver-side merge loop — the production-vocabulary form
   *  of [[trainLocal]] (round-12 item: the 32k-merge proof). The
   *  naive fold rebuilds the full pair-count table every merge —
   *  O(total chars) per merge, ~30+ minutes at 32k merges over a
   *  100k-type vocabulary. This is the standard fast BPE trainer
   *  (the subword-nmt shape): pair counts live in a hashmap
   *  maintained INCREMENTALLY (a merge recounts only the words that
   *  contain the merged pair, found through a pair→word-ids
   *  occurrence index), and the argmax comes off a lazily-invalidated
   *  max-heap keyed (count DESC, pair ASC — the exact trainLocal
   *  tie-break; a popped entry is discarded unless it matches the
   *  pair's CURRENT count). Per-word recounting reuses the exact
   *  enumeration and the exact `String.replace` rewrite of the
   *  reference fold, so the merge sequence is equal BY CONSTRUCTION
   *  and spec-pinned equal on randomized vocabularies
   *  (BpeSpec "indexed trainer"). Work per merge is
   *  O(Σ |words containing the pair| · wordLen) instead of
   *  O(total chars) — the difference between minutes and sub-second
   *  at a 32k-merge production vocabulary (ProbeBpe32k). */
  private[graft] def trainLocalIndexed(rows: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    val words = rows.map(_._1)
    val cnts = rows.map(_._2)
    val pc = new java.util.HashMap[String, Long]()
    // candidate index — by SEPARATOR CHARACTER CONTEXT, not by exact
    // pair: the reference fold rewrites every SUBSTRING match of
    // `l SEP r`, which includes tail/prefix matches inside longer
    // symbols (the documented boundary-fusion artifact: `xa SEP bc`
    // under merge (a,b) fuses to `xabc`). Any such match sits at a
    // separator whose neighboring characters are (l.last, r.head), so
    // bucketing separators by that char pair finds EVERY candidate
    // word — at most alphabet² (36² here) buckets, each a small slice
    // of the vocabulary — and the per-candidate `contains` decides.
    val ctx = new java.util.HashMap[Int, java.util.HashSet[Integer]]()
    // heap of (count-at-push, key): lazy invalidation — every pc
    // update pushes, pop discards entries whose count is stale
    val heap = new java.util.PriorityQueue[(Long, String)](64,
      (a: (Long, String), b: (Long, String)) =>
        if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
        else a._2.compareTo(b._2))
    def eachSep(s: String)(f: (String, Int) => Unit): Unit = {
      var from = 0
      var sep = s.indexOf(Sep.charAt(0))
      while (sep >= 0) {
        val next = s.indexOf(Sep.charAt(0), sep + 1)
        val until = if (next >= 0) next else s.length
        f(s.substring(from, until),
          s.charAt(sep - 1) * 65536 + s.charAt(sep + 1))
        from = sep + 1
        sep = next
      }
    }
    def add(i: Int): Unit = {
      val c = cnts(i)
      eachSep(words(i)) { (key, cc) =>
        val v = pc.merge(key, c, (x, y) => x + y)
        heap.add((v, key))
        ctx.computeIfAbsent(cc, _ => new java.util.HashSet[Integer]())
          .add(i)
        ()
      }
    }
    def remove(i: Int): Unit = {
      val c = cnts(i)
      eachSep(words(i)) { (key, cc) =>
        val v = pc.merge(key, -c, (x, y) => x + y)
        if (v <= 0L) { pc.remove(key); () } else heap.add((v, key))
        val set = ctx.get(cc)
        if (set != null) { set.remove(i); () }
      }
    }
    var i = 0
    while (i < words.length) { add(i); i += 1 }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (acc.size < numMerges && !exhausted) {
      var top: (Long, String) = null
      while (top == null && !heap.isEmpty) {
        val cand = heap.poll()
        if (pc.getOrDefault(cand._2, 0L) == cand._1) top = cand
      }
      if (top == null) exhausted = true
      else {
        val key = top._2
        val cut = key.indexOf(Sep.charAt(0))
        val (l, r) = (key.substring(0, cut), key.substring(cut + 1))
        acc += ((l, r))
        val rep = l + r
        val bucket = ctx.get(l.charAt(l.length - 1) * 65536 + r.charAt(0))
        if (bucket != null) {
          val ids = bucket.toArray(new Array[Integer](bucket.size))
          var j = 0
          while (j < ids.length) {
            val w = ids(j).intValue()
            if (words(w).contains(key)) {
              remove(w)
              words(w) = words(w).replace(key, rep)
              add(w)
            }
            j += 1
          }
        }
      }
    }
    acc.toSeq
  }

  /** Apply a learned merge list to one token's symbol string — the
   *  fixed-size fused-kernel form ([[graft.functions.BpeOps]]); used
   *  through [[encodeTokens]] so the kernel runs once per doc. */
  private[graft] def encodeTokens(toks: Column,
      merges: Seq[(String, String)]): Column =
    graft.functions.BpeExpressions.encodeTokens(toks, merges)

  /** The nested-replace merge fold the kernel replaced — kept as the
   *  spec's in-plan equivalence reference (BpeSpec pins kernel ≡ fold
   *  on tail-match fixtures and randomized merge lists). Expression
   *  tree is LINEAR in merge count: do not use past ~100 merges. */
  private[graft] def encodeTokenFold(tok: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(charsJoined(tok)) { case (s, (l, r)) =>
      replace(s, lit(l + Sep + r), lit(l + r))
    }

  /** Encode every document with the learned vocabulary: (idCol,
   *  n_words, n_bpe_tokens, n_distinct_bpe) — word count, total BPE
   *  symbol count, and how many DISTINCT vocab entries the document
   *  uses. One narrow projection; token-free documents encode to
   *  (0, 0, 0). */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
        size(wordTokens(col(textCol))).cast("long").as("n_words"),
        encodeTokens(wordTokens(col(textCol)), merges).as("__enc"))
      .select(col(idCol), col("n_words"),
        aggregate(
          transform(col("__enc"), s => size(symbols(s)).cast("long")),
          lit(0L), (a, b) => a + b).as("n_bpe_tokens"),
        size(array_distinct(flatten(transform(col("__enc"), symbols(_)))))
          .cast("long").as("n_distinct_bpe"))

  /** Chunk documents at fixed BPE-TOKEN boundaries — the q58 consumer
   *  re-pointed at the learned tokenizer (round-10 item 2): context
   *  budgets are counted in the MODEL's tokens, not whitespace words.
   *  A word belongs to chunk ⌊(its preceding BPE-token count) /
   *  budget⌋; output one row per (doc, chunk) with its word and BPE
   *  token counts. One exchange on the doc key + a per-doc running
   *  sum — linear at any scale. Token-free docs emit nothing (no
   *  budget consumed, nothing to pack). */
  def chunkByBpeTokens(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)], budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    docs.select(col(idCol),
        posexplode(encodeTokens(wordTokens(col(textCol)), merges))
          .as(Seq("__pos", "__e")))
      .withColumn("__nb", size(symbols(col("__e"))).cast("long"))
      .withColumn("__cum", sum(col("__nb")).over(
        Window.partitionBy(col(idCol)).orderBy(col("__pos"))))
      .withColumn("chunk", expr(s"(__cum - __nb) div ${budget}L"))
      .groupBy(col(idCol), col("chunk"))
      .agg(count(lit(1)).as("n_words"), sum(col("__nb")).as("n_bpe_tokens"))
  }

  /** Vocabulary id of every MERGED symbol: 255 + the 1-based step of
   *  the FIRST merge producing that string (two merges can yield the
   *  same concatenation — (a,bc) and (ab,c) both make `abc` — so the
   *  id keys on the string with a min-step tie-break, deterministic
   *  and independently derivable by the oracle). Single-character
   *  base symbols are not listed: their id IS their code point,
   *  disjoint from 256+ because `[a-z0-9]` code points are < 128. */
  def vocabIds(merges: Seq[(String, String)]): Map[String, Int] =
    merges.zipWithIndex
      .groupBy { case ((l, r), _) => l + r }
      .map { case (sym, hits) => sym -> (256 + hits.map(_._2).min) }

  /** UNK id for multi-char symbols absent from [[vocabIds]]. The
   *  string-replace merge fold can fuse ACROSS a symbol boundary when
   *  a pattern's left symbol tail-matches a previously fused one
   *  (`ab␟c` under merge (b,c) → the single symbol `abc`) — identical
   *  leftmost-non-overlapping semantics in both engines, but the
   *  artifact symbol is no merge's concatenation, so it has no
   *  learned id. Real tokenizers reserve an UNK id for exactly this
   *  out-of-vocabulary case; 1 sits below the `[a-z0-9]` code-point
   *  range and clear of EOS 0. */
  val UnkId = 1

  /** Encode documents to BPE TOKEN-ID SEQUENCES — the actual artifact
   *  a training pipeline feeds the model (X100): one row per (doc,
   *  position, id), ordered by the document's symbol stream. [[encode]]
   *  reports counts; this materializes the ids themselves. Same
   *  single-projection shape plus one posexplode — no shuffle, no UDF,
   *  and the id map is merge-list-sized (broadcast as a literal).
   *  Multi-char symbols outside the vocabulary map to [[UnkId]]
   *  (never NULL — a NULL id silently vanishes from integer folds and
   *  null-skipping aggregates downstream). */
  def encodeIds(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val ids = typedLit(vocabIds(merges))
    docs.select(col(idCol),
        posexplode(flatten(transform(
          encodeTokens(wordTokens(col(textCol)), merges), symbols(_))))
          .as(Seq("pos", "__sym")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        when(length(col("__sym")) === 1, ascii(col("__sym")))
          .otherwise(coalesce(element_at(ids, col("__sym")), lit(UnkId)))
          .cast("int").as("token_id"))
  }

  /** Marker a decoded [[UnkId]] renders as. Outside `[a-z0-9]`, so an
   *  UNK can never round-trip by coincidence: the normalized source
   *  contains only token characters. */
  val UnkSym = "#"

  /** Inverse vocabulary: token id → symbol string. Injective by
   *  construction — [[vocabIds]] keys each concatenation on its
   *  min-step id, so every id maps back to exactly one string; base
   *  ids are the `[a-z0-9]` code points; [[UnkId]] renders [[UnkSym]]
   *  (fused-across-boundary artifact symbols are not invertible, and
   *  the decode says so instead of guessing). */
  def decodeVocab(merges: Seq[(String, String)]): Map[Int, String] =
    vocabIds(merges).map { case (sym, id) => id -> sym } ++
      (('a' to 'z') ++ ('0' to '9')).map(c => c.toInt -> c.toString) +
      (UnkId -> UnkSym)

  /** DECODE + lossless round-trip certificate (X135) — the
   *  inference-side half of the codec: every judged artifact so far
   *  runs text → ids ([[encodeIds]], [[packIdSequences]]); this is the
   *  ids → text direction a pipeline needs to inspect, debug, or
   *  detokenize its tokenized corpus, judged as the property that
   *  makes a codec a codec. Per document: re-encode to the id stream
   *  (the SAME fused kernel + id map q129 judges), decode every id
   *  through [[decodeVocab]], and compare the concatenation against
   *  the document's own normalized token stream. `roundtrip_exact`
   *  holds iff the inverse map is exactly right AND no
   *  boundary-fusion UNK occurred (n_unk counts those — [[UnkId]]
   *  decodes to [[UnkSym]], which cannot appear in normalized text,
   *  so a lossy doc can never compare equal by luck).
   *
   *  Output is doc-volume: (idCol, n_ids, n_unk, decoded_len,
   *  roundtrip_exact). Plan: ONE zero-shuffle narrow projection — the
   *  encode kernel, two literal-map lookups (merge-list-sized,
   *  broadcast as literals), string concat and compare; nothing
   *  leaves the scan stage, same 100 TB posture as q126. */
  /** Decode map rendered as a DENSE ARRAY indexed by token id
   *  (round-13 optimization): `element_at` on a MAP literal is a
   *  LINEAR scan of the key array per lookup — O(|vocab|) per token
   *  id, paid for every id of every document — while `element_at` on
   *  an array literal is one bounds-checked load. Ids are small
   *  non-negative ints (≤ 256 + |merges|) by construction, so the
   *  array is vocabulary-sized; absent ids hold null, exactly the
   *  map's miss semantics (callers' coalesce/array_join treatment is
   *  unchanged). Lookup is `element_at(arr, id + 1)` (1-based). */
  private def denseDecode(vocab: Map[Int, String]): Seq[String] = {
    val maxId = vocab.keys.max
    (0 to maxId).map(i => vocab.get(i).orNull)
  }

  def decodeRoundTrip(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val vids = typedLit(vocabIds(merges))
    val inv = typedLit(denseDecode(decodeVocab(merges)))
    val idArr = transform(
      flatten(transform(encodeTokens(wordTokens(col(textCol)), merges),
        symbols(_))),
      sym => when(length(sym) === 1, ascii(sym))
        .otherwise(coalesce(element_at(vids, sym), lit(UnkId))).cast("int"))
    docs
      .select(col(idCol), idArr.as("__ids"),
        array_join(wordTokens(col(textCol)), "").as("__norm"))
      .select(col(idCol),
        size(col("__ids")).cast("long").as("n_ids"),
        size(filter(col("__ids"), _ === lit(UnkId))).cast("long").as("n_unk"),
        array_join(transform(col("__ids"),
          i => coalesce(element_at(inv, i + 1), lit(UnkSym))), "").as("__dec"),
        col("__norm"))
      .select(col(idCol), col("n_ids"), col("n_unk"),
        length(col("__dec")).cast("long").as("decoded_len"),
        (col("__dec") === col("__norm")).as("roundtrip_exact"))
  }

  // ------------------------------- byte-level BPE + fallback (X142)

  /** Byte value b ↔ the single char U+0100+b — the GPT-2 move
   *  (byte-to-unicode table) under this engine's machinery: rendering
   *  every byte as ONE printable char lets the ENTIRE existing merge
   *  stack (driver-indexed train, the fixed-size encode kernel, the
   *  unrolled SQL chains) run at byte level untouched, because their
   *  unit of segmentation is the char. The 0x100 offset keeps the
   *  alphabet clear of [[Sep]] (U+001F), of real control chars the
   *  `.` char-split regex would break on, and makes ids exact:
   *  codepoint − 256 IS the byte. */
  private def mappedChar(b: Int): String =
    new String(Character.toChars(0x100 + b))

  /** Byte-level PRETOKENIZER: `[ \t\n]*[^ \t\n]+ | [ \t\n]+` — every
   *  maximal run of (leading whitespace + a word) or pure whitespace.
   *  The alternation PARTITIONS the text (concatenation of matches ≡
   *  input, so nothing is lost before the byte mapping — the property
   *  the round-trip certificate rests on), attaching leading
   *  whitespace to its word exactly as GPT-2's pretokenizer does —
   *  but with an EXPLICIT char class: Java's `\s` and RE2's disagree
   *  on U+000B, and a lookahead form (GPT-2's actual regex) doesn't
   *  exist in RE2 at all. Merges never span pretoken boundaries
   *  (bounding the train state by the distinct-pretoken vocabulary,
   *  the same scale posture as the [a-z0-9] form). */
  private def bytePretokens(c: Column): Column =
    regexp_extract_all(c, lit("[ \t\n]*[^ \t\n]+|[ \t\n]+"), lit(0))

  /** A document's byte-level token array — the [[wordTokens]] of the
   *  byte alphabet. One codegen kernel pass
   *  ([[graft.functions.BpeExpressions.mapBytes]]) renders every
   *  pretoken's UTF-8 bytes as mapped chars; the hex → pair-split →
   *  literal-map formulation it replaces paid a 256-entry linear map
   *  scan PER BYTE (measured dominant in the first q169 bench). The
   *  oracle keeps the hex form — DuckDB's map lookups are hash-based
   *  and the oracle only runs at sf0.01. */
  private[graft] def byteTokens(c: Column): Column =
    graft.functions.BpeExpressions.mapBytes(bytePretokens(c))

  /** Train byte-level merges: [[train]]'s exact loop (same pair
   *  statistic, argmax tie-break, and replace rewrite — mapped chars
   *  in U+0100–U+01FF sort identically in Java chars and UTF-8
   *  bytes) over the byte-token vocabulary. */
  def trainBytes(docs: DataFrame, textCol: String, numMerges: Int,
      driverFoldMaxWords: Long = 4000000L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val words = docs
      .select(explode(byteTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(charsJoined(col("w")).as("s"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (words.count() <= driverFoldMaxWords)
        trainLocalIndexed(words.collect().map(r => (r.getString(0), r.getLong(1))),
          numMerges)
      else trainDistributed(words, numMerges)
    } finally { words.unpersist(); () }
  }

  /** Byte-level inverse vocabulary: ids 0–255 ARE the bytes (their
   *  mapped chars); 256+ the min-step merge symbols ([[vocabIds]] —
   *  the same keying, byte ids can never collide with 255+step). */
  def decodeVocabBytes(merges: Seq[(String, String)]): Map[Int, String] =
    vocabIds(merges).map { case (sym, id) => id -> sym } ++
      (0 until 256).map(b => b -> mappedChar(b))

  /** Byte-level encode + DECODE with BYTE FALLBACK + lossless
   *  certificate (X142) — the SentencePiece `byte_fallback` /
   *  GPT-2-byte-alphabet property q161 cannot give: the [a-z0-9]
   *  round trip certifies honestly but is lossy on anything outside
   *  its alphabet, and boundary-fusion artifacts decode to UNK. Here
   *  EVERY input byte has a base id, and a fused artifact symbol
   *  (the one out-of-vocabulary case the fold can produce)
   *  DECOMPOSES to its byte ids instead of an UNK — so decode is
   *  total and the round trip is byte-exact on ANY input, the
   *  property production tokenizers guarantee. `n_fallback` counts
   *  decomposed symbols (the paper-world "byte fallback rate").
   *
   *  Output (idCol, n_ids, n_fallback, n_bytes, roundtrip_exact);
   *  the certificate compares in the injective mapped-char domain
   *  (≡ byte equality, no unmap pass needed). ONE zero-shuffle
   *  projection — encode kernel, literal-map lookups, concat —
   *  q126's 100 TB posture. */
  def byteRoundTrip(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val vids = typedLit(vocabIds(merges))
    // dense-array decode table (see [[denseDecode]]): the map form
    // linear-scanned 256 + |merges| keys PER DECODED ID — per corpus
    // byte under a 16-merge vocabulary
    val i2s = typedLit(denseDecode(decodeVocabBytes(merges)))
    def byteId(ch: Column): Column = (ascii(ch) - lit(256)).cast("int")
    val syms = flatten(transform(
      encodeTokens(byteTokens(col(textCol)), merges), symbols(_)))
    val idsNested = transform(syms, s =>
      when(length(s) === 1, array(byteId(s)))
        .when(element_at(vids, s).isNotNull,
          array(element_at(vids, s).cast("int")))
        .otherwise(transform(
          regexp_extract_all(s, lit("."), lit(0)), byteId(_))))
    docs
      .select(col(idCol), syms.as("__syms"), flatten(idsNested).as("__ids"),
        array_join(byteTokens(col(textCol)), "").as("__orig"))
      .select(col(idCol),
        size(col("__ids")).cast("long").as("n_ids"),
        size(filter(col("__syms"), s =>
          length(s) > 1 && element_at(vids, s).isNull))
          .cast("long").as("n_fallback"),
        length(col("__orig")).cast("long").as("n_bytes"),
        (array_join(transform(col("__ids"), i => element_at(i2s, i + 1)), "")
          === col("__orig")).as("roundtrip_exact"))
  }

  /** The byte-level twin of [[trainCtes]]: same unrolled argmax +
   *  replace chain, s0 built from the byte-token vocabulary. Exposes
   *  `__bmap` (hex-pair → mapped char) and `__btoks` (id, wpos, s)
   *  to downstream CTEs. */
  private def byteTrainCtes(table: String, textExpr: String,
      numMerges: Int): String = {
    def pairs(src: String, k: Int) =
      s"""p$k AS MATERIALIZED (
         |  SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_zip(arr[1:len(arr)-1], arr[2:len(arr)])) AS z
         |    FROM (SELECT string_split(s, $SepSql) AS arr, cnt FROM $src)
         |    WHERE len(arr) >= 2)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r FROM p$k ORDER BY c DESC, l, r LIMIT 1)""".stripMargin
    def step(k: Int) =
      s"""${pairs(s"s${k - 1}", k)},
         |s$k AS MATERIALIZED (SELECT COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s, cnt
         |        FROM s${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin
    (s"""__bmap AS (SELECT lpad(lower(hex(i)), 2, '0') AS u,
        |    chr(CAST(256 + i AS INTEGER)) AS mc FROM range(0, 256) t(i)),
        |__pre AS (SELECT id, wpos, tok FROM (
        |  SELECT $idCol_id AS id, generate_subscripts(toks, 1) - 1 AS wpos,
        |         unnest(toks) AS tok
        |  FROM (SELECT $idCol_id,
        |          regexp_extract_all($textExpr,
        |            '[ \\t\\n]*[^ \\t\\n]+|[ \\t\\n]+') AS toks
        |        FROM $table))),
        |__units AS (SELECT id, wpos, ui, u FROM (
        |  SELECT id, wpos, generate_subscripts(us, 1) AS ui, unnest(us) AS u
        |  FROM (SELECT id, wpos,
        |          regexp_extract_all(lower(hex(tok)), '..') AS us
        |        FROM __pre))),
        |__btoks AS MATERIALIZED (SELECT id, wpos,
        |    string_agg(mc, $SepSql ORDER BY ui) AS s
        |  FROM __units JOIN __bmap USING (u) GROUP BY id, wpos),
        |s0 AS MATERIALIZED (
        |  SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM __btoks
        |  GROUP BY 1)""".stripMargin +:
      (1 to numMerges).map(step)).mkString(",\n")
  }

  // byteTrainCtes needs the caller's id column name inside __pre;
  // threaded via this placeholder to keep the chain text one block
  private val idCol_id = "__byte_id"

  /** DuckDB twin of [[trainBytes]] + [[byteRoundTrip]]: re-trains the
   *  byte-level merges, replays the per-pretoken encode fold, derives
   *  ids with the SAME byte fallback (an out-of-vocabulary multi-char
   *  symbol decomposes to `ord(char) − 256` byte ids), decodes every
   *  id through the inverse vocabulary, and certifies the
   *  concatenation against the document's own mapped byte stream. */
  def byteRoundTripSql(table: String, textExpr: String, idCol: String,
      numMerges: Int): String = {
    val src = s"(SELECT $idCol AS $idCol_id, $textExpr AS __t FROM $table)"
    val encChain = (1 to numMerges).map(k =>
      s"""i$k AS MATERIALIZED (SELECT id, wpos,
         |    COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s
         |  FROM i${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin)
      .mkString(",\n")
    val steps = (1 to numMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, l, r FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${byteTrainCtes(src, "__t", numMerges)},
       |i0 AS MATERIALIZED (SELECT id, wpos, s FROM __btoks),
       |$encChain,
       |__vocab AS (SELECT sym, 255 + min(step) AS vid
       |  FROM (SELECT step, l || r AS sym FROM ($steps)) GROUP BY 1),
       |__flat AS (SELECT id, wpos, generate_subscripts(syms, 1) AS si,
       |    unnest(syms) AS sym
       |  FROM (SELECT id, wpos, string_split(s, $SepSql) AS syms
       |        FROM i$numMerges)),
       |__sids AS (SELECT f.id, f.wpos, f.si,
       |    CASE WHEN length(f.sym) = 1 THEN [ord(f.sym) - 256]
       |         WHEN v.vid IS NOT NULL THEN [v.vid]
       |         ELSE list_transform(regexp_extract_all(f.sym, '.'),
       |                c -> ord(c) - 256) END AS ids,
       |    (length(f.sym) > 1 AND v.vid IS NULL) AS fb
       |  FROM __flat f LEFT JOIN __vocab v ON f.sym = v.sym),
       |__ids AS (SELECT id, wpos, si, generate_subscripts(ids, 1) AS ii,
       |    unnest(ids) AS tid FROM __sids),
       |__dec AS (SELECT i.id,
       |    CAST(count(*) AS BIGINT) AS n_ids,
       |    string_agg(CASE WHEN i.tid < 256 THEN chr(CAST(256 + i.tid AS INTEGER))
       |                    ELSE v2.sym END, ''
       |               ORDER BY i.wpos, i.si, i.ii) AS decoded
       |  FROM __ids i LEFT JOIN __vocab v2 ON i.tid = v2.vid
       |  GROUP BY i.id),
       |__fbc AS (SELECT id,
       |    CAST(sum(CASE WHEN fb THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback
       |  FROM __sids GROUP BY id),
       |__orig AS (SELECT id,
       |    string_agg(mc, '' ORDER BY wpos, ui) AS orig
       |  FROM __units JOIN __bmap USING (u) GROUP BY id),
       |__all AS (SELECT $idCol_id AS id,
       |    CAST(octet_length(encode(__t)) AS BIGINT) AS n_bytes
       |  FROM $src)
       |SELECT a.id AS $idCol,
       |  COALESCE(d.n_ids, 0) AS n_ids,
       |  COALESCE(f.n_fallback, 0) AS n_fallback,
       |  a.n_bytes,
       |  COALESCE(d.decoded, '') = COALESCE(o.orig, '') AS roundtrip_exact
       |FROM __all a
       |LEFT JOIN __dec d ON a.id = d.id
       |LEFT JOIN __fbc f ON a.id = f.id
       |LEFT JOIN __orig o ON a.id = o.id""".stripMargin
  }

  // --------------------------------------- tokenizer at rest (X136)

  /** Materialize a trained tokenizer AT REST — the `tokenizer.json`
   *  of this engine (X136). A production pipeline trains its
   *  tokenizer ONCE and pins it: every later encode job (and every
   *  consumer of the token-id artifact — packing, spans, fertility,
   *  decode) must run the EXACT stored merge list, because a
   *  retrained list re-keys every id downstream — the same
   *  train-once/serve-forever contract as the PQ index's frozen
   *  codebooks (X129/X131). Layout: `merges/` parquet
   *  (step, l, r — the full ordered list; strings round-trip parquet
   *  exactly) + `meta/` (corpus fingerprint, n_merges). Vocab-sized:
   *  a 32k-merge production list is a few hundred KB. */
  def storeTokenizer(spark: org.apache.spark.sql.SparkSession,
      dir: String, merges: Seq[(String, String)],
      fingerprint: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i + 1L, l, r) }
      .toDF("step", "l", "r")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    Seq((fingerprint, merges.size.toLong)).toDF("fingerprint", "n_merges")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[storeTokenizer]] artifact: the ordered merge list, with
   *  the same foreign-fingerprint guard as the stored PQ index — an
   *  encode job pinned to corpus A must refuse a tokenizer trained on
   *  corpus B instead of silently emitting re-keyed ids. */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      expectFingerprint: Option[String] = None): Seq[(String, String)] = {
    expectFingerprint.foreach { fp =>
      val stored = spark.read.parquet(s"$dir/meta")
        .collect().head.getAs[String]("fingerprint")
      require(stored == fp,
        s"tokenizer at $dir was trained on a different corpus " +
          s"(stored fingerprint $stored, expected $fp)")
    }
    spark.read.parquet(s"$dir/merges").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("l"),
        r.getAs[String]("r")))
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq
  }

  // ------------------------------------------------- DuckDB twins

  private val SepSql = "chr(31)"

  /** The shared unrolled-training CTE chain `s0, p1, b1, s1, …, bN`:
   *  plain SQL repeated `numMerges` times (no recursion — DuckDB's
   *  recursive CTEs cannot re-aggregate a whole working table per
   *  step), replaying the IDENTICAL argmax + replace iteration. Every
   *  state CTE is MATERIALIZED: each is referenced twice (pair count
   *  + next state), and inlining would double the expression tree per
   *  step — 2^N base-table scans by step N. Every step carries state
   *  through `LEFT JOIN b_k ON TRUE` + COALESCE, never CROSS JOIN: if
   *  the vocabulary exhausts before numMerges, b_k is EMPTY and a
   *  cross join would collapse the whole chain (and every downstream
   *  encode) to zero rows while the engine keeps emitting — the
   *  left-join form passes state through unchanged, matching the
   *  engine's shorter-merge-list behavior exactly. */
  private def trainCtes(table: String, textExpr: String,
      numMerges: Int): String = {
    def pairs(src: String, k: Int) =
      s"""p$k AS MATERIALIZED (
         |  SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_zip(arr[1:len(arr)-1], arr[2:len(arr)])) AS z
         |    FROM (SELECT string_split(s, $SepSql) AS arr, cnt FROM $src)
         |    WHERE len(arr) >= 2)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r FROM p$k ORDER BY c DESC, l, r LIMIT 1)""".stripMargin
    def step(k: Int) =
      s"""${pairs(s"s${k - 1}", k)},
         |s$k AS MATERIALIZED (SELECT COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s, cnt
         |        FROM s${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin
    (s"""s0 AS MATERIALIZED (
        |  SELECT array_to_string(regexp_extract_all(w, '.'), $SepSql) AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_extract_all(lower($textExpr),
        |                      '[a-z0-9]+')) AS w FROM $table)
        |  GROUP BY 1)""".stripMargin +:
      (1 to numMerges).map(step)).mkString(",\n")
  }

  /** DuckDB twin of [[train]]: (step, l, r), step 1-based. */
  def trainSql(table: String, textExpr: String, numMerges: Int): String = {
    val out = (1 to numMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, l, r FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${trainCtes(table, textExpr, numMerges)}
       |SELECT * FROM ($out) ORDER BY step""".stripMargin
  }

  /** DuckDB twin of [[train]] + [[chunkByBpeTokens]]: re-trains the
   *  merges, replays the per-word encode fold with positions, then
   *  the same preceding-count chunk assignment. */
  def chunkSql(table: String, textExpr: String, idCol: String,
      numMerges: Int, budget: Int): String = {
    val encChain = (1 to numMerges).map(k =>
      s"""c$k AS MATERIALIZED (SELECT id, pos,
         |    COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s
         |  FROM c${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin)
      .mkString(",\n")
    s"""WITH ${trainCtes(table, textExpr, numMerges)},
       |c0 AS MATERIALIZED (SELECT id, i - 1 AS pos,
       |    array_to_string(regexp_extract_all(t, '.'), $SepSql) AS s
       |  FROM (SELECT $idCol AS id, unnest(toks) AS t,
       |          generate_subscripts(toks, 1) AS i
       |        FROM (SELECT $idCol,
       |                regexp_extract_all(lower($textExpr), '[a-z0-9]+') AS toks
       |              FROM $table))),
       |$encChain,
       |__wc AS (SELECT id, pos,
       |    CAST(len(string_split(s, $SepSql)) AS BIGINT) AS nb
       |  FROM c$numMerges),
       |__cum AS (SELECT id, pos, nb, CAST(sum(nb) OVER (
       |    PARTITION BY id ORDER BY pos) AS BIGINT) AS cum FROM __wc)
       |SELECT id AS $idCol, (cum - nb) // $budget AS chunk,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(nb) AS BIGINT) AS n_bpe_tokens
       |FROM __cum GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB twin of [[train]] + [[encodeIds]]: re-trains the merges,
   *  replays the per-word encode fold WITH word positions, flattens to
   *  the symbol stream, and derives the same code-point / 255+min-step
   *  vocabulary ids. `filterSql` narrows the encoded slice (e.g.
   *  `doc_id % 20 = 0`) — id-level output is token-volume-sized, so
   *  both engines encode the same subset. */
  def encodeIdsSql(table: String, textExpr: String, idCol: String,
      numMerges: Int, filterSql: String,
      encodeFrom: String = ""): String = {
    // `encodeFrom` splits the TRAIN relation from the ENCODE relation
    // (empty = same table): the q163 streaming-pack oracle encodes an
    // arrival-ordered union through a tokenizer trained on the full
    // corpus — the X136 pre-trained-tokenizer deployment shape.
    val src = if (encodeFrom.isEmpty) table else encodeFrom
    val encChain = (1 to numMerges).map(k =>
      s"""i$k AS MATERIALIZED (SELECT id, wpos,
         |    COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s
         |  FROM i${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin)
      .mkString(",\n")
    val steps = (1 to numMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, l, r FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${trainCtes(table, textExpr, numMerges)},
       |i0 AS MATERIALIZED (SELECT id, i - 1 AS wpos,
       |    array_to_string(regexp_extract_all(t, '.'), $SepSql) AS s
       |  FROM (SELECT $idCol AS id, unnest(toks) AS t,
       |          generate_subscripts(toks, 1) AS i
       |        FROM (SELECT $idCol,
       |                regexp_extract_all(lower($textExpr), '[a-z0-9]+') AS toks
       |              FROM $src WHERE $filterSql))),
       |$encChain,
       |__vocab AS (SELECT sym, 255 + min(step) AS vid
       |  FROM (SELECT step, l || r AS sym FROM ($steps)) GROUP BY 1),
       |__flat AS (SELECT id, wpos, generate_subscripts(syms, 1) AS si,
       |    unnest(syms) AS sym
       |  FROM (SELECT id, wpos, string_split(s, $SepSql) AS syms
       |        FROM i$numMerges))
       |SELECT f.id AS $idCol,
       |  CAST(row_number() OVER (PARTITION BY f.id ORDER BY f.wpos, f.si)
       |       - 1 AS BIGINT) AS pos,
       |  CAST(CASE WHEN length(f.sym) = 1 THEN ord(f.sym)
       |       ELSE COALESCE(v.vid, 1) END
       |       AS INTEGER) AS token_id
       |FROM __flat f LEFT JOIN __vocab v ON f.sym = v.sym""".stripMargin
  }

  /** DuckDB twin of [[train]] + [[decodeRoundTrip]]: re-trains the
   *  merges, replays the id derivation (the encodeIdsSql chain), then
   *  decodes each id back through the INVERSE vocabulary join —
   *  chr() for code-point ids, the min-step symbol for 256+ ids,
   *  '#' for UNK — and certifies the ordered concatenation against
   *  the document's own normalized token stream. The oracle decodes
   *  from the IDS (never passes symbols through), so a wrong id→sym
   *  inverse on either engine hash-fails the row. */
  def decodeRoundTripSql(table: String, textExpr: String, idCol: String,
      numMerges: Int): String = {
    val encChain = (1 to numMerges).map(k =>
      s"""i$k AS MATERIALIZED (SELECT id, wpos,
         |    COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s
         |  FROM i${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin)
      .mkString(",\n")
    val steps = (1 to numMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, l, r FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${trainCtes(table, textExpr, numMerges)},
       |i0 AS MATERIALIZED (SELECT id, i - 1 AS wpos,
       |    array_to_string(regexp_extract_all(t, '.'), $SepSql) AS s
       |  FROM (SELECT $idCol AS id, unnest(toks) AS t,
       |          generate_subscripts(toks, 1) AS i
       |        FROM (SELECT $idCol,
       |                regexp_extract_all(lower($textExpr), '[a-z0-9]+') AS toks
       |              FROM $table))),
       |$encChain,
       |__vocab AS (SELECT sym, 255 + min(step) AS vid
       |  FROM (SELECT step, l || r AS sym FROM ($steps)) GROUP BY 1),
       |__flat AS (SELECT id, wpos, generate_subscripts(syms, 1) AS si,
       |    unnest(syms) AS sym
       |  FROM (SELECT id, wpos, string_split(s, $SepSql) AS syms
       |        FROM i$numMerges)),
       |__ids AS (SELECT f.id, f.wpos, f.si,
       |    CAST(CASE WHEN length(f.sym) = 1 THEN ord(f.sym)
       |         ELSE COALESCE(v.vid, 1) END AS INTEGER) AS token_id
       |  FROM __flat f LEFT JOIN __vocab v ON f.sym = v.sym),
       |__dec AS (SELECT i.id,
       |    CAST(count(*) AS BIGINT) AS n_ids,
       |    CAST(sum(CASE WHEN i.token_id = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_unk,
       |    string_agg(CASE WHEN i.token_id = 1 THEN '$UnkSym'
       |                    WHEN i.token_id < 256 THEN chr(i.token_id)
       |                    ELSE COALESCE(v2.sym, '$UnkSym') END, ''
       |               ORDER BY i.wpos, i.si) AS decoded
       |  FROM __ids i LEFT JOIN __vocab v2 ON i.token_id = v2.vid
       |  GROUP BY i.id),
       |__norm AS (SELECT $idCol AS id,
       |    array_to_string(regexp_extract_all(lower($textExpr), '[a-z0-9]+'),
       |      '') AS norm
       |  FROM $table)
       |SELECT n.id AS $idCol,
       |  COALESCE(d.n_ids, 0) AS n_ids,
       |  COALESCE(d.n_unk, 0) AS n_unk,
       |  CAST(length(COALESCE(d.decoded, '')) AS BIGINT) AS decoded_len,
       |  COALESCE(d.decoded, '') = n.norm AS roundtrip_exact
       |FROM __norm n LEFT JOIN __dec d ON n.id = d.id""".stripMargin
  }

  /** DuckDB twin of [[train]] + [[encode]] end to end: the oracle
   *  re-trains the merges itself, then replays the encode fold. */
  def encodeSql(table: String, textExpr: String, idCol: String,
      numMerges: Int): String = {
    val encChain = (1 to numMerges).map(k =>
      s"""e$k AS MATERIALIZED (SELECT id, COALESCE(replace(s, b.l || $SepSql || b.r, b.l || b.r), s) AS s
         |        FROM e${k - 1} LEFT JOIN b$k b ON TRUE)""".stripMargin)
      .mkString(",\n")
    s"""WITH ${trainCtes(table, textExpr, numMerges)},
       |__docs AS (SELECT $idCol AS id,
       |    regexp_extract_all(lower($textExpr), '[a-z0-9]+') AS toks
       |  FROM $table),
       |e0 AS MATERIALIZED (SELECT id,
       |    array_to_string(regexp_extract_all(t, '.'), $SepSql) AS s
       |  FROM (SELECT id, unnest(toks) AS t FROM __docs)),
       |$encChain,
       |__enc AS (SELECT id, string_split(s, $SepSql) AS syms FROM e$numMerges),
       |__nb AS (SELECT id, CAST(sum(len(syms)) AS BIGINT) AS n_bpe_tokens
       |         FROM __enc GROUP BY id),
       |__nd AS (SELECT id, CAST(count(DISTINCT sym) AS BIGINT) AS n_distinct_bpe
       |         FROM (SELECT id, unnest(syms) AS sym FROM __enc) GROUP BY id)
       |SELECT d.id AS $idCol, CAST(len(d.toks) AS BIGINT) AS n_words,
       |  COALESCE(nb.n_bpe_tokens, 0) AS n_bpe_tokens,
       |  COALESCE(nd.n_distinct_bpe, 0) AS n_distinct_bpe
       |FROM __docs d
       |LEFT JOIN __nb nb ON d.id = nb.id
       |LEFT JOIN __nd nd ON d.id = nd.id""".stripMargin
  }

  // --------------------------------------- fixed-length sequence packing

  /** Pack the [[encodeIds]] token-id stream into FIXED-LENGTH
   *  model-ready sequences (X104) — the last-mile artifact a training
   *  run memory-maps: documents concatenate in `idCol` order, an EOS
   *  id follows each document, and the joined stream splits into
   *  consecutive `seqLen` windows (sequence s holds global positions
   *  [s·L, (s+1)·L)). Documents that tokenize to zero ids contribute
   *  nothing, not even an EOS — identical in the oracle by the same
   *  absence.
   *
   *  Output is SEQUENCE-volume, one row per sequence:
   *  (seq, n_tokens, first_id, last_id, ids_hash) with
   *  ids_hash = Σ (pos_in_seq + 1)·token_id — an associative integer
   *  positional checksum, so the FULL packing (every id at every
   *  position) is hash-verified without materializing the token-level
   *  write twice: in production the token stream itself is the sink,
   *  and this frame is its judgeable twin.
   *
   *  Plan shape: one hash agg to doc-level counts, the DISTRIBUTED
   *  doc-level prefix sum ([[Curation.withRunningTotal]] — never a
   *  single-reducer global window; the frame is doc-count-sized, the
   *  one size the residency rule lets pin), an equi-join of offsets
   *  back onto the id stream, the EOS rows unioned from the doc-level
   *  frame, and ONE map-side-combinable agg on the sequence key. */
  def packIdSequences(ids: DataFrame, idCol: String, seqLen: Int,
      eosId: Int): DataFrame = {
    // first/last ride a lexicographic struct min/max on the UNIQUE
    // gpos (min_by/max_by sporadically returned NULL under partial
    // aggregation here; the struct form is declarative and total)
    eosJoinedStream(ids, idCol, seqLen, eosId)
      .groupBy(expr(s"gpos div $seqLen").as("seq"))
      .agg(count(lit(1)).as("n_tokens"),
        min(struct(col("gpos"), col("token_id")))
          .getField("token_id").as("first_id"),
        max(struct(col("gpos"), col("token_id")))
          .getField("token_id").as("last_id"),
        expr(s"sum((gpos % $seqLen + 1) * token_id)").as("ids_hash"))
  }

  /** The EOS-joined global token stream both packing artifacts fold:
   *  documents concatenate in `idCol` order, an EOS id follows each
   *  document, and every emitted id carries its GLOBAL position.
   *  Returns (idCol, gpos, token_id) — the EOS row is attributed to
   *  the document it terminates, the convention a doc-masked
   *  attention span wants (the separator belongs to the finished
   *  document, never to the next one). */
  private[graft] def eosJoinedStream(ids: DataFrame, idCol: String,
      seqLen: Int, eosId: Int): DataFrame = {
    require(seqLen >= 2, s"seqLen must be >= 2, got $seqLen")
    require(eosId >= 0 && eosId < 48,
      s"eosId must sit below the [a-z0-9] code-point range, got $eosId")
    val n = ids.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
      // each doc also contributes its EOS to every LATER offset
      .withColumn("__np1", col("n") + lit(1L))
    val off = Curation.withRunningTotal(n, idCol, "__np1", "off")
    val toks = ids.join(off.select(col(idCol), col("off")), Seq(idCol))
      .select(col(idCol), (col("off") + col("pos")).as("gpos"),
        col("token_id"))
    val eos = off.select(col(idCol), (col("off") + col("n")).as("gpos"),
      lit(eosId).cast("int").as("token_id"))
    toks.unionAll(eos)
  }

  /** Per-sequence DOCUMENT-SPAN index over the [[packIdSequences]]
   *  windows (X130) — the second half of the packed training
   *  artifact: modern packed-sequence training masks attention at
   *  document boundaries (a token must not attend across the EOS
   *  into an unrelated neighbor — Krell et al. 2021's packed-BERT
   *  mask, the Llama-class "document causal mask"), and the mask is
   *  built from exactly this frame: for every fixed-length window,
   *  which documents occupy it and where. One row per (sequence,
   *  document) incidence: (seq, doc, start = the doc's first slot in
   *  the window, len = its token count there, incl. its EOS). A
   *  document longer than what remains of its window continues into
   *  the next sequence as a separate row — spans never merge across
   *  the window boundary, because attention windows don't.
   *
   *  Scale shape: the SAME plan class as the packing itself — the
   *  doc-count-sized prefix sum, one equi-join stamping offsets onto
   *  the id stream, ONE map-side-combinable agg keyed (seq, doc);
   *  output is (seq, doc)-incidence volume, ≈ token volume / seqLen
   *  + doc count. Within a window a document's positions are
   *  CONTIGUOUS by construction (the stream is doc-major), so
   *  min + count fully determine the span — no sort, no window
   *  function, no per-token materialization. */
  def packDocSpans(ids: DataFrame, idCol: String, seqLen: Int,
      eosId: Int): DataFrame =
    eosJoinedStream(ids, idCol, seqLen, eosId)
      .groupBy(expr(s"gpos div $seqLen").as("seq"), col(idCol))
      .agg(min(expr(s"gpos % $seqLen")).as("start_pos"),
        count(lit(1)).as("len"))

  /** DuckDB twin of [[train]] + [[encodeIds]] + [[packDocSpans]]:
   *  re-trains the merges, re-derives the id stream, and replays the
   *  EOS-joined stream grouped by (window, document). */
  def packDocSpansSql(table: String, textExpr: String, idCol: String,
      numMerges: Int, filterSql: String, seqLen: Int,
      eosId: Int): String =
    s"""WITH __ids AS (SELECT * FROM (
       |  ${encodeIdsSql(table, textExpr, idCol, numMerges, filterSql)})),
       |__n AS (SELECT $idCol, CAST(count(*) AS BIGINT) AS n
       |  FROM __ids GROUP BY 1),
       |__off AS (SELECT $idCol, n,
       |    CAST(COALESCE(sum(n + 1) OVER (ORDER BY $idCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS off FROM __n),
       |__stream AS (
       |  SELECT i.$idCol, o.off + i.pos AS gpos, i.token_id
       |  FROM __ids i JOIN __off o USING ($idCol)
       |  UNION ALL
       |  SELECT $idCol, off + n AS gpos,
       |    CAST($eosId AS INTEGER) AS token_id
       |  FROM __off)
       |SELECT gpos // $seqLen AS seq, $idCol,
       |  CAST(min(gpos % $seqLen) AS BIGINT) AS start_pos,
       |  CAST(count(*) AS BIGINT) AS len
       |FROM __stream GROUP BY 1, 2""".stripMargin

  /** DuckDB twin of [[train]] + [[encodeIds]] + [[packIdSequences]]:
   *  re-trains the merges, re-derives the id stream, and replays the
   *  EOS-joined fixed-window packing and positional checksum. */
  def packIdSequencesSql(table: String, textExpr: String, idCol: String,
      numMerges: Int, filterSql: String, seqLen: Int,
      eosId: Int, encodeFrom: String = ""): String =
    s"""WITH __ids AS (SELECT * FROM (
       |  ${encodeIdsSql(table, textExpr, idCol, numMerges, filterSql,
            encodeFrom)})),
       |__n AS (SELECT $idCol, CAST(count(*) AS BIGINT) AS n
       |  FROM __ids GROUP BY 1),
       |__off AS (SELECT $idCol, n,
       |    CAST(COALESCE(sum(n + 1) OVER (ORDER BY $idCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS off FROM __n),
       |__stream AS (
       |  SELECT o.off + i.pos AS gpos, i.token_id
       |  FROM __ids i JOIN __off o USING ($idCol)
       |  UNION ALL
       |  SELECT off + n AS gpos, CAST($eosId AS INTEGER) AS token_id
       |  FROM __off)
       |SELECT gpos // $seqLen AS seq, CAST(count(*) AS BIGINT) AS n_tokens,
       |  arg_min(token_id, gpos) AS first_id,
       |  arg_max(token_id, gpos) AS last_id,
       |  CAST(sum((gpos % $seqLen + 1) * token_id) AS BIGINT) AS ids_hash
       |FROM __stream GROUP BY 1""".stripMargin

  // ----------------------- whole-document bin packing (X143, BFD)

  /** Core histogram transition of [[packBfdHistogram]] — one size
   *  class `s` with `c` items against the open-bin remainder
   *  histogram `h` (rem → #bins). Best-fit places each item into the
   *  SMALLEST remainder ≥ s; on a histogram that is a closed form:
   *  ascending eligible remainders, each bin absorbs ⌊r/s⌋ items
   *  before dropping below s (after one placement the bin's new
   *  remainder is the strictly-smallest eligible, so best-fit stays
   *  on it), leftover items open fresh bins at ⌊L/s⌋ per bin. The
   *  per-item loop this replaces is O(n·log bins) SEQUENTIAL state —
   *  this form is O(L) per class, O(L²) total, independent of corpus
   *  size. Returns the new histogram. */
  private[graft] def bfdStep(h: Map[Long, Long], seqLen: Int, s: Long,
      c0: Long): Map[Long, Long] = {
    var c = c0
    val out = scala.collection.mutable.Map[Long, Long]()
    def add(rem: Long, nb: Long): Unit =
      if (nb > 0) out(rem) = out.getOrElse(rem, 0L) + nb
    h.filter(_._1 < s).foreach { case (r, nb) => add(r, nb) }
    for ((r, nb) <- h.filter(_._1 >= s).toSeq.sortBy(_._1)) {
      val a = r / s
      val placed = math.min(math.max(c, 0L), nb * a)
      c -= placed
      add(r % s, placed / a)
      if (placed % a > 0) add(r - (placed % a) * s, 1L)
      add(r, nb - placed / a - (if (placed % a > 0) 1L else 0L))
    }
    if (c > 0) {
      val kStar = seqLen / s
      add(seqLen % s, c / kStar)
      if (c % kStar > 0) add(seqLen - (c % kStar) * s, 1L)
    }
    out.toMap
  }

  /** WHOLE-DOCUMENT bin packing, best-fit-decreasing on the size
   *  histogram (X143) — the padding-minimizing packer of Krell et
   *  al. 2021 beside q134's fixed-window form: q134 CONCATENATES
   *  (documents split across window boundaries, fill ≈ 1 by
   *  construction, attention masked via the span index); this packer
   *  keeps every document chunk WHOLE inside its window — no split,
   *  no truncation — and minimizes the padding that whole-doc
   *  placement costs. Docs longer than the window first split into
   *  ⌊np1/L⌋ exactly-full windows + one remainder item (Krell's
   *  max-length split), then items pack best-fit-decreasing.
   *
   *  DECREASING + BEST-fit (not first-fit): processing size classes
   *  in descending order makes the whole packing a fold over the
   *  bounded remainder HISTOGRAM (Krell's observation that sequence-
   *  length packing lives on the histogram, never the corpus) —
   *  first-fit needs bin ORDER, state linear in bin count, which is
   *  corpus-sized at 100 TB; best-fit needs only the O(L) remainder
   *  histogram, with the same 11/9·OPT+6/9 guarantee class (Johnson
   *  1973; Dósa 2007). The distributed work is ONE map-side-combined
   *  doc-count aggregate and ONE ≤L-row class histogram; the fold is
   *  O(L²) driver arithmetic.
   *
   *  Output: the packed-bin FILL histogram (n_tokens = L − rem,
   *  n_bins), the artifact Krell et al. optimize and report —
   *  Σ n_tokens·n_bins ≡ token volume + one EOS per doc (spec-pinned
   *  conservation). Built eagerly (≤ L+1 rows). */
  def packBfdHistogram(ids: DataFrame, idCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 2, s"seqLen must be >= 2, got $seqLen")
    val spark = ids.sparkSession
    val L = seqLen.toLong
    // one action: per-remainder-class item counts + full-chunk total
    val rows = ids.groupBy(col(idCol)).agg((count(lit(1)) + 1L).as("np1"))
      .groupBy((col("np1") % L).as("s"))
      .agg(count(lit(1)).as("c"), sum(expr(s"np1 div $L")).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fullBins = rows.map(_._3).sum
    val items = rows.filter(_._1 > 0).map(t => t._1 -> t._2).toMap
    var h: Map[Long, Long] =
      if (fullBins > 0) Map(0L -> fullBins) else Map.empty
    for (s <- (seqLen - 1) to 1 by -1)
      h = bfdStep(h, seqLen, s.toLong, items.getOrElse(s.toLong, 0L))
    val out = h.toSeq.map { case (rem, nb) => (L - rem, nb) }
      .sortBy(_._1)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1).map(t => Row(t._1, t._2)),
      StructType(Seq(StructField("n_tokens", LongType, nullable = false),
        StructField("n_bins", LongType, nullable = false))))
  }

  /** DuckDB twin of [[train]] + [[encodeIds]] + [[packBfdHistogram]]:
   *  re-trains, re-derives per-doc id counts, then replays the
   *  best-fit-decreasing histogram fold as an UNROLLED chain of
   *  L−1 class transitions (the trainSql discipline — no recursion),
   *  each a window-cumsum capacity match over the ≤L-row remainder
   *  histogram. */
  def packBfdHistogramSql(table: String, textExpr: String, idCol: String,
      numMerges: Int, filterSql: String, seqLen: Int): String = {
    val L = seqLen
    def step(k: Int): String = {
      val s = L - k // class size for step k (s = L-1 .. 1)
      s"""bfe$k AS (SELECT rem, nb, rem // $s AS a,
         |    coalesce(sum(nb * (rem // $s)) OVER (ORDER BY rem
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM bfh${k - 1} WHERE rem >= $s),
         |bfc$k AS (SELECT coalesce((SELECT c FROM __items WHERE s = $s), 0)
         |  AS c),
         |bfp$k AS MATERIALIZED (SELECT rem, nb, a,
         |    least(greatest((SELECT c FROM bfc$k) - cum, 0), nb * a) AS placed
         |  FROM bfe$k),
         |bfl$k AS (SELECT (SELECT c FROM bfc$k)
         |    - coalesce((SELECT sum(placed) FROM bfp$k), 0) AS lc),
         |bfh$k AS MATERIALIZED (
         |  SELECT rem, CAST(sum(nb) AS BIGINT) AS nb FROM (
         |    SELECT rem, nb FROM bfh${k - 1} WHERE rem < $s
         |    UNION ALL SELECT rem % $s, placed // a FROM bfp$k
         |      WHERE placed // a > 0
         |    UNION ALL SELECT rem - (placed % a) * $s, 1 FROM bfp$k
         |      WHERE placed % a > 0
         |    UNION ALL SELECT rem,
         |        nb - placed // a - (CASE WHEN placed % a > 0
         |          THEN 1 ELSE 0 END) FROM bfp$k
         |      WHERE nb - placed // a - (CASE WHEN placed % a > 0
         |          THEN 1 ELSE 0 END) > 0
         |    UNION ALL SELECT $L % $s, lc // (${L / s}) FROM bfl$k
         |      WHERE lc // (${L / s}) > 0
         |    UNION ALL SELECT $L - (lc % (${L / s})) * $s, 1 FROM bfl$k
         |      WHERE lc % (${L / s}) > 0
         |  ) GROUP BY rem)""".stripMargin
    }
    val chain = (1 until L).map(step).mkString(",\n")
    s"""WITH __ids AS (SELECT * FROM (
       |  ${encodeIdsSql(table, textExpr, idCol, numMerges, filterSql)})),
       |__np AS (SELECT $idCol, CAST(count(*) + 1 AS BIGINT) AS np1
       |  FROM __ids GROUP BY 1),
       |__cls AS (SELECT np1 % $L AS s, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(np1 // $L) AS BIGINT) AS f
       |  FROM __np GROUP BY 1),
       |__items AS (SELECT s, c FROM __cls WHERE s > 0),
       |bfh0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS rem,
       |    CAST(coalesce(sum(f), 0) AS BIGINT) AS nb
       |  FROM __cls HAVING coalesce(sum(f), 0) > 0),
       |$chain
       |SELECT CAST($L - rem AS BIGINT) AS n_tokens, nb AS n_bins
       |FROM bfh${L - 1}""".stripMargin
  }

  // ------------------------------------------- tokenizer evaluation

  /** Tokenizer FERTILITY report per corpus group (X120) — the
   *  acceptance metric a tokenizer team reads before shipping a
   *  vocabulary: tokens-per-word (fertility; Ács 2019 popularized
   *  the term for multilingual BPE audits) and chars-per-token
   *  (compression), grouped by a corpus dimension (language here).
   *  High fertility on a language = the vocabulary under-serves it —
   *  exactly what a per-`lang` row surfaces. Ratios are exact
   *  integer micro-units over per-group BIGINT sums (the q94 rule),
   *  NULL-guarded for token-free groups in both engines.
   *
   *  Shape at 100 TB: ONE corpus scan through the same fused
   *  fixed-size encode kernel q126 judges ([[encodeTokens]] probing
   *  the broadcast merge-rank table), folded into a groups-row
   *  map-side-combined aggregate — no joins, no explode, output =
   *  |groups| rows. */
  def fertilityByGroup(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, merges: Seq[(String, String)]): DataFrame =
    docs.select(col(groupCol),
        length(col(textCol)).cast("long").as("__ch"),
        size(wordTokens(col(textCol))).cast("long").as("__w"),
        aggregate(
          transform(encodeTokens(wordTokens(col(textCol)), merges),
            s => size(symbols(s)).cast("long")),
          lit(0L), (a, b) => a + b).as("__t"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_tokens"), sum(col("__ch")).as("n_chars"))
      .select(col(groupCol), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        when(col("n_words") === 0L, lit(null).cast("long"))
          .otherwise(expr("n_tokens * 1000000 div n_words"))
          .as("fertility_micro"),
        when(col("n_tokens") === 0L, lit(null).cast("long"))
          .otherwise(expr("n_chars * 1000000 div n_tokens"))
          .as("chars_per_token_micro"))

  /** DuckDB oracle twin of [[fertilityByGroup]] — re-trains the
   *  merges and re-encodes via [[encodeSql]], joins the group column
   *  back on the id, and replays the integer ratios. */
  def fertilityByGroupSql(table: String, textExpr: String, idCol: String,
      groupCol: String, numMerges: Int): String =
    s"""SELECT $groupCol, n_docs, n_words, n_tokens, n_chars,
       |  CASE WHEN n_words = 0 THEN NULL
       |       ELSE CAST(n_tokens * 1000000 // n_words AS BIGINT)
       |  END AS fertility_micro,
       |  CASE WHEN n_tokens = 0 THEN NULL
       |       ELSE CAST(n_chars * 1000000 // n_tokens AS BIGINT)
       |  END AS chars_per_token_micro
       |FROM (
       |  SELECT d.$groupCol, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(e.n_words) AS BIGINT) AS n_words,
       |    CAST(sum(e.n_bpe_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(length(d.$textExpr)) AS BIGINT) AS n_chars
       |  FROM (${encodeSql(table, textExpr, idCol, numMerges)}) e
       |  JOIN $table d ON e.$idCol = d.$idCol
       |  GROUP BY d.$groupCol)""".stripMargin

  /** Packing-efficiency report over a [[packIdSequences]] output
   *  (X121) — the utilization number a training-infra team tracks:
   *  how much of every fixed-length window actually carries tokens.
   *  One row: sequence count, full-window count, token sum, and
   *  fill_micro = ⌊10⁶·Σ n_tokens / (n_seqs·seqLen)⌋ (exact
   *  integers; NULL on an empty packing, never ÷0). A single bounded
   *  aggregate over the sequence-volume frame — map-side combined,
   *  one row out at any scale. */
  def packingStats(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    packed.agg(count(lit(1)).as("n_seqs"),
        coalesce(sum(when(col("n_tokens") === seqLen.toLong, 1L)
          .otherwise(0L)), lit(0L)).as("n_full"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("sum_tokens"))
      .select(col("n_seqs"), col("n_full"), col("sum_tokens"),
        when(col("n_seqs") === 0L, lit(null).cast("long"))
          .otherwise(expr(s"sum_tokens * 1000000 div (n_seqs * $seqLen)"))
          .as("fill_micro"))
  }

  /** DuckDB oracle twin of [[packingStats]] over the full
   *  [[packIdSequencesSql]] replay (re-train, re-derive ids,
   *  re-pack, then the same bounded aggregate). */
  def packingStatsSql(table: String, textExpr: String, idCol: String,
      numMerges: Int, filterSql: String, seqLen: Int, eosId: Int): String =
    s"""SELECT n_seqs, n_full, sum_tokens,
       |  CASE WHEN n_seqs = 0 THEN NULL
       |       ELSE CAST(sum_tokens * 1000000 // (n_seqs * $seqLen)
       |         AS BIGINT)
       |  END AS fill_micro
       |FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n_seqs,
       |    CAST(coalesce(sum(CASE WHEN n_tokens = $seqLen THEN 1
       |      ELSE 0 END), 0) AS BIGINT) AS n_full,
       |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS sum_tokens
       |  FROM (${packIdSequencesSql(table, textExpr, idCol, numMerges,
              filterSql, seqLen, eosId)}))""".stripMargin
}
