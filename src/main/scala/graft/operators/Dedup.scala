package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, Hashing, TextFunctions}

/**
 * Deduplication operators for the LLM-data-pipeline surface: exact,
 * blocked n-gram Jaccard, MinHash+LSH, SimHash. All are built from
 * codegen'd built-in expressions plus the joins/aggregations Catalyst
 * already knows how to distribute; the only state is shuffles on
 * content-derived keys.
 *
 * Scale posture (100 TB):
 *  - `exactGroups` is one hash-partitioned aggregation with map-side
 *    partial aggregation; the grouping key is a 128-bit content hash,
 *    so key cardinality ≈ row count and AQE handles skew.
 *  - `jaccardPairs` joins within explicit blocks — O(Σ block²); use
 *    only with strong blocking. The LSH variant replaces blocking.
 *  - `minhashLshPairs` is the scale path: per-doc signature (narrow),
 *    explode to (band, bucket) — rows × bands, shuffle on the bucket
 *    hash, join within buckets only, then verify candidates with the
 *    true Jaccard. Nothing is ever quadratic in corpus size, only in
 *    bucket occupancy.
 *  - `simhashPairs` reduces each doc to one 32-bit integer, so the
 *    candidate join ships 8 bytes/doc; BOTH the blocked and the
 *    unblocked form search hamming space through the multi-index
 *    pigeonhole posting join (segment-equality buckets), never an
 *    all-pairs expansion — blocked merely adds the block to the
 *    posting key.
 *
 * Every operator has a `*Sql` mirror producing the exact DuckDB
 * equivalent (same md5-derived hashes via [[Hashing.h60]]) used as the
 * correctness oracle.
 */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct content, with the id to
   *  keep (min) and the copy count. Downstream: semi-join keep_ids to
   *  materialize the deduped corpus. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def exactGroupsSql(table: String, textCol: String, idCol: String): String =
    s"SELECT md5($textCol) AS content_hash, min($idCol) AS keep_id, " +
      s"count(*) AS n_copies FROM $table GROUP BY md5($textCol)"

  // ---------------------------------------------------- shingle support

  /** (id, blk, hs, sz): each doc's distinct word k-shingles as SORTED
   *  h60 hashes plus their count — ONE fused codegen pass
   *  ([[graft.functions.ShingleHashes]]). The interpreted HOF pipeline
   *  it replaced (transform+slice+array_join+array_distinct, then a
   *  second md5 transform, then sort_array) was the measured dominant
   *  cost of every near-dup operator (4.3 s of q16's 5.7 s at sf0.1). */
  private def shingled(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"), col(blockCol).as("blk"),
        HashExpressions.shingleHashes(col(textCol), k).as("hs"))
      .withColumn("sz", size(col("hs")))

  private def shingledSql(table: String, textCol: String, idCol: String,
      blockCol: String, k: Int): String = {
    val sh = TextFunctions.wordShinglesSql(TextFunctions.lowerTokensSql(textCol), k)
    s"SELECT $idCol AS id, $blockCol AS blk, $sh AS sh FROM $table"
  }

  /** Exact Jaccard from two sorted-distinct hash sets + sizes:
   *  |A∩B| by allocation-free merge-walk
   *  ([[graft.functions.SortedIntersectCount]]), union by
   *  inclusion-exclusion (never materializes the union array). */
  private def jaccardFromHashes(hsA: Column, hsB: Column,
      szA: Column, szB: Column): Column = {
    val i = HashExpressions.sortedIntersectCount(hsA, hsB)
    i.cast("double") / (szA + szB - i).cast("double")
  }

  private def jaccardSqlExpr(a: String, b: String): String =
    s"CAST(length(list_intersect($a, $b)) AS DOUBLE) / " +
      s"CAST(length(list_distinct(list_concat($a, $b))) AS DOUBLE)"

  // ----------------------------------------------------------- jaccard

  /** Blocked near-dup pairs with word-k-shingle Jaccard ≥ tau, via
   *  PREFIX-FILTERED candidate generation (AllPairs/PPJoin family):
   *
   *  1. per doc: distinct shingles → sorted h60 array `hs` (8-byte
   *     keys; value order for the merge-walk verify);
   *  2. post only the PREFIX — the `sz − ⌈tau·sz⌉ + 1` shingles that
   *     come FIRST in ascending-global-document-frequency order (the
   *     AllPairs/PPJoin token ordering; ties by hash). Any pair with
   *     Jaccard ≥ tau provably shares a prefix element under any
   *     shared total order (|A∩B| ≥ tau·|A| forces an overlap inside
   *     the prefix), so filtering is LOSSLESS for the threshold — and
   *     the DuckDB oracle runs the unfiltered formulation, so a
   *     filtering bug cannot pass verification;
   *  3. candidate pairs = distinct prefix-postings join within block;
   *  4. exact verify: |A∩B| via array_intersect on the full sorted
   *     hash sets, |A∪B| by inclusion-exclusion.
   *
   *  Candidate cost scales with prefix postings (≈(1−tau)·shingles),
   *  never with corpus²; per-pair array work happens only on
   *  candidates. Output (id_a, id_b, jac).
   *
   *  NOTE (measured): the shingle+hash+sort projection appears in
   *  four plan arms (both posting sides, both verify sides) and Spark
   *  recomputes it per arm. `persistIntermediate=true` materializes
   *  it once (MEMORY_AND_DISK) — the caller owns the cache lifecycle
   *  (`spark.catalog.clearCache()` when done); size ≈ a few hundred
   *  bytes/doc, spill-safe. */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, k: Int, tau: Double,
      persistIntermediate: Boolean = false): DataFrame = {
    val s0 = shingled(df, textCol, idCol, blockCol, k)
      .withColumn("pfx",
        (col("sz") - ceil(col("sz") * lit(tau)).cast("int") + lit(1)))
      .select(col("blk"), col("id"), col("sz"), col("hs"), col("pfx"))
    val s = if (persistIntermediate)
      s0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else s0
    // PPJoin TOKEN ORDERING: the prefix filter is lossless under ANY
    // total order shared by all docs, but its selectivity is not
    // order-free. Taking prefixes in h60-value order (≈ random) puts
    // ultra-frequent shingles into prefixes at their natural rate, and
    // a shingle posted by f docs contributes f² candidate pairs — the
    // 100x scale sweep measured q16 going quadratic on exactly this
    // (414 s / 37 GB spill at sf10; hottest shingle df ≈ 0.5%, and at
    // tau=0.5 the prefix is HALF of each doc's shingles). The classic
    // AllPairs/PPJoin remedy: order every doc's shingles by ASCENDING
    // GLOBAL DOCUMENT FREQUENCY (ties by hash — total and consistent),
    // so prefixes hold the RAREST shingles and posting buckets stay
    // collision-bound. Three linear passes (df aggregate, df join,
    // per-doc re-sort) buy candidate volume that scales with true
    // near-dup density: sf10 re-measured 414 s → ~9 s. The VERIFY side
    // still walks the value-sorted `hs` (merge-intersect needs value
    // order); only prefix SELECTION uses the df order.
    val toks = s.select(col("blk"), col("id"), col("sz"), col("pfx"),
      explode(col("hs")).as("h"))
    val dfreq = toks.groupBy(col("h")).agg(count(lit(1)).as("dfc"))
    val byDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("dfc"), col("h"))
    val posts0 = toks.join(dfreq, "h")
      .withColumn("p", row_number().over(byDf))
      .filter(col("p") <= col("pfx"))
      .select(col("blk"), col("id"), col("sz"), col("p"), col("h"))
    // the posting frame feeds BOTH sides of the candidate self-join;
    // without a persist Spark recomputes the df join per arm
    val posts = if (persistIntermediate)
      posts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else posts0
    // two more LOSSLESS prunes before the distinct:
    //  - length filter: j ≥ tau forces tau·|A| ≤ |B| ≤ |A|/tau;
    //  - PPJoin positional filter: p is the 1-based rank in the
    //    SHARED (df, hash) total order, so at the FIRST common
    //    element nothing earlier in that order is shared and
    //    |A∩B| ≤ 1 + min(sz_a−p_a, sz_b−p_b); j ≥ tau needs
    //    |A∩B| ≥ tau/(1+tau)·(sz_a+sz_b). A pair's first common
    //    posting always carries a valid bound, and the OR across its
    //    other postings can only keep it — never drop it. (The bound
    //    holds for ANY shared total order — it does NOT require the
    //    value-sorted hs; do not "simplify" back to slice(hs,1,pfx),
    //    which is the quadratic hash-ordered prefix the 100x sweep
    //    caught.)
    val minOverlap = (col("sz_a") + col("sz_b")) * lit(tau / (1.0 + tau))
    val cand = posts.select(col("blk"), col("h"), col("id").as("id_a"),
        col("sz").as("sz_a"), col("p").as("p_a"))
      .join(posts.select(col("blk"), col("h"), col("id").as("id_b"),
        col("sz").as("sz_b"), col("p").as("p_b")),
        Seq("blk", "h"))
      .filter(col("id_a") < col("id_b") &&
        col("sz_b") >= col("sz_a") * lit(tau) &&
        col("sz_a") >= col("sz_b") * lit(tau) &&
        (lit(1) + least(col("sz_a") - col("p_a"), col("sz_b") - col("p_b")))
          >= minOverlap)
      .select(col("id_a"), col("id_b")).distinct()
    val la = s.select(col("id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a"))
    val lb = s.select(col("id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))
    cand.join(la, "id_a").join(lb, "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardFromHashes(col("hs_a"), col("hs_b"),
          col("sz_a"), col("sz_b")).as("jac"))
      .filter(col("jac") >= tau)
  }

  def jaccardPairsSql(table: String, textCol: String, idCol: String,
      blockCol: String, k: Int, tau: Double): String =
    s"""WITH s AS (SELECT *, length(sh) AS sz FROM
       |  (${shingledSql(table, textCol, idCol, blockCol, k)})),
       |posts AS (SELECT blk, id, sz, ${Hashing.h60Sql("s2")} AS shingle FROM
       |  (SELECT blk, id, sz, unnest(sh) AS s2 FROM s)),
       |inter AS (SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
       |                 count(*) AS i
       |          FROM posts a JOIN posts b
       |            ON a.blk = b.blk AND a.shingle = b.shingle AND a.id < b.id
       |          GROUP BY 1, 2, 3, 4)
       |SELECT * FROM (
       |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(sz_a + sz_b - i AS DOUBLE) AS jac
       |  FROM inter
       |) WHERE jac >= $tau""".stripMargin

  // ------------------------------------------------------- minhash+LSH

  /** MinHash+LSH near-dup pairs — the no-blocking scale path.
   *  fused shingle-hash kernel ([[graft.functions.ShingleHashes]]) →
   *  fused signature kernel ([[graft.functions.MinHashSig]]: `perms`
   *  affine minima in a single codegen'd pass, no md5 re-work) →
   *  `bands` band-hashes → explode → bucket self-join on
   *  (band, bucket-hash) ONLY (8-byte rows — shingle arrays never
   *  enter the bucket shuffle) → DISTINCT candidate pairs → verify
   *  true Jaccard ≥ tau on the distinct pairs alone.
   *
   *  Two measured lessons encoded here:
   *   - round 1: explode + min() aggregation for signatures benched
   *     2× slower than any narrow per-row form — its two extra
   *     shuffles cost more than codegen saved. The fused expression
   *     keeps the narrow shape AND the codegen.
   *   - round 2: verifying before dedup re-computed the Jaccard for
   *     every band collision of the same pair and shipped both
   *     shingle arrays through every bucket; distinct-first verifies
   *     each candidate pair exactly once.
   *
   *  `persistIntermediate` materializes the shingle projection (it
   *  feeds the signature arm and both verify arms); caller owns the
   *  cache lifecycle, as with [[jaccardPairs]]. */
  /** (band, bh, id) rows for a shingle-projected frame: the fused
   *  MinHashSig kernel feeds `bands` 8-byte band-bucket hashes per
   *  doc — the LSH index projection both the self-join and the
   *  bipartite incremental variant bucket on. */
  private def bandedSig(s: DataFrame, perms: Int, bands: Int): DataFrame = {
    val rows = perms / bands
    val sig = s.select(col("id"),
      HashExpressions.minhashSig(col("hs"), perms).as("sig"))
    sig.select(col("id"), posexplode(array(
      (0 until bands).map(j => Hashing.h60(array_join(
        expr(s"transform(slice(sig, ${j * rows + 1}, $rows), x -> cast(x as string))"),
        ","))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int, perms: Int, bands: Int, tau: Double,
      persistIntermediate: Boolean = false): DataFrame = {
    require(perms % bands == 0)
    val s0 = shingled(df, textCol, idCol, idCol, k).drop("blk")
    val s = if (persistIntermediate)
      s0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else s0
    val banded = bandedSig(s, perms, bands)
    val cand = banded.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(s.select(col("id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a")), "id_a")
      .join(s.select(col("id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardFromHashes(col("hs_a"), col("hs_b"), col("sz_a"), col("sz_b")).as("jac"))
      .filter(col("jac") >= tau)
  }

  /** A prebuilt corpus-side LSH index — the two frames every
   *  incremental screen scans INSTEAD of re-deriving them from the
   *  corpus text:
   *   - `banded`: (band, bh, id) band-bucket postings (8 bytes/row
   *     payload) — what the bipartite bucket join probes;
   *   - `shingles`: (id, hs, sz) sorted shingle-hash sets — what the
   *     exact-Jaccard verify reads for the corpus arm.
   *  At 100 TB these are lake tables written once at ingest time
   *  (and appended as batches are admitted); per-batch cost is then
   *  one banded projection of the BATCH plus one bucket join against
   *  the index — the corpus text is never re-read, never re-signed.
   *
   *  The build parameters (k, perms, bands) travel WITH the index:
   *  the probe derives the batch side from them, so a batch signed
   *  with different parameters than the index — which would silently
   *  misalign every bucket hash and admit duplicates as false
   *  negatives — is impossible by construction. */
  final case class LshIndex(banded: DataFrame, shingles: DataFrame,
      k: Int, perms: Int, bands: Int)

  /** Build the corpus-side [[LshIndex]]. One pass over the corpus:
   *  fused shingle kernel → fused signature kernel → band buckets.
   *  The caller owns materialization (persist, or write both frames
   *  to the lake and read back) — see [[graft.streaming.Streams.screenIngest]]
   *  for the once-per-stream pattern. */
  def buildLshIndex(corpus: DataFrame, textCol: String, idCol: String,
      k: Int, perms: Int, bands: Int): LshIndex = {
    require(perms % bands == 0)
    val sc = shingled(corpus, textCol, idCol, idCol, k).drop("blk")
    LshIndex(bandedSig(sc, perms, bands),
      sc.select(col("id"), col("hs"), col("sz")), k, perms, bands)
  }

  /** INCREMENTAL ingest dedup against a PREBUILT index (X56): near-dup
   *  pairs between a NEW batch and the existing corpus's [[LshIndex]].
   *  Same fused signature kernel and 8-byte band buckets as
   *  [[minhashLshPairs]], but the bucket join is BIPARTITE (new ×
   *  index only), so candidate volume scales with |batch| ×
   *  collisions, never |corpus|² — and the corpus side is only
   *  SCANNED, never recomputed. Output (new_id, corpus_id, jac ≥
   *  tau); a doc present in both sides pairs with itself at jac 1.0 —
   *  re-ingestion IS a duplicate. The batch side signs with the
   *  INDEX's own (k, perms, bands) — a parameter mismatch between
   *  build and probe cannot happen. */
  def minhashLshPairsAgainstIndex(newDf: DataFrame, index: LshIndex,
      textCol: String, idCol: String, tau: Double): DataFrame = {
    val sn = shingled(newDf, textCol, idCol, idCol, index.k).drop("blk")
    val cand = bandedSig(sn, index.perms, index.bands)
      .select(col("band"), col("bh"), col("id").as("new_id"))
      .join(index.banded
        .select(col("band"), col("bh"), col("id").as("corpus_id")),
        Seq("band", "bh"))
      .select(col("new_id"), col("corpus_id")).distinct()
    cand
      .join(sn.select(col("id").as("new_id"), col("hs").as("hs_a"),
        col("sz").as("sz_a")), "new_id")
      .join(index.shingles.select(col("id").as("corpus_id"),
        col("hs").as("hs_b"), col("sz").as("sz_b")), "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        jaccardFromHashes(col("hs_a"), col("hs_b"),
          col("sz_a"), col("sz_b")).as("jac"))
      .filter(col("jac") >= tau)
  }

  /** Build AND materialize the corpus [[LshIndex]] under `dir` as two
   *  parquet tables (`shingles`, `banded`) and return the read-back
   *  frames — the lake-index pattern every REPEATED screen wants. The
   *  corpus text is scanned exactly ONCE: the shingle projection is
   *  written first, and the banded projection is derived from the
   *  written parquet (never from the corpus again). Returned frames
   *  are plain parquet scans — cheap to re-plan per micro-batch,
   *  immune to `clearCache`, shareable across JVMs. */
  def materializeLshIndex(corpus: DataFrame, textCol: String,
      idCol: String, k: Int, perms: Int, bands: Int,
      dir: String): LshIndex = {
    require(perms % bands == 0)
    val spark = corpus.sparkSession
    shingled(corpus, textCol, idCol, idCol, k).drop("blk")
      .select(col("id"), col("hs"), col("sz"))
      .write.mode("overwrite").parquet(s"$dir/shingles")
    val sh = spark.read.parquet(s"$dir/shingles")
    bandedSig(sh, perms, bands)
      .write.mode("overwrite").parquet(s"$dir/banded")
    LshIndex(spark.read.parquet(s"$dir/banded"), sh, k, perms, bands)
  }

  // ------------------------------------- durable EVOLVING index (X56+)

  /** Layout + lifecycle of a durable, APPEND-ABLE LshIndex directory —
   *  the production shape of a continuous-ingest screen, where each
   *  admitted batch must JOIN the index so later batches are screened
   *  against it (a near-dup arriving one batch after its survivor is a
   *  duplicate too):
   *
   *  ```
   *  dir/
   *    lsh_index_meta.json        # (k, perms, bands, fingerprint)
   *    shingles/<segment>/  — parquet part files
   *    banded/<segment>/    — parquet part files
   *  ```
   *
   *  Each table is a set of SEGMENT subdirectories ("base" from the
   *  initial corpus build, "b<batchId>" per admitted batch). Reads
   *  enumerate segments fresh each time, so an open index sees
   *  appends; appends OVERWRITE their own segment dir, so an
   *  at-least-once retry of a batch replaces its contribution instead
   *  of duplicating it; [[compactLshIndex]] folds accumulated
   *  segments back into one "base" (with set-semantics dedup, so even
   *  a retry that raced a compaction only ever costs space until the
   *  next compact, never correctness — screening reads the index as a
   *  set). The meta sidecar travels WITH the data: build parameters
   *  can never desync from the tables they describe, and a caller's
   *  expected corpus fingerprint is validated before any probe —
   *  a stale or foreign index fails loudly instead of silently
   *  admitting duplicates as false negatives. */
  final case class LshIndexMeta(k: Int, perms: Int, bands: Int,
      fingerprint: String)

  private val IndexMetaFile = "lsh_index_meta.json"

  def writeLshIndexMeta(dir: String, k: Int, perms: Int, bands: Int,
      fingerprint: String): Unit = {
    graft.core.StoreFs.writeUTF8(s"$dir/$IndexMetaFile",
      s"""{"k":$k,"perms":$perms,"bands":$bands,"fingerprint":"$fingerprint"}""")
  }

  def readLshIndexMeta(dir: String): Option[LshIndexMeta] =
    graft.core.StoreFs.readUTF8IfExists(s"$dir/$IndexMetaFile").flatMap { s =>
      def num(key: String) =
        s""""$key":(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
      val fp = """"fingerprint":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      for (k <- num("k"); p <- num("perms"); b <- num("bands"); f <- fp)
        yield LshIndexMeta(k, p, b, f)
    }

  /** Segment subdirectories of one index table (shared store
   *  contract — [[SegmentStore.segDirs]]). */
  private def segmentDirs(table: String): Seq[String] =
    SegmentStore.segDirs(table)

  /** Names of segments a past compaction physically folded into a
   *  base (the `folded-*` ledger files compactions leave beside the
   *  meta): an append of one of these names is an at-least-once
   *  redelivery of an already-folded batch and must NOT re-create the
   *  segment — its rows are inside the fold. */
  private def foldedSegmentNames(dir: String): Set[String] =
    graft.core.StoreFs.listFileNames(dir)
      .filter(_.startsWith("folded-"))
      .flatMap(f => graft.core.StoreFs.readUTF8(s"$dir/$f")
        .split("\n").toSeq)
      .filter(_.nonEmpty).toSet

  /** Open a durable index dir with a FRESH segment listing — call per
   *  probe (per micro-batch) so appends from earlier batches are
   *  visible; a parquet DataFrame pins its file listing at read time,
   *  so a frame built before an append would silently miss it. */
  def loadLshIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      expectFingerprint: Option[String] = None): LshIndex = {
    val meta = readLshIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"no $IndexMetaFile in $dir — not an LSH index dir (or a half-built one)"))
    expectFingerprint.foreach { fp =>
      require(meta.fingerprint == fp,
        s"LSH index at $dir was built from corpus ${meta.fingerprint}, " +
          s"expected $fp — STALE index; rebuild instead of probing it " +
          "(a stale index silently admits duplicates as false negatives)")
    }
    val banded = segmentDirs(s"$dir/banded")
    val shingles = segmentDirs(s"$dir/shingles")
    require(banded.nonEmpty && shingles.nonEmpty,
      s"LSH index at $dir has no segments (banded=$banded shingles=$shingles)")
    val raw = LshIndex(spark.read.parquet(banded: _*),
      spark.read.parquet(shingles: _*), meta.k, meta.perms, meta.bands)
    // delete tombstones subtract at read time until a compaction
    // drops the rows physically — the lake delete-vector pattern
    val del = segmentDirs(s"$dir/deleted")
    if (del.isEmpty) raw
    else {
      val d = spark.read.parquet(del: _*).select(col("id")).distinct()
      raw.copy(banded = raw.banded.join(d, Seq("id"), "left_anti"),
        shingles = raw.shingles.join(d, Seq("id"), "left_anti"))
    }
  }

  /** Build a NEW evolving index dir from a corpus: the same
   *  single-corpus-scan build as [[materializeLshIndex]], written as
   *  the "base" segment, plus the meta sidecar. */
  def initLshIndexDir(corpus: DataFrame, textCol: String, idCol: String,
      k: Int, perms: Int, bands: Int, dir: String,
      fingerprint: String): LshIndex = {
    require(perms % bands == 0)
    val spark = corpus.sparkSession
    shingled(corpus, textCol, idCol, idCol, k).drop("blk")
      .select(col("id"), col("hs"), col("sz"))
      .write.mode("overwrite").parquet(s"$dir/shingles/base")
    val sh = spark.read.parquet(s"$dir/shingles/base")
    bandedSig(sh, perms, bands)
      .write.mode("overwrite").parquet(s"$dir/banded/base")
    writeLshIndexMeta(dir, k, perms, bands, fingerprint)
    loadLshIndex(spark, dir, Some(fingerprint))
  }

  /** Append an admitted batch to a durable index under segment name
   *  `segment` (callers use "b<batchId>"): one narrow pass over the
   *  BATCH text (the corpus is never touched), shingle projection
   *  written first and the banded projection derived from the written
   *  parquet — the batch text is scanned once, same as the corpus
   *  build. mode=overwrite per segment makes a retried batch replace
   *  its own contribution (idempotent under foreachBatch
   *  at-least-once). */
  def appendToLshIndex(dir: String, admitted: DataFrame, textCol: String,
      idCol: String, segment: String): Unit = {
    val meta = readLshIndexMeta(dir).getOrElse(throw new IllegalStateException(
      s"appendToLshIndex: no $IndexMetaFile in $dir"))
    if (foldedSegmentNames(dir).contains(segment)) {
      // this segment was already FOLDED into a base by a compaction
      // that ran after the original append but before the streaming
      // checkpoint committed (the round-10 advice gap): its rows live
      // inside the fold, so re-writing the segment would duplicate
      // every id in the live data and double-count the probe set. The
      // redelivered survivors are value-identical (probes exclude
      // same-id matches, so the re-run screen admits the same set) —
      // the append is a safe no-op.
      return
    }
    val spark = admitted.sparkSession
    shingled(admitted, textCol, idCol, idCol, meta.k).drop("blk")
      .select(col("id"), col("hs"), col("sz"))
      .write.mode("overwrite").parquet(s"$dir/shingles/$segment")
    val sh = spark.read.parquet(s"$dir/shingles/$segment")
    bandedSig(sh, meta.perms, meta.bands)
      .write.mode("overwrite").parquet(s"$dir/banded/$segment")
    // a RE-ADDED id revives: clear it from every tombstone, else the
    // id-scoped delete would (a) hide the new entry at read time and
    // (b) physically destroy it at the next compaction — the
    // delete-then-readd hazard of id-scoped (vs file-scoped) delete
    // vectors. PROBE-FIRST (round-9 item 4): one unioned semi-join
    // over all tombstone segments finds the segments that actually
    // contain a re-added id — the common no-revival batch costs ONE
    // tiny job and rewrites NOTHING (round 8 ran a read + anti-join +
    // conditional rewrite per segment, per batch — up to 64 wasted
    // jobs in the ingest hot path during delete-heavy periods).
    // Single-writer contract (the ingest's own foreachBatch) makes
    // the rewrites race-free; a retried append re-probes idempotently,
    // and a crash between segment write and tombstone clear only
    // delays the revival until the batch redelivers.
    val readded = sh.select(col("id"))
    val delSegs = segmentDirs(s"$dir/deleted")
    if (delSegs.nonEmpty) {
      // ONE multi-path relation with the owning segment derived from
      // input_file_name (round-10 item 6): a union of per-segment
      // reads pushed the semi-join into every branch — one
      // schema-inference job and one broadcast build PER SEGMENT.
      // This shape is one scan + one join, so the probe's job count
      // is independent of how many segments exist.
      val tagged = spark.read
        .schema(spark.read.parquet(delSegs.head).schema)
        .parquet(delSegs: _*)
        .select(col("id"), segNameOfFile.as("__seg"))
        .join(readded, Seq("id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val hitNames = tagged.select("__seg").distinct()
          .collect().map(_.getString(0)).toSet
        if (hitNames.nonEmpty) {
          // the revived ids' STALE pre-delete rows still sit in older
          // data segments; un-hiding them by clearing the tombstone
          // would let probes screen with deleted content (and
          // compaction's dedup keep an arbitrary winner between old
          // and new rows). Purge them FIRST — a crash after the purge
          // but before the tombstone clear is conservative (the id
          // stays hidden until the batch redelivers); the reverse
          // order could screen with stale content. Only segments that
          // actually contain a revived id are rewritten, found by the
          // same probe-first rule; the batch's own fresh segment is
          // excluded — it holds the NEW rows.
          val revived = tagged.select(col("id")).distinct()
          for (table <- Seq("shingles", "banded")) {
            val dataSegs = segmentDirs(s"$dir/$table")
              .filterNot(graft.core.StoreFs.name(_) == segment)
            if (dataSegs.nonEmpty) {
              val dataHitNames = spark.read
                .schema(spark.read.parquet(dataSegs.head).schema)
                .parquet(dataSegs: _*)
                .select(col("id"), segNameOfFile.as("__seg"))
                .join(revived, Seq("id"), "left_semi")
                .select("__seg").distinct().collect().map(_.getString(0)).toSet
              // ONE union rewrite over every hit segment — job count
              // independent of segments hit
              SegmentStore.rewriteSegmentsWithout(spark, s"$dir/$table",
                dataSegs.filter(sd =>
                  dataHitNames.contains(graft.core.StoreFs.name(sd))),
                revived, "id")
            }
          }
          SegmentStore.rewriteSegmentsWithout(spark, s"$dir/deleted",
            delSegs.filter(sd =>
              hitNames.contains(graft.core.StoreFs.name(sd))),
            readded, "id")
        }
      } finally tagged.unpersist()
    }
    ()
  }

  /** The owning SEGMENT name of a scanned parquet row — the parent
   *  directory component of `input_file_name()`. */
  private def segNameOfFile: Column =
    regexp_extract(input_file_name(), ".*/([^/]+)/[^/]+$", 1)

  /** DELETE documents from a durable index (the round-7 item-5 gap:
   *  nothing ever removed entries for documents later deleted from
   *  the corpus, so a deleted doc kept screening out its own future
   *  near-dups forever — the q111 tombstone problem in X56's
   *  clothes). Deletion is a TOMBSTONE segment (`deleted/<segment>`,
   *  one `id` column; overwrite-per-segment ⇒ idempotent retries):
   *  [[loadLshIndex]] subtracts tombstoned ids from every probe
   *  immediately, and the next [[compactLshIndex]] drops the rows
   *  physically and clears the tombstones — the lake delete-vector +
   *  compaction lifecycle, id-scoped. Because the scope is the ID
   *  (not a file), a later [[appendToLshIndex]] of the SAME id
   *  REVIVES it by clearing matching tombstones at append time —
   *  without that, the re-added entry would be hidden at read time
   *  and physically destroyed by the next compaction (spec-pinned:
   *  delete → re-add → the id screens again). Crash-safe at every
   *  step: a tombstone re-applied to already-compacted data is a
   *  no-op anti-join. */
  def deleteFromLshIndex(dir: String, ids: DataFrame, idCol: String,
      segment: String): Unit = {
    require(readLshIndexMeta(dir).isDefined,
      s"deleteFromLshIndex: no $IndexMetaFile in $dir")
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("overwrite").parquet(s"$dir/deleted/$segment")
  }

  /** Fold accumulated segments back into one segment when more
   *  than `maxSegments` have piled up — per-batch appends are small
   *  files, and a long-lived ingest would otherwise degrade every
   *  probe's scan into thousands of tiny reads. Set-semantics dedup
   *  during the rewrite restores the index's logical content even if
   *  a retry double-appended a batch.
   *
   *  CRASH-SAFE ordering (index is a correct superset at EVERY step):
   *  the compacted rewrite is first written to an invisible dot-dir,
   *  then INSTALLED as a fresh visible segment (one rename — the old
   *  segments are still present, so a reader between these steps sees
   *  every row twice, and screening reads the index as a SET), and
   *  only then are the old segments deleted one by one. A crash at
   *  any point leaves a probe-correct index — worst case with
   *  duplicate rows that the NEXT compaction folds away; there is no
   *  window where data is only in a trash dir, and a retried
   *  compaction cannot wedge on leftovers (the dot-dir is rewritten
   *  mode=overwrite; the install name is chosen fresh). Single-writer
   *  contract: the ingest's own foreachBatch calls this between
   *  batches (Structured Streaming serializes batches); a
   *  multi-writer deployment needs a transactional table format
   *  instead. Returns whether a compaction ran. */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxSegments: Int = 64): Boolean = {
    val delSegs = segmentDirs(s"$dir/deleted")
    if (segmentDirs(s"$dir/banded").size <= maxSegments &&
        delSegs.size <= maxSegments) false
    else {
      // tombstoned ids are dropped PHYSICALLY during the rewrite;
      // their segment dirs are cleared only after both tables
      // installed (a crash in between re-applies them at read — a
      // no-op anti-join, never a resurrection)
      val deleted =
        if (delSegs.isEmpty) None
        else Some(spark.read.parquet(delSegs: _*).select(col("id")).distinct())
      // prior folded-* ledgers are SUBSUMED by this fold (its inputs
      // include the base the old folds produced), so their names fold
      // into the new ledger and the old files are GC'd after — without
      // this, a long-lived stream accumulates one ledger file per
      // compaction and every append re-reads them all (round-11
      // advice fix, mirrored in compactAnnIndex)
      val priorLedgers = graft.core.StoreFs.listFileNames(dir)
        .filter(_.startsWith("folded-"))
      val priorFolded = foldedSegmentNames(dir)
      val newLedgers = scala.collection.mutable.Set.empty[String]
      for ((table, keys) <- Seq(
          "shingles" -> Seq("id"),
          "banded" -> Seq("band", "bh", "id"))) {
        val segs = segmentDirs(s"$dir/$table")
        // single-writer CAS (round-9 item 8): the install name derives
        // from the INPUT segment set, so two compactions folding the
        // same segments collide on the same target and the atomic
        // rename lets exactly one through — the loser raises instead
        // of interleaving. A crashed attempt never wedges a retry:
        // after any partial install the input set differs, so the
        // retry folds under a fresh name.
        val tag = graft.core.Commit.inputSetTag(
          segs.map(graft.core.StoreFs.name))
        val target = s"$dir/$table/base-$tag"
        val scratch = s"$dir/$table/.compact-${java.util.UUID.randomUUID()}"
        val folded = spark.read.parquet(segs: _*).dropDuplicates(keys)
        deleted.fold(folded)(d => folded.join(d, Seq("id"), "left_anti"))
          .write.mode("overwrite").parquet(scratch)
        SegmentStore.casInstallDir(scratch, target,
          s"compactLshIndex($dir) $table")
        // record the folded segment NAMES before dropping them: a
        // crash after the drop would otherwise let a redelivered
        // append of a folded batch re-create its segment beside the
        // fold (duplicate ids). Written between install and delete,
        // so at every crash point the index is a correct set AND the
        // ledger covers every physically-dropped segment.
        graft.core.StoreFs.writeUTF8(s"$dir/folded-$table-$tag",
          (priorFolded ++ segs.map(graft.core.StoreFs.name))
            .toSeq.sorted.mkString("\n"))
        newLedgers += s"folded-$table-$tag"
        segs.foreach(graft.core.StoreFs.deleteRecursive)
      }
      delSegs.foreach(graft.core.StoreFs.deleteRecursive)
      // superseded ledgers drop LAST: at every crash point the union
      // of surviving ledgers still covers every folded segment
      priorLedgers.filterNot(newLedgers)
        .foreach(f => graft.core.StoreFs.deleteFileIfExists(s"$dir/$f"))
      true
    }
  }

  /** DuckDB oracle for the EVOLVING two-batch ingest screen
   *  ([[graft.streaming.Streams.screenIngestEvolving]]): sequential
   *  semantics spelled as SQL. `docsSql` must produce (id, grp, text)
   *  with grp ∈ ('corpus','b1','b2') — corpus is the prebuilt index,
   *  b1 arrives first, b2 second. A doc is DROPPED iff it near-dups
   *  (LSH candidate + exact Jaccard ≥ tau, the same machinery as
   *  [[minhashLshPairsAgainstSql]]) the index visible to its batch —
   *  corpus for b1; corpus ∪ b1-SURVIVORS for b2 (the evolution under
   *  test: b1 survivors joined the index) — or an EARLIER (lower-id)
   *  doc of its own batch (in-batch keep-first self-dedup). Output:
   *  surviving ids, both batches, sorted. */
  def evolvingScreenSql(docsSql: String, k: Int, perms: Int, bands: Int,
      tau: Double, idAlias: String): String = {
    require(perms % bands == 0); val rows = perms / bands
    val sh = TextFunctions.wordShinglesSql(TextFunctions.lowerTokensSql("text"), k)
    val sigExprs = (0 until perms).map(i =>
      s"list_aggregate(list_transform(hs, h -> (${Hashing.permA(i)} * h + ${Hashing.permB(i)}) % ${Hashing.P}), 'min')")
      .mkString("[", ", ", "]")
    val bandHash = Hashing.h60Sql(s"array_to_string(array_slice(sig, j * $rows + 1, j * $rows + $rows), ',')")
    s"""WITH docs0 AS ($docsSql),
       |s AS (SELECT id, grp, $sh AS sh FROM docs0),
       |hs AS (SELECT id, grp, sh,
       |         list_transform(sh, s -> ${Hashing.h60Sql("s")} % ${Hashing.P}) AS hs FROM s),
       |sig AS (SELECT id, grp, sh, $sigExprs AS sig FROM hs),
       |banded AS (SELECT id, grp, sh, j AS band, $bandHash AS bh
       |           FROM sig CROSS JOIN (SELECT unnest(range(0, $bands)) AS j)),
       |pairs AS (SELECT DISTINCT a.id AS ia, b.id AS ib, b.grp AS gb
       |          FROM banded a JOIN banded b
       |            ON a.band = b.band AND a.bh = b.bh AND a.id <> b.id
       |          WHERE a.grp <> 'corpus'
       |            AND ${jaccardSqlExpr("a.sh", "b.sh")} >= $tau),
       |surv1 AS (SELECT id FROM s WHERE grp = 'b1'
       |  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.ia = s.id AND p.gb = 'corpus')
       |  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.ia = s.id AND p.gb = 'b1'
       |                    AND p.ib < s.id)),
       |surv2 AS (SELECT id FROM s WHERE grp = 'b2'
       |  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.ia = s.id AND p.gb = 'corpus')
       |  AND NOT EXISTS (SELECT 1 FROM pairs p JOIN surv1 v ON p.ib = v.id
       |                  WHERE p.ia = s.id)
       |  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.ia = s.id AND p.gb = 'b2'
       |                    AND p.ib < s.id))
       |SELECT id AS $idAlias FROM surv1
       |UNION ALL SELECT id FROM surv2""".stripMargin
  }

  /** One-shot convenience form of [[minhashLshPairsAgainstIndex]]:
   *  derives the corpus index inline. Right for a SINGLE screen; a
   *  repeated screen (a streaming ingest, a nightly admission job)
   *  must build the index once and call the index form — deriving it
   *  here per call is a full corpus pass each time. */
  def minhashLshPairsAgainst(newDf: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, k: Int, perms: Int, bands: Int,
      tau: Double): DataFrame =
    minhashLshPairsAgainstIndex(newDf,
      buildLshIndex(corpus, textCol, idCol, k, perms, bands),
      textCol, idCol, tau)

  /** DuckDB oracle for [[minhashLshPairsAgainst]]: the two sides are
   *  predicates over one table (same shingle/signature pipeline). */
  def minhashLshPairsAgainstSql(table: String, textCol: String,
      idCol: String, k: Int, perms: Int, bands: Int, tau: Double,
      newPred: String, corpusPred: String): String = {
    require(perms % bands == 0); val rows = perms / bands
    val sh = TextFunctions.wordShinglesSql(TextFunctions.lowerTokensSql(textCol), k)
    val sigExprs = (0 until perms).map(i =>
      s"list_aggregate(list_transform(hs, h -> (${Hashing.permA(i)} * h + ${Hashing.permB(i)}) % ${Hashing.P}), 'min')")
      .mkString("[", ", ", "]")
    val bandHash = Hashing.h60Sql(s"array_to_string(array_slice(sig, j * $rows + 1, j * $rows + $rows), ',')")
    s"""WITH s AS (SELECT $idCol AS id, ($newPred) AS is_new, ($corpusPred) AS is_corpus,
       |            $sh AS sh FROM $table),
       |hs AS (SELECT id, is_new, is_corpus, sh,
       |         list_transform(sh, s -> ${Hashing.h60Sql("s")} % ${Hashing.P}) AS hs FROM s),
       |sig AS (SELECT id, is_new, is_corpus, sh, $sigExprs AS sig FROM hs),
       |banded AS (SELECT id, is_new, is_corpus, sh, j AS band, $bandHash AS bh
       |           FROM sig CROSS JOIN (SELECT unnest(range(0, $bands)) AS j)),
       |cand AS (SELECT DISTINCT a.id AS new_id, b.id AS corpus_id,
       |                ${jaccardSqlExpr("a.sh", "b.sh")} AS jac
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bh = b.bh
       |          AND a.is_new AND b.is_corpus)
       |SELECT new_id, corpus_id, jac FROM cand WHERE jac >= $tau""".stripMargin
  }

  def minhashLshPairsSql(table: String, textCol: String, idCol: String,
      k: Int, perms: Int, bands: Int, tau: Double): String = {
    require(perms % bands == 0); val rows = perms / bands
    val sh = TextFunctions.wordShinglesSql(TextFunctions.lowerTokensSql(textCol), k)
    val sigExprs = (0 until perms).map(i =>
      s"list_aggregate(list_transform(hs, h -> (${Hashing.permA(i)} * h + ${Hashing.permB(i)}) % ${Hashing.P}), 'min')")
      .mkString("[", ", ", "]")
    val bandHash = Hashing.h60Sql(s"array_to_string(array_slice(sig, j * $rows + 1, j * $rows + $rows), ',')")
    s"""WITH s AS (SELECT $idCol AS id, $sh AS sh FROM $table),
       |hs AS (SELECT id, sh, list_transform(sh, s -> ${Hashing.h60Sql("s")} % ${Hashing.P}) AS hs FROM s),
       |sig AS (SELECT id, sh, $sigExprs AS sig FROM hs),
       |banded AS (SELECT id, sh, j AS band, $bandHash AS bh
       |           FROM sig CROSS JOIN (SELECT unnest(range(0, $bands)) AS j)),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |                ${jaccardSqlExpr("a.sh", "b.sh")} AS jac
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bh = b.bh AND a.id < b.id)
       |SELECT id_a, id_b, jac FROM cand WHERE jac >= $tau""".stripMargin
  }

  // ------------------------------------------------------ apply dedup

  /** Materialize the deduplicated corpus from a verified pair list
   *  with the keep-first policy: drop the HIGHER id of every near-dup
   *  pair. (Full transitive clustering needs connected components —
   *  iterative; keep-first is the standard single-pass policy and is
   *  what large pipelines run per batch.) One broadcast-able anti
   *  join. */
  def applyKeepFirst(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  // ---------------------------------------------- transitive clusters

  /** Connected components over a near-dup pair list: every row of `df`
   *  gets `cluster_id` = the MINIMUM id reachable through pairs
   *  (singletons cluster as themselves). This is the transitive
   *  closure `applyKeepFirst` deliberately skips — the policy big
   *  pipelines use when chains of near-dups must collapse to one
   *  representative.
   *
   *  Algorithm: min-label propagation WITH per-round path compression
   *  (the hash-to-min family). Each round every vertex takes the min
   *  of its label and its neighbors' labels (edges are symmetrized),
   *  then labels shortcut through themselves TWICE (L ← L∘L, twice —
   *  two extra self-joins), so label trees QUARTER in depth each
   *  round and convergence is O(log₄ diameter) rounds, not
   *  O(diameter): a 10⁶-long duplicate chain converges within the
   *  default maxIter instead of silently returning unconverged
   *  labels. Early-stop
   *  when a round changes nothing; intermediate labels are persisted
   *  and lineage is cut per round (iterative plans otherwise grow
   *  exponentially in re-execution cost). */
  def clusters(df: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 30): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(MEMORY_AND_DISK)
    val spark = df.sparkSession
    // Lineage is cut per round by round-tripping the plan through its
    // RDD (plan becomes a leaf LogicalRDD): the compression step
    // references the previous round TWICE, so an uncut logical plan
    // doubles in size per round — 2^rounds nodes kills the analyzer
    // long before any data moves. The RDD DAG itself grows linearly
    // and each round is persisted, so nothing recomputes. persist()
    // (not localCheckpoint) keeps every block under the CacheManager,
    // so callers/harnesses can actually free them — localCheckpoint
    // blocks are invisible to spark.catalog.clearCache() and were
    // measured crowding out every subsequent query in the bench.
    def cut(d: DataFrame): DataFrame =
      spark.createDataFrame(d.rdd, d.schema).persist(MEMORY_AND_DISK)
    // The lineage-cutting RDD round-trip doubles as the convergence
    // check: a long accumulator counts label changes WHILE the round's
    // blocks are built, so no separate join-with-previous + count()
    // job runs per round (it used to — a full extra shuffle each
    // iteration). The old label rides along as `__old` (labels
    // contribute their own; neighbor rows a Long.MaxValue sentinel
    // that min() discards — every vertex has exactly one labels row).
    // Accumulators can over-count if an evicted block recomputes;
    // that only delays early-stop by a round, never changes labels.
    def cutCounting(d: DataFrame, changes: org.apache.spark.util.LongAccumulator,
        schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val rdd = d.rdd.mapPartitions { it =>
        it.map { r =>
          if (r.get(1) != r.get(2)) changes.add(1L)
          org.apache.spark.sql.Row(r.get(0), r.get(1))
        }
      }
      spark.createDataFrame(rdd, schema).persist(MEMORY_AND_DISK)
    }
    var labels = cut(df.select(col(idCol).as(idCol), col(idCol).as("cluster_id")))
    val outSchema = labels.schema
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val acc = spark.sparkContext.longAccumulator(s"cc_changed_$iter")
      val viaNeighbors = edges
        .join(labels.select(col(idCol).as("dst"), col("cluster_id")), "dst")
        .select(col("src").as(idCol), col("cluster_id"),
          lit(Long.MaxValue).as("__old"))
      // persisted: the compression self-join below references this
      // frame twice, and uncached that recomputes the whole round
      val propagated = cut(labels
        .select(col(idCol), col("cluster_id"), col("cluster_id").as("__old"))
        .union(viaNeighbors)
        .groupBy(col(idCol)).agg(min(col("cluster_id")).as("cluster_id"),
          min(col("__old")).as("__old")))
      // path compression: follow the label one more hop — L(v) ← L(L(v)).
      // cluster_id is always a vertex id, so the join is total; the
      // left+coalesce guards the degenerate empty-vertex-set case.
      def compressed(d: DataFrame): DataFrame = d
        .join(d.select(col(idCol).as("cluster_id"),
          col("cluster_id").as("__cc")), Seq("cluster_id"), "left")
        .select(col(idCol),
          coalesce(col("__cc"), col("cluster_id")).as("cluster_id"),
          col("__old"))
      // compression runs TWICE per round (pointer jumping composed
      // with itself): label-tree depth QUADRUPLES per round instead
      // of doubling, so the 200-deep chain spec converges in 5 rounds
      // instead of 8 — the second self-join is far cheaper than the
      // whole rounds (neighbor join + agg + persist + action) it
      // replaces. Each compression input is persisted because the
      // self-join references it twice.
      val c1 = cut(compressed(propagated))
      val next = cutCounting(compressed(c1), acc, outSchema)
      next.count() // one action per round: materializes next + fills acc
      changed = acc.value
      c1.unpersist()
      propagated.unpersist()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    System.err.println(s"[graft.cc] converged after $iter rounds " +
      s"(maxIter=$maxIter, lastChanged=$changed)")
    labels
  }

  /** Oracle for [[clusters]]: DuckDB recursive CTE computing min
   *  reachable id per vertex over the same (nested) pair query. */
  def clustersSql(table: String, idCol: String, pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT $idCol, $idCol FROM $table
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |)
       |SELECT src AS $idCol, min(dst) AS cluster_id FROM reach GROUP BY src""".stripMargin

  // ----------------------------------------------------------- simhash

  def simhash32Sql(toksExpr: String): String = simhashBitsSql(toksExpr, 32)

  def simhashBitsSql(toksExpr: String, bits: Int): String =
    simhashBitsSqlExpr(toksExpr, bits.toString)

  /** `bitsSql` may be a literal or a scalar subquery — the adaptive
   *  form derives the width from `count(*)` so both engines compute
   *  the identical simhash at any scale factor. */
  def simhashBitsSqlExpr(toksExpr: String, bitsSql: String): String = {
    val h = Hashing.h60Sql("t")
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $bitsSql), b -> " +
      s"CASE WHEN list_sum(list_transform($toksExpr, t -> ((($h >> b) & 1) * 2 - 1))) > 0 " +
      s"THEN (1::BIGINT << b) ELSE 0::BIGINT END)), (acc, x) -> acc + x)"
  }

  /** Simhash width for the multi-index pigeonhole, derived from the
   *  corpus size with INTEGER thresholds (oracle-parity: a float log2
   *  could desync one ulp from the SQL twin at powers of two).
   *  Candidates per segment scale as n²/2^width(segment); keeping the
   *  posting join linear needs segment width ≳ log₂(n) − 6 (64-doc
   *  collision budget). With maxHamming=2 (3 segments) the widths are
   *  32→(11,11,10), 45→(15,15,15), 60→(20,20,20): the 10-bit worst
   *  segment of the 32-bit form saturates at ~64·2^10 ≈ 65 k docs —
   *  exactly the measured sf10 skip of round 6 — so the width steps
   *  there and at 2 M. 60 bits is the ceiling (bigint simhash);
   *  beyond ~64·2^20 ≈ 67 M docs per hamming family, compose with
   *  blocking ([[simhashPairs]]). */
  def adaptiveSimhashBits(n: Long): Int =
    32 + (if (n > 65536L) 13 else 0) + (if (n > 2097152L) 15 else 0)

  def adaptiveSimhashBitsSql(table: String): String =
    s"(SELECT 32 + (CASE WHEN count(*) > 65536 THEN 13 ELSE 0 END) + " +
      s"(CASE WHEN count(*) > 2097152 THEN 15 ELSE 0 END) FROM $table)"

  /** (id, blk, sh32) as ONE narrow projection: the fused
   *  [[graft.functions.SimHash32]] kernel hashes every token and
   *  accumulates all 32 bit-majority counters in a single codegen'd
   *  pass per row. (History: a nested-HOF form was 20× slower
   *  [interpreted]; the round-1 explode + 32-conditional-sums
   *  aggregation fixed the CPU but paid an explode shuffle of every
   *  token — the fused kernel needs neither.) */
  private def simhashed(df: DataFrame, textCol: String, idCol: String,
      blockCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      HashExpressions.simhash32(col(textCol)).as("sh32"))

  /** Pigeonhole posting-list join (Manku et al.'s simhash-at-scale
   *  construction), shared by BOTH hamming-search forms: split the
   *  simhash into `maxHamming + 1` disjoint segments — any pair within
   *  hamming ≤ maxHamming must agree EXACTLY on at least one segment —
   *  post each doc under its (extraKey…, segment-index, segment-value)
   *  keys, self-join on those keys only, and verify bit_count(xor) on
   *  the distinct candidates. LOSSLESS for the threshold; candidate
   *  cost is Σ bucket² over ~11-bit segment buckets — linear in corpus
   *  size for near-uniform simhashes — never Σ block² over whole
   *  blocks. `s` must carry (id, sh32) plus the extraKey columns. */
  private def pigeonholePairs(s: DataFrame, extraKey: Seq[String],
      maxHamming: Int, bits: Int): DataFrame = {
    val nSeg = maxHamming + 1
    val base = bits / nSeg
    val widths = (0 until nSeg).map(j => if (j < bits % nSeg) base + 1 else base)
    val shifts = widths.scanLeft(0)(_ + _).init
    val segCols = (0 until nSeg).map(j =>
      expr(s"shiftright(sh32, ${shifts(j)}) & ${(1L << widths(j)) - 1}"))
    val posts = s.select(extraKey.map(col) ++
        Seq(col("id"), col("sh32"), posexplode(array(segCols: _*))): _*)
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "sv")
    val key = extraKey ++ Seq("seg", "sv")
    posts.select(key.map(col) ++
        Seq(col("id").as("id_a"), col("sh32").as("sh_a")): _*)
      .join(posts.select(key.map(col) ++
        Seq(col("id").as("id_b"), col("sh32").as("sh_b")): _*), key)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Blocked SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤
   *  maxHamming within a block. Output (id_a, id_b, hamming).
   *  Candidates come from the pigeonhole posting join WITH the block
   *  as an extra key — semantically identical to a within-block
   *  all-pairs scan (the pigeonhole is lossless at the threshold, and
   *  the oracle runs the unfiltered blocked form), but the plan is a
   *  posting-list equi-join: a block's cost is Σ bucket² within it,
   *  never block². */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, maxHamming: Int): DataFrame =
    pigeonholePairs(simhashed(df, textCol, idCol, blockCol),
      Seq("blk"), maxHamming, bits = 32)

  /** UNBLOCKED SimHash near-dup pairs via the multi-index pigeonhole:
   *  [[pigeonholePairs]] with no extra key — needs no blocking column
   *  at all. This is the hamming-search shape that survives when no
   *  natural block exists at 100 TB. */
  def simhashPairsMultiIndex(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int, bits: Int = 32): DataFrame =
    pigeonholePairs(
      df.select(col(idCol).as("id"),
        graft.functions.HashExpressions.simhashBits(col(textCol), bits).as("sh32")),
      Seq.empty, maxHamming, bits)

  /** Hamming near-dup pairs over an ARBITRARY precomputed fingerprint
   *  column (round-13): the multi-index pigeonhole posting join,
   *  decoupled from the text-simhash front end so non-text
   *  fingerprints — the perceptual image dHash (X140), audio
   *  chromaprints — search through the SAME judged machinery.
   *  `hashes` carries (idCol, hashCol: BIGINT of `bits` significant
   *  bits); output (id_a, id_b, hamming), lossless at the threshold
   *  exactly as [[simhashPairsMultiIndex]] (same candidate engine). */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, bits: Int): DataFrame =
    pigeonholePairs(
      hashes.select(col(idCol).as("id"), col(hashCol).as("sh32")),
      Seq.empty, maxHamming, bits)

  /** VIDEO near-dup pairs by frame-fingerprint containment (X145,
   *  round-13): two clips are near-duplicates when they share more
   *  than `num`/`den` of the smaller clip's DISTINCT per-frame
   *  fingerprints — the set-containment rule video dedup runs once
   *  frames are hashed (a re-encode matches every frame; a re-titled/
   *  spliced copy all but the edited ones). `frames` carries (idCol,
   *  hashCol); candidates come from an equi-join ON THE FINGERPRINT —
   *  a posting-list join exactly like the pigeonhole's (cost Σ over
   *  fingerprint buckets of bucket², never corpus²), then one
   *  map-side-combinable count per surviving pair. All-integer
   *  (cnt·den ≥ min(F_a,F_b)·num), so the oracle replays it exactly.
   *  Output (id_a, id_b, n_common). */
  def frameMatchPairs(frames: DataFrame, idCol: String, hashCol: String,
      num: Int, den: Int): DataFrame = {
    val fp = frames.select(col(idCol).as("id"), col(hashCol).as("fh"))
      .distinct()
    val counts = fp.groupBy(col("id")).agg(count(lit(1)).as("nf"))
    fp.select(col("id").as("id_a"), col("fh"))
      .join(fp.select(col("id").as("id_b"), col("fh")), Seq("fh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(counts.select(col("id").as("id_a"), col("nf").as("nf_a")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("nf").as("nf_b")), "id_b")
      .filter(col("n_common") * den >= least(col("nf_a"), col("nf_b")) * num)
      .select(col("id_a"), col("id_b"), col("n_common"))
  }

  // --------------- evolving Hamming-fingerprint index (X146, r13)

  /** Meta sidecar of a materialized Hamming-fingerprint index (the
   *  perceptual-media twin of [[LshIndexMeta]]): width, threshold,
   *  and corpus fingerprint travel WITH the data, so a probe with
   *  mismatched parameters or against a stale corpus fails loudly. */
  final case class HammingIndexMeta(bits: Int, maxHamming: Int,
      fingerprint: String)

  private val HammingMetaFile = "hamming_index_meta.json"

  def writeHammingIndexMeta(dir: String, m: HammingIndexMeta): Unit =
    graft.core.StoreFs.replaceFileAtomic(s"$dir/$HammingMetaFile",
      s"""{"bits":${m.bits},"maxHamming":${m.maxHamming},""" +
        s""""fingerprint":"${m.fingerprint}"}""")

  def readHammingIndexMeta(dir: String): Option[HammingIndexMeta] =
    graft.core.StoreFs.readPointerFile(s"$dir/$HammingMetaFile").flatMap { s =>
      def num(key: String) =
        s""""$key":(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      def str(key: String) =
        s""""$key":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      for (b <- num("bits"); mh <- num("maxHamming"); fp <- str("fingerprint"))
        yield HammingIndexMeta(b.toInt, mh.toInt, fp)
    }

  /** Materialize a Hamming-fingerprint index: the corpus fingerprints
   *  land as segment `base` of the generic folded-segment store (the
   *  [[graft.operators.Layout.compactSegmentsWith]] contract — the
   *  same store discipline as the LSH/ANN/PQ indexes), meta installs
   *  atomically last. `hashes` carries (idCol, hashCol). */
  def materializeHammingIndex(hashes: DataFrame, idCol: String,
      hashCol: String, dir: String, bits: Int, maxHamming: Int,
      fingerprint: String): Unit = {
    hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .write.mode("overwrite").parquet(s"$dir/data/base")
    writeHammingIndexMeta(dir, HammingIndexMeta(bits, maxHamming, fingerprint))
  }

  /** Live (id, h) rows of a materialized Hamming index — a fresh
   *  segment listing per call, so appends landed since the last probe
   *  are visible (the evolving-index contract). */
  def hammingIndexHashes(spark: org.apache.spark.sql.SparkSession,
      dir: String, expectFingerprint: Option[String] = None): DataFrame = {
    val meta = readHammingIndexMeta(dir).getOrElse(
      throw new IllegalStateException(
        s"hammingIndexHashes: no $HammingMetaFile in $dir"))
    expectFingerprint.foreach { fp =>
      require(meta.fingerprint == fp,
        s"Hamming index at $dir was built for corpus '${meta.fingerprint}' " +
          s"but this probe expects '$fp' — refusing a stale/foreign index")
    }
    val segs = graft.operators.Layout.zLiveSegments(s"$dir/data")
    require(segs.nonEmpty,
      s"Hamming index at $dir has no data segments — it was never " +
        "materialized (or the path is wrong)")
    spark.read.parquet(segs: _*)
  }

  /** Append admitted fingerprints under segment `segment`:
   *  overwrite-per-segment (an at-least-once retry replaces its own
   *  contribution) and a no-op when a compaction already folded this
   *  segment name into a base (re-writing would double-count — the
   *  [[graft.operators.Layout.foldedNames]] rule). */
  def appendToHammingIndex(dir: String, admitted: DataFrame, idCol: String,
      hashCol: String, segment: String): Unit = {
    if (graft.operators.Layout.foldedNames(s"$dir/data").contains(segment))
      return
    admitted.select(col(idCol).as("id"), col(hashCol).as("h"))
      .write.mode("overwrite").parquet(s"$dir/data/$segment")
  }

  /** Fold accumulated per-batch segments into one base when more than
   *  `maxSegments` piled up — the generic crash-safe segment
   *  compaction, content identity. */
  def compactHammingIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxSegments: Int = 64): Boolean =
    graft.operators.Layout.compactSegmentsWith(
      spark, s"$dir/data", "base", maxSegments)(identity)

  /** BIPARTITE Hamming pairs — new fingerprints probed against an
   *  index, the [[hammingPairs]] pigeonhole with the two sides kept
   *  apart (the [[minhashLshPairsAgainstIndex]] shape): any pair
   *  within hamming ≤ maxHamming agrees exactly on one of the
   *  maxHamming+1 segments, so candidates come from a posting join of
   *  the batch's segment keys against the index's — cost
   *  O(|batch| · bucket), never |batch|·|index|. `newHashes` carries
   *  (idCol, hashCol); `index` carries (id, h). Output (new_id,
   *  old_id, hamming), lossless at the threshold. */
  def hammingPairsAgainstIndex(newHashes: DataFrame, idCol: String,
      hashCol: String, index: DataFrame, maxHamming: Int,
      bits: Int): DataFrame = {
    val nSeg = maxHamming + 1
    val base = bits / nSeg
    val widths = (0 until nSeg).map(j => if (j < bits % nSeg) base + 1 else base)
    val shifts = widths.scanLeft(0)(_ + _).init
    def posts(df: DataFrame, id: String, h: String, outId: String,
        outH: String): DataFrame = {
      val segCols = (0 until nSeg).map(j =>
        expr(s"shiftright($h, ${shifts(j)}) & ${(1L << widths(j)) - 1}"))
      df.select(col(id).as(outId), col(h).as(outH),
          posexplode(array(segCols: _*)))
        .withColumnRenamed("pos", "seg").withColumnRenamed("col", "sv")
    }
    // same-id matches are excluded: an at-least-once redelivery probes
    // an index that already holds the batch's own survivors, and must
    // admit the identical set (the idempotency contract every evolving
    // screen here shares)
    posts(newHashes, idCol, hashCol, "new_id", "h_new")
      .join(posts(index, "id", "h", "old_id", "h_old"), Seq("seg", "sv"))
      .filter(col("new_id") =!= col("old_id"))
      .select(col("new_id"), col("old_id"), col("h_new"), col("h_old"))
      .distinct()
      .select(col("new_id"), col("old_id"),
        expr("bit_count(h_new ^ h_old)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** WIDTH-ADAPTIVE multi-index SimHash pairs (r7, removes X36's sf10
   *  skip): [[simhashPairsMultiIndex]] with the simhash width derived
   *  from the corpus size ([[adaptiveSimhashBits]]) so segment
   *  buckets track log₂(corpus) and the posting join stays linear at
   *  every scale factor — the fixed-32-bit form's 10-bit worst
   *  segment measured saturating at ~10⁵ docs. One extra count
   *  action; the SQL twin derives the identical width via scalar
   *  subquery. NOTE the OUTPUT is width-dependent by design (hamming
   *  distance over more bits) — the oracle derives the same width, so
   *  the contract is "adaptive simhash pairs", not "32-bit pairs". */
  def simhashPairsMultiIndexAdaptive(df: DataFrame, textCol: String,
      idCol: String, maxHamming: Int): DataFrame =
    simhashPairsMultiIndex(df, textCol, idCol, maxHamming,
      adaptiveSimhashBits(df.count()))

  /** Oracle for [[simhashPairsMultiIndex]]: the UNFILTERED all-pairs
   *  formulation — a multi-index bug (a dropped candidate) cannot pass
   *  verification. */
  def simhashPairsMultiIndexSql(table: String, textCol: String,
      idCol: String, maxHamming: Int, bits: Int = 32): String =
    simhashPairsMultiIndexSqlExpr(table, textCol, idCol, maxHamming,
      bits.toString)

  /** [[simhashPairsMultiIndexSql]] with the width as a SQL expression —
   *  the adaptive oracle passes [[adaptiveSimhashBitsSql]]. */
  def simhashPairsMultiIndexSqlExpr(table: String, textCol: String,
      idCol: String, maxHamming: Int, bitsSql: String): String = {
    val sh = simhashBitsSqlExpr(TextFunctions.lowerTokensSql(textCol), bitsSql)
    s"""WITH s AS (SELECT $idCol AS id, $sh AS sh32 FROM $table)
       |SELECT * FROM (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |         CAST(bit_count(xor(a.sh32, b.sh32)) AS BIGINT) AS hamming
       |  FROM s a JOIN s b ON a.id < b.id
       |) WHERE hamming <= $maxHamming""".stripMargin
  }

  def simhashPairsSql(table: String, textCol: String, idCol: String,
      blockCol: String, maxHamming: Int): String = {
    val sh = simhash32Sql(TextFunctions.lowerTokensSql(textCol))
    s"""WITH s AS (SELECT $idCol AS id, $blockCol AS blk, $sh AS sh32 FROM $table)
       |SELECT * FROM (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |         CAST(bit_count(xor(a.sh32, b.sh32)) AS BIGINT) AS hamming
       |  FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
       |) WHERE hamming <= $maxHamming""".stripMargin
  }

  // ----------------------------------------------- paragraph dedup

  /** Paragraph-level exact dedup (X64) — the C4/Dolma boilerplate
   *  removal step: split every document on `sep`, keep only the FIRST
   *  corpus-wide occurrence of each paragraph (first = min (doc, pos)
   *  lexicographically — deterministic, replay-stable), and
   *  reassemble the surviving paragraphs in their original order.
   *  Repeated footers/headers/navigation chrome vanish everywhere but
   *  their first sighting; a fully-boilerplate document collapses to
   *  the empty string (and is a candidate for a length gate
   *  downstream).
   *
   *  Scale shape: the global winner election aggregates on the
   *  64-bit h60 CONTENT HASH of the paragraph — the exchange carries
   *  (hash, doc, pos), never paragraph text; one more hash join
   *  filters occurrences to winners, and reassembly is a per-document
   *  bounded aggregation (collect_list state ≤ the document's own
   *  paragraph count — the same bounded-by-row-size argument as
   *  chunking/media). Both Spark's `split` (limit −1) and DuckDB's
   *  `string_split` KEEP trailing empty fields, so the two engines
   *  see identical paragraph lists. */
  def dedupParagraphs(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "para")))
      .withColumn("h", Hashing.h60(col("para")))
    val winners = paras.groupBy(col("h"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col("h"), col(s"w.$idCol").as("w_id"), col("w.pos").as("w_pos"))
    val kept = paras.join(winners, Seq("h"))
      .filter(col(idCol) === col("w_id") && col("pos") === col("w_pos"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(expr("transform(array_sort(collect_list(struct(pos, para))), " +
        "x -> x.para)"), sep).as(textCol))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .na.fill(Map(textCol -> ""))
  }

  /** Cross-document repeated-substring screen — the relational form
   *  of the suffix-array dedup criterion ("Deduplicating Training
   *  Data Makes Language Models Better", Lee et al. 2022: flag long
   *  token spans that recur verbatim across the corpus). Every doc is
   *  cut into ALL word k-windows (positional, overlapping — one per
   *  token position, so the share weighs text volume); a window is
   *  CONTAMINATED iff its exact text occurs in ≥ 2 distinct
   *  documents. Output per doc: total windows, contaminated windows,
   *  and the contaminated share in integer micro-units — the score a
   *  curation pipeline thresholds to drop template/boilerplate-heavy
   *  docs that per-doc dedup (X5–X8 operate on whole docs,
   *  [[dedupParagraphs]] on separator-delimited blocks) cannot see.
   *
   *  Shape at 100 TB: windows are h60-hashed INSIDE the per-doc
   *  projection ([[graft.functions.HashExpressions.h60Array]] on the
   *  window array), so the explode — and both downstream exchanges —
   *  carry (doc_id, 8-byte hash) only, never window text. The
   *  exploded frame is persisted (it feeds the global occurrence agg
   *  AND the scoring join); the occurrence agg is a two-phase
   *  count-distinct on the window key (partial per partition);
   *  scoring is a posting join back on the same key, then one
   *  per-doc fold. Work is linear in total corpus tokens — the
   *  window multiset is k× the token count, constant factor. */
  def repeatedWindowShare(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val wh = df
      .select(col(idCol), TextFunctions.lowerTokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(graft.functions.HashExpressions
        .h60Array(TextFunctions.wordWindows("__toks", k))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = wh.groupBy(col("w"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    wh.join(occ, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("dup_windows"))
      .select(col(idCol), col("n_windows"), col("dup_windows"),
        expr("(dup_windows * 1000000) div n_windows").as("dup_share_micro"))
  }

  /** DuckDB oracle twin: same lowered-whitespace windows, same h60
   *  window key (md5-derived, bit-equal both engines), same ≥2
   *  distinct docs rule and integer micro-share. */
  def repeatedWindowShareSql(table: String, idCol: String,
      textExpr: String, k: Int): String = {
    val windows = TextFunctions.wordWindowsSql(
      TextFunctions.lowerTokensSql(textExpr), k)
    s"""WITH wh AS (
       |  SELECT $idCol, ${Hashing.h60Sql("w")} AS w FROM (
       |    SELECT $idCol, unnest($windows) AS w FROM $table)),
       |occ AS (SELECT w, count(DISTINCT $idCol) AS nd FROM wh GROUP BY w)
       |SELECT $idCol, count(*) AS n_windows,
       |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dup_windows,
       |  CAST((sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000000) //
       |    count(*) AS BIGINT) AS dup_share_micro
       |FROM wh JOIN occ USING (w) GROUP BY $idCol""".stripMargin
  }

  /** DuckDB oracle twin: same h60 winner election (md5-derived, both
   *  engines), window row_number as the min-(doc,pos) tie-break,
   *  ORDER BY pos inside string_agg for the reassembly. */
  /** Cross-document repeated-SPAN removal (X91) — the practical form
   *  of exact substring dedup (Lee et al. 2021, "Deduplicating
   *  Training Data Makes Language Models Better", arXiv:2107.06499,
   *  whose released dedup operates at 50-token granularity): any
   *  ≥ `k`-token word sequence appearing in MORE THAN ONE document is
   *  cut from every document except the lowest-id owner, and each
   *  document's surviving tokens are reassembled. Unlike document- or
   *  paragraph-level dedup (X5/X64), this removes boilerplate that
   *  rides INSIDE otherwise-unique documents — licenses, navigation
   *  chrome, quoted headers.
   *
   *  Dataflow, all token-linear (the paper's global suffix array is
   *  replaced by fixed-k hashed windows — detects every repeat of
   *  length ≥ k, the same practical granularity choice the paper's
   *  tool makes):
   *   1. positional k-windows per doc, h60-keyed (the q95 kernel);
   *   2. ONE hash agg per window key → (owner = min doc, distinct-doc
   *      count) — map-side partials, never a pair join;
   *   3. flagged (doc, pos) = window keys seen in ≥ 2 docs, in every
   *      non-owner doc; overlapping/adjacent flags merge into maximal
   *      spans by gaps-and-islands (the window function partitions by
   *      DOC — per-doc bounded, no global sort);
   *   4. span token-positions explode (islands are disjoint, so the
   *      explode is ≤ tokens) and anti-join the doc's positional
   *      tokens; survivors reassemble in position order.
   *
   *  Contract: output text is the LOWERED, single-space-joined token
   *  stream (the shared tokenizer's normalization — position-exact
   *  reconstruction would need original offsets, which whitespace
   *  tokenization deliberately discards); a fully-boilerplate doc
   *  survives as an empty string, never a dropped row. The OWNER
   *  keeps all its occurrences — cutting every copy would delete the
   *  canonical text too. Output: (id, n_tok, n_cut, text_clean). */
  def cutRepeatedSpans(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO pin at all (round-9 revision of the r8 checkpoint trade):
    // the token projection is RECOMPUTED by its consumers (the window
    // pass and the rebuild) — one extra narrow tokenize pass over the
    // text. The r8 localCheckpoint was measured safe in a 119-query
    // session, but its blocks bypass CacheManager and free only on
    // driver GC: the r9 124-query sf10 sweep measured q119's
    // in-sequence time at 82 s against a 31 s isolated control with
    // this pin as the session's remaining resident (its siblings
    // q94/q121/q122 were de-pinned first and their contamination
    // vanished). A persist is no better here — the result returns
    // lazily, so there is no unpersist point (the vocabCoverage
    // lesson). Recompute also holds at 100 TB, where a token-array
    // frame is a multiple of the text it came from.
    def base = df
      .select(col(idCol), TextFunctions.lowerTokens(col(textCol)).as("__toks"))
    val wh = base.select(col(idCol),
      posexplode(graft.functions.HashExpressions
        .h60Array(TextFunctions.wordWindows("__toks", k))).as(Seq("p", "w")))
    val occ = wh.groupBy(col("w"))
      .agg(min(col(idCol)).as("__owner"), countDistinct(col(idCol)).as("__nd"))
    val flagged = wh.join(occ, Seq("w"))
      .filter(col("__nd") >= 2 && col(idCol) =!= col("__owner"))
      .select(col(idCol), col("p"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val islands = flagged
      .withColumn("__new",
        when(col("p") > coalesce(max(col("p") + k).over(byDoc), lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        Window.partitionBy(col(idCol)).orderBy(col("p"))))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("p")).as("__s"), (max(col("p")) + k).as("__e"))
    // covered's id is RENAMED before the anti join: both frames share
    // base's lineage, and `toks(id) === covered(id)` could silently
    // resolve to one attribute (the stratifiedCap lesson)
    val covered = islands.select(col(idCol).as("__cid"),
      explode(expr("sequence(__s, __e - 1)")).as("__cpos"))
    val toks = base.select(col(idCol),
      posexplode(col("__toks")).as(Seq("__tpos", "__t")))
    val kept = toks.join(covered,
        col(idCol) === col("__cid") && col("__tpos") === col("__cpos"),
        "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nkept"),
        expr("array_join(transform(array_sort(collect_list(struct(__tpos, __t))), " +
          "x -> x.__t), ' ')").as("__clean"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tok"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        (col("n_tok") - coalesce(col("__nkept"), lit(0L))).as("n_cut"),
        coalesce(col("__clean"), lit("")).as("text_clean"))
  }

  /** DuckDB oracle twin — identical chain: same windows and h60 keys,
   *  same owner/distinct-doc rule, the same gaps-and-islands merge
   *  (window functions), position anti-join, ordered reassembly. */
  def cutRepeatedSpansSql(table: String, textExpr: String, idCol: String,
      k: Int): String = {
    val toks = TextFunctions.lowerTokensSql(textExpr)
    val h = graft.functions.Hashing.h60Sql("win")
    s"""WITH base AS (SELECT $idCol AS id, $toks AS toks FROM $table),
       |wins AS (SELECT id, i - 1 AS p, $h AS w FROM (
       |  SELECT id, unnest(ws) AS win, generate_subscripts(ws, 1) AS i
       |  FROM (SELECT id, ${TextFunctions.wordWindowsSql("toks", k)} AS ws
       |        FROM base))),
       |occ AS (SELECT w, min(id) AS owner, count(DISTINCT id) AS nd
       |        FROM wins GROUP BY w),
       |flagged AS (SELECT id, p FROM wins JOIN occ USING (w)
       |            WHERE nd >= 2 AND id <> owner),
       |isl AS (SELECT id, p, CAST(sum(newi) OVER (
       |          PARTITION BY id ORDER BY p) AS BIGINT) AS isl FROM (
       |  SELECT id, p, CASE WHEN p > COALESCE(max(p + $k) OVER (
       |    PARTITION BY id ORDER BY p
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |    THEN 1 ELSE 0 END AS newi FROM flagged)),
       |spans AS (SELECT id, min(p) AS s, max(p) + $k AS e
       |          FROM isl GROUP BY id, isl),
       |covered AS (SELECT id, unnest(range(s, e)) AS cpos FROM spans),
       |postoks AS (SELECT id, i - 1 AS tpos, t FROM (
       |  SELECT id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i
       |  FROM base)),
       |kept AS (SELECT t.id, CAST(count(*) AS BIGINT) AS nkept,
       |           array_to_string(list(t.t ORDER BY t.tpos), ' ') AS clean
       |         FROM postoks t LEFT JOIN covered c
       |           ON t.id = c.id AND t.tpos = c.cpos
       |         WHERE c.id IS NULL GROUP BY t.id)
       |SELECT b.id AS $idCol, CAST(length(b.toks) AS BIGINT) AS n_tok,
       |  CAST(length(b.toks) - COALESCE(k.nkept, 0) AS BIGINT) AS n_cut,
       |  COALESCE(k.clean, '') AS text_clean
       |FROM base b LEFT JOIN kept k ON b.id = k.id""".stripMargin
  }

  // ----------------------------------------- lossless span cuts (X92)

  /** Character offsets of every whitespace-delimited token in the
   *  ORIGINAL text: (id, tpos, tok, s, e) with text.substring(s, e)
   *  == tok (0-based, end-exclusive, code-point offsets). No UDF and
   *  no per-character explode: tokens and separator runs are
   *  extracted with `regexp_extract_all` (both engines), interleaved
   *  by a computed chunk index (leading-whitespace flag decides which
   *  comes first), and offsets fall out of ONE per-doc running sum of
   *  chunk lengths — linear in text, windowed per doc, never a global
   *  sort. This is what [[cutRepeatedSpans]] deliberately discards
   *  (its contract is the lowered token stream); the offsets variant
   *  below keeps the original bytes addressable. */
  private[graft] def tokenCharOffsets(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = df.select(col(idCol), col(textCol).as("__text"))
      .select(col(idCol),
        when(col("__text").rlike("^\\s"), lit(1)).otherwise(lit(0))
          .as("__lead"),
        expr("regexp_extract_all(__text, '\\\\S+', 0)").as("__tks"),
        expr("regexp_extract_all(__text, '\\\\s+', 0)").as("__sps"))
    val tk = ch.select(col(idCol), col("__lead"),
        posexplode(col("__tks")).as(Seq("__i", "__c")))
      .select(col(idCol), col("__i").cast("long").as("tpos"), col("__c"),
        (lit(2L) * col("__i") + col("__lead")).as("__cidx"),
        lit(1).as("__istok"))
    val sp = ch.select(col(idCol), col("__lead"),
        posexplode(col("__sps")).as(Seq("__i", "__c")))
      .select(col(idCol), lit(null).cast("long").as("tpos"), col("__c"),
        (lit(2L) * col("__i") + lit(1) - col("__lead")).as("__cidx"),
        lit(0).as("__istok"))
    val run = Window.partitionBy(col(idCol)).orderBy(col("__cidx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tk.unionByName(sp)
      .withColumn("__s",
        coalesce(sum(length(col("__c")).cast("long")).over(run), lit(0L)))
      .filter(col("__istok") === 1)
      .select(col(idCol), col("tpos"), col("__c").as("tok"),
        col("__s").as("s"), (col("__s") + length(col("__c"))).as("e"))
  }

  /** Cross-document repeated spans AGAINST THE ORIGINAL TEXT (X92 —
   *  the lossless form of [[cutRepeatedSpans]], which returns the
   *  lowered single-space token stream): the same fixed-k hashed
   *  window detection, owner rule and gaps-and-islands merge, but the
   *  result is (id, s_char, e_char, cut_text) character spans into
   *  the UNTOUCHED input — callers cut (or audit) losslessly, and
   *  concatenating kept + cut slices reproduces the input
   *  byte-for-byte (spec-pinned). A span runs from the first flagged
   *  token's first char to the last flagged token's last char;
   *  whitespace flanking the span stays with the kept text.
   *
   *  Tokenization note: window keys lower the tokens (a repeat in
   *  different case is still boilerplate) but positions index the
   *  `\S+` runs of the ORIGINAL text, so every flagged token position
   *  has an exact char offset; a whitespace-only doc has no tokens
   *  and no spans. Same scale shape as q119: exchanges carry (doc,
   *  h60) only, all windows partition per doc, offsets are one
   *  running sum — token-linear end to end. */
  def repeatedSpanOffsets(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO pin: `base` is recomputed by its two consumers (the window
    // pass and the tiny ntok join) — one extra narrow regexp pass
    // over the text beats materializing every document's token array
    // (a localCheckpoint here bypassed CacheManager and its blocks
    // accumulated across a many-query session until driver GC — the
    // sf10 sweep measured q121's repeats climbing 50 → 96 s under
    // exactly that storage pressure)
    def base = df.select(col(idCol),
        expr(s"transform(regexp_extract_all(`$textCol`, '\\\\S+', 0), " +
          "t -> lower(t))").as("__toks"))
      .filter(size(col("__toks")) > 0)
    val wh = base.select(col(idCol),
      posexplode(graft.functions.HashExpressions
        .h60Array(TextFunctions.wordWindows("__toks", k))).as(Seq("p", "w")))
    val occ = wh.groupBy(col("w"))
      .agg(min(col(idCol)).as("__owner"), countDistinct(col(idCol)).as("__nd"))
    val flagged = wh.join(occ, Seq("w"))
      .filter(col("__nd") >= 2 && col(idCol) =!= col("__owner"))
      .select(col(idCol), col("p"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val islands = flagged
      .withColumn("__new",
        when(col("p") > coalesce(max(col("p") + k).over(byDoc), lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        Window.partitionBy(col(idCol)).orderBy(col("p"))))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("p")).cast("long").as("__stok"),
        (max(col("p")) + k).cast("long").as("__etok"))
      .join(base.select(col(idCol),
        size(col("__toks")).cast("long").as("__ntok")), Seq(idCol))
      .select(col(idCol).as("__sid"), col("__stok"),
        (least(col("__etok"), col("__ntok")) - 1L).as("__lasttok"))
    // ONE equi-join resolves both island endpoints: each island
    // unpivots into ≤ 2 (doc, tpos) probe rows, so the token-offsets
    // frame is evaluated exactly once and never checkpointed (a
    // token-sized pin — the r9 bench measured it as q121's cost
    // center; two separate endpoint joins would evaluate the chunk
    // windows twice).
    // no distinct: a one-token island (stok == lasttok) just probes
    // its row twice, and the endpoint min/max below absorbs the dup —
    // a distinct here would be a whole extra shuffle
    val probes = islands.select(col("__sid"), col("__stok"),
        col("__lasttok"),
        explode(array(col("__stok"), col("__lasttok"))).as("__ptpos"))
    val offs = tokenCharOffsets(df, textCol, idCol)
      .select(col(idCol).as("__oid"), col("tpos").as("__otpos"),
        col("s").as("__os"), col("e").as("__oe"))
    probes
      .join(offs, col("__sid") === col("__oid") &&
        col("__ptpos") === col("__otpos"))
      .groupBy(col("__sid"), col("__stok"), col("__lasttok"))
      .agg(min(when(col("__otpos") === col("__stok"), col("__os")))
          .as("s_char"),
        max(when(col("__otpos") === col("__lasttok"), col("__oe")))
          .as("e_char"))
      .join(df.select(col(idCol).as("__did"), col(textCol).as("__text")),
        col("__sid") === col("__did"))
      .select(col("__sid").as(idCol), col("s_char"), col("e_char"),
        expr("substring(__text, cast(s_char as int) + 1, " +
          "cast(e_char - s_char as int))").as("cut_text"))
  }

  /** Apply character spans to the original documents: (id, text_kept,
   *  text_cut) where text_kept is the input with every [s_char,
   *  e_char) range removed and text_cut is the removed slices in
   *  order — text_kept and text_cut interleave back to the input
   *  exactly. Spans must be disjoint per id ([[repeatedSpanOffsets]]
   *  guarantees it — islands are maximal); docs without spans pass
   *  through with an empty text_cut. Per-doc window over a handful of
   *  span rows + one bounded ordered fold — nothing global. */
  def cutCharSpans(docs: DataFrame, textCol: String, idCol: String,
      spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__cid")).orderBy(col("s_char"))
    val pieces = spans
      .select(col(idCol).as("__cid"), col("s_char"), col("e_char"))
      .join(docs.select(col(idCol).as("__cid"), col(textCol).as("__t")),
        "__cid")
      .withColumn("__pe", coalesce(lag(col("e_char"), 1).over(w), lit(0L)))
      .select(col("__cid"), col("s_char"), col("e_char"),
        expr("substring(__t, cast(__pe as int) + 1, " +
          "cast(s_char - __pe as int))").as("__keep"),
        expr("substring(__t, cast(s_char as int) + 1, " +
          "cast(e_char - s_char as int))").as("__cut"))
    val agg = pieces.groupBy(col("__cid")).agg(
      expr("array_join(transform(array_sort(collect_list(" +
        "struct(s_char, __keep))), x -> x.__keep), '')").as("__kh"),
      expr("array_join(transform(array_sort(collect_list(" +
        "struct(s_char, __cut))), x -> x.__cut), '')").as("__tc"),
      max(col("e_char")).as("__maxe"))
    docs.select(col(idCol), col(textCol).as("__t"))
      .join(agg, col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        when(col("__cid").isNull, col("__t"))
          .otherwise(concat(col("__kh"),
            expr("substring(__t, cast(__maxe as int) + 1)")))
          .as("text_kept"),
        coalesce(col("__tc"), lit("")).as("text_cut"))
  }

  /** Shared DuckDB CTE chain deriving `__spans(id, s, e)` (plus
   *  `__docs(id, text)`) — the oracle twin of [[repeatedSpanOffsets]]:
   *  identical `\S+`/`\s+` chunk interleave, running-sum offsets,
   *  lowered window keys, owner rule, islands, and token→char join. */
  private def spanOffsetsCtes(table: String, textExpr: String,
      idCol: String, k: Int): String = {
    val h = Hashing.h60Sql("win")
    s"""__docs AS (SELECT $idCol AS id, $textExpr AS text FROM $table),
       |__ch AS (SELECT id, text,
       |    CASE WHEN regexp_matches(text, '^${TextFunctions.wsClassSql}')
       |      THEN 1 ELSE 0 END AS ld,
       |    regexp_extract_all(text, '${TextFunctions.nonWsClassSql}+') AS tks,
       |    regexp_extract_all(text, '${TextFunctions.wsClassSql}+') AS sps
       |  FROM __docs),
       |__tk AS (SELECT id, i - 1 AS tpos, t AS c,
       |    2 * (i - 1) + ld AS cidx, 1 AS istok
       |  FROM (SELECT id, ld, unnest(tks) AS t,
       |          generate_subscripts(tks, 1) AS i FROM __ch)),
       |__sp AS (SELECT id, CAST(NULL AS BIGINT) AS tpos, t AS c,
       |    2 * (i - 1) + 1 - ld AS cidx, 0 AS istok
       |  FROM (SELECT id, ld, unnest(sps) AS t,
       |          generate_subscripts(sps, 1) AS i FROM __ch)),
       |__offs AS (SELECT id, tpos, c AS tok, st AS s,
       |    st + length(c) AS e FROM (
       |  SELECT id, tpos, c, istok, CAST(COALESCE(sum(length(c)) OVER (
       |      PARTITION BY id ORDER BY cidx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS st
       |  FROM (SELECT * FROM __tk UNION ALL SELECT * FROM __sp))
       |  WHERE istok = 1),
       |__base AS (SELECT id, list_transform(tks, t -> lower(t)) AS toks
       |           FROM __ch WHERE length(tks) > 0),
       |__wins AS (SELECT id, i - 1 AS p, $h AS w FROM (
       |  SELECT id, unnest(ws) AS win, generate_subscripts(ws, 1) AS i
       |  FROM (SELECT id, ${TextFunctions.wordWindowsSql("toks", k)} AS ws
       |        FROM __base))),
       |__occ AS (SELECT w, min(id) AS owner, count(DISTINCT id) AS nd
       |          FROM __wins GROUP BY w),
       |__flag AS (SELECT id, p FROM __wins JOIN __occ USING (w)
       |           WHERE nd >= 2 AND id <> owner),
       |__isl AS (SELECT id, p, CAST(sum(newi) OVER (
       |    PARTITION BY id ORDER BY p) AS BIGINT) AS isl FROM (
       |  SELECT id, p, CASE WHEN p > COALESCE(max(p + $k) OVER (
       |      PARTITION BY id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |    THEN 1 ELSE 0 END AS newi FROM __flag)),
       |__tokspans AS (SELECT i.id, min(i.p) AS stok,
       |    least(max(i.p) + $k, b.ntok) - 1 AS lasttok
       |  FROM __isl i JOIN (SELECT id, length(toks) AS ntok FROM __base) b
       |    USING (id)
       |  GROUP BY i.id, i.isl, b.ntok),
       |__spans AS (SELECT t.id, os.s AS s, oe.e AS e
       |  FROM __tokspans t
       |  JOIN __offs os ON os.id = t.id AND os.tpos = t.stok
       |  JOIN __offs oe ON oe.id = t.id AND oe.tpos = t.lasttok)""".stripMargin
  }

  /** DuckDB twin of [[repeatedSpanOffsets]]. */
  def repeatedSpanOffsetsSql(table: String, textExpr: String,
      idCol: String, k: Int): String =
    s"""WITH ${spanOffsetsCtes(table, textExpr, idCol, k)}
       |SELECT s.id AS $idCol, s.s AS s_char, s.e AS e_char,
       |  substring(d.text, CAST(s.s AS INTEGER) + 1,
       |    CAST(s.e - s.s AS INTEGER)) AS cut_text
       |FROM __spans s JOIN __docs d ON s.id = d.id""".stripMargin

  /** DuckDB twin of [[repeatedSpanOffsets]] + [[cutCharSpans]] end to
   *  end: (id, text_kept, text_cut) for EVERY document. */
  def cutCharSpansSql(table: String, textExpr: String, idCol: String,
      k: Int): String =
    s"""WITH ${spanOffsetsCtes(table, textExpr, idCol, k)},
       |__pieces AS (SELECT s.id, s.s, s.e,
       |    substring(d.text, CAST(COALESCE(lag(s.e) OVER w, 0) AS INTEGER) + 1,
       |      CAST(s.s - COALESCE(lag(s.e) OVER w, 0) AS INTEGER)) AS keep_p,
       |    substring(d.text, CAST(s.s AS INTEGER) + 1,
       |      CAST(s.e - s.s AS INTEGER)) AS cut_p
       |  FROM __spans s JOIN __docs d ON s.id = d.id
       |  WINDOW w AS (PARTITION BY s.id ORDER BY s.s)),
       |__agg AS (SELECT id, string_agg(keep_p, '' ORDER BY s) AS kh,
       |    string_agg(cut_p, '' ORDER BY s) AS tc, max(e) AS maxe
       |  FROM __pieces GROUP BY id)
       |SELECT d.id AS $idCol,
       |  CASE WHEN a.id IS NULL THEN d.text
       |       ELSE a.kh || substring(d.text, CAST(a.maxe AS INTEGER) + 1)
       |  END AS text_kept,
       |  COALESCE(a.tc, '') AS text_cut
       |FROM __docs d LEFT JOIN __agg a ON d.id = a.id""".stripMargin

  def dedupParagraphsSql(table: String, textExpr: String, idCol: String,
      sepSql: String): String =
    s"""SELECT t.$idCol, coalesce(r.txt, '') AS text FROM $table t
       |LEFT JOIN (
       |  SELECT $idCol, string_agg(para, $sepSql ORDER BY pos) AS txt FROM (
       |    SELECT $idCol, pos, para FROM (
       |      SELECT $idCol, pos, para, row_number() OVER (
       |        PARTITION BY ${Hashing.h60Sql("para")}
       |        ORDER BY $idCol, pos) AS rn
       |      FROM (
       |        SELECT $idCol, (u.s).pos AS pos, (u.s).para AS para FROM (
       |          SELECT $idCol, unnest(list_transform(
       |            range(1, length(parts) + 1),
       |            i -> {'pos': i - 1, 'para': parts[i]})) AS s
       |          FROM (SELECT $idCol, string_split($textExpr, $sepSql)
       |                  AS parts FROM $table)
       |        ) u
       |      )
       |    ) WHERE rn = 1
       |  ) GROUP BY $idCol
       |) r USING ($idCol)""".stripMargin

  // ------------------------------------------- representative election

  /** Duplicate-cluster representative election: for each near-dup
   *  cluster, KEEP the best member — highest `weightCol` (longest /
   *  highest-quality copy), ties to the lowest id — instead of the
   *  arbitrary keep-first the plain apply step uses. This is the
   *  curation refinement real pipelines run between clustering (X38)
   *  and the apply anti-join (X28): near-dup groups usually contain
   *  one most-complete copy worth keeping. Output:
   *  (cluster_id, rep_id, rep_weight, n_members).
   *
   *  Shape at 100 TB: one skinny join (cluster assignment ⋈ the
   *  weight column) + ONE hash aggregation with O(1) state per
   *  cluster — the argmax is a lexicographic min(struct), never a
   *  cluster-partitioned rank window (clusters can be huge and few,
   *  the q25 lesson); map-side partials reduce each task to one
   *  candidate per cluster before the exchange. Integral weights
   *  keep the election exact cross-engine; NULL-weight members are
   *  excluded from candidacy (Spark's struct ordering sorts a NULL
   *  first field SMALLEST, so an unfiltered NULL row would win the
   *  min(-w) and elect the one member with no weight — the opposite
   *  of the contract and of the oracle's NULLS LAST ranking). A
   *  cluster whose every member lacks a weight elects nobody. */
  def electRepresentatives(clusters: DataFrame, meta: DataFrame,
      idCol: String, weightCol: String): DataFrame =
    clusters.join(meta.select(col(idCol), col(weightCol)), Seq(idCol))
      .filter(col(weightCol).isNotNull)
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col(weightCol)).as("negw"), col(idCol).as("id")))
          .as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("best.id").as("rep_id"),
        (-col("best.negw")).as("rep_weight"), col("n_members"))

  /** DuckDB oracle twin over a clusters relation exposing
   *  ($idCol, cluster_id): the window formulation — correct at
   *  oracle scale, the one-reducer-per-cluster shape the aggregate
   *  form avoids. Same NULL-weight exclusion as the engine. */
  def electRepresentativesSql(clustersSql: String, table: String,
      idCol: String, weightCol: String): String =
    s"""SELECT cluster_id, $idCol AS rep_id, $weightCol AS rep_weight,
       |  n_members FROM (
       |  SELECT c.cluster_id, d.$idCol, d.$weightCol,
       |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY d.$weightCol DESC, d.$idCol) AS r
       |  FROM ($clustersSql) c JOIN $table d USING ($idCol)
       |  WHERE d.$weightCol IS NOT NULL)
       |WHERE r = 1""".stripMargin
}
