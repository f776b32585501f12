package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** X56's scale contract, pinned: a multi-batch streaming ingest screen
 *  derives the corpus-side LSH index ONCE (one pass over the corpus
 *  text, at index-materialization time) and micro-batches only probe
 *  the materialized index — batch N+1 must NOT rescan or re-sign the
 *  corpus. The probe is a nondeterministic counting UDF wrapped
 *  around the corpus text column: nondeterminism stops Catalyst from
 *  collapsing/duplicating the projection, so the accumulator counts
 *  true row-scans of the text. At 100 TB with a continuous stream,
 *  any per-batch corpus pass is the difference between an O(batch)
 *  screen and a full-corpus job per micro-batch. */
class ScanOnceSpec extends SparkTestBase {

  test("screenIngest scans the corpus text exactly once across a multi-batch drain") {
    import spark.implicits._
    val corpusRows = 40
    val corpus0 = (0 until corpusRows).map(i =>
      (i.toLong, s"the quick brown fox number $i jumps over the lazy dog ${i % 7}"))
      .toDF("doc_id", "text")
    val scans = spark.sparkContext.longAccumulator("corpus_text_scans")
    val touch = udf { (t: String) => scans.add(1); t }.asNondeterministic()
    val corpus = corpus0.withColumn("text", touch(col("text")))

    // three separate parquet part files + maxFilesPerTrigger=1 force a
    // genuinely multi-batch drain (asserted below, so a layout change
    // can't silently turn this into a single-batch non-test)
    val inDir = Streams.scratchDir("graft_scanonce_in_")
    (0 until 3).foreach { b =>
      (0 until 5).map { i =>
        (1000L + b * 10 + i,
          if (i == 0) // exact dup of corpus doc b — must be screened out
            s"the quick brown fox number $b jumps over the lazy dog ${b % 7}"
          else s"totally novel content ${b}_$i with no duplicate anywhere")
      }.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    }
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)

    val batches = scala.collection.mutable.Set.empty[Long]
    val survivors = scala.collection.mutable.Set.empty[Long]
    val q = Streams.screenIngest(stream, corpus, "text", "doc_id", 3, 16, 4, 0.8) {
      (df, batchId) =>
        val ids = df.select("doc_id").collect().map(_.getLong(0))
        batches.synchronized { batches += batchId }
        survivors.synchronized { survivors ++= ids }
    }.option("checkpointLocation", Streams.scratchDir("graft_scanonce_ckpt_"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(batches.size >= 3, s"expected a multi-batch drain, got batches $batches")
    assert(scans.value == corpusRows,
      s"corpus text scanned ${scans.value} row-reads for $corpusRows rows — " +
        "the index build is the only allowed pass; micro-batches must not rescan the corpus")
    val dups = Set(1000L, 1010L, 1020L)
    assert(survivors.toSet == (1000L until 1030L by 1L).filter(i =>
      i % 10 < 5 && !dups.contains(i)).toSet,
      s"survivors wrong: $survivors")
  }

  test("EVOLVING screen also scans the corpus text exactly once — appends bill only batch text") {
    import spark.implicits._
    import graft.operators.Dedup
    val corpusRows = 30
    val corpus0 = (0 until corpusRows).map(i =>
      (i.toLong, s"the quick brown fox number $i jumps over the lazy dog ${i % 7}"))
      .toDF("doc_id", "text")
    val scans = spark.sparkContext.longAccumulator("corpus_text_scans_evo")
    val touch = udf { (t: String) => scans.add(1); t }.asNondeterministic()
    val corpus = corpus0.withColumn("text", touch(col("text")))

    val ixDir = Streams.scratchDir("graft_scanonce_ix_")
    Dedup.initLshIndexDir(corpus, "text", "doc_id", 3, 16, 4, ixDir, "fp-scan")
    assert(scans.value == corpusRows,
      s"index init should be ONE corpus pass, measured ${scans.value}")

    val inDir = Streams.scratchDir("graft_scanonce_evo_in_")
    (0 until 3).foreach { b =>
      (0 until 4).map { i =>
        (2000L + b * 10 + i, s"fresh evolving content ${b}_$i nothing like the corpus")
      }.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    }
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val batches = scala.collection.mutable.Set.empty[Long]
    val q = Streams.screenIngestEvolving(stream, ixDir, "text", "doc_id", 0.8) {
      (df, batchId) => df.count(); batches.synchronized { batches += batchId }; ()
    }.option("checkpointLocation", Streams.scratchDir("graft_scanonce_evo_ckpt_"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.size >= 3, s"expected a multi-batch drain, got $batches")
    assert(scans.value == corpusRows,
      s"corpus text scanned ${scans.value} row-reads across an evolving " +
        s"multi-batch drain for $corpusRows rows — probes and appends must " +
        "touch only the materialized index and the batch's own text")
  }

  test("lexicon-backed bm25 scans corpus text once per batch; inline form twice") {
    import spark.implicits._
    import graft.operators.Retrieval
    val corpusRows = 40
    val corpus0 = (0 until corpusRows).map(i =>
      (i.toLong, s"alpha beta gamma token$i delta ${i % 5}")).toDF("doc_id", "text")
    val scans = spark.sparkContext.longAccumulator("bm25_text_scans")
    val touch = udf { (t: String) => scans.add(1); t }.asNondeterministic()
    val corpus = corpus0.withColumn("text", touch(col("text")))
    val qs = Seq(1L -> "alpha delta", 2L -> "gamma beta")

    val dir = Streams.scratchDir("graft_lexonce_")
    val lex = Retrieval.materializeLexicon(corpus, "text", dir)
    val afterBuild = scans.value
    assert(afterBuild == corpusRows,
      s"lexicon build should be ONE corpus pass, measured $afterBuild row-reads")

    Retrieval.bm25TopKIndexed(corpus, "text", "doc_id", lex, qs, 3).collect()
    val indexedDelta = scans.value - afterBuild
    assert(indexedDelta == corpusRows,
      s"indexed form must scan text once per batch, measured $indexedDelta")

    val beforeInline = scans.value
    Retrieval.bm25TopK(corpus, "text", "doc_id", qs, 3).collect()
    val inlineDelta = scans.value - beforeInline
    assert(inlineDelta == 2L * corpusRows,
      s"inline form pays stats + score passes (2x), measured $inlineDelta — " +
        "if this drops to 1x the lexicon form's reason-to-exist changed; re-check")
  }
}
