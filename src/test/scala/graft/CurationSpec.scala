package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation operators: the distributed prefix sum must equal the
 *  single-reducer window cumsum it replaces, chunking must cover
 *  every token, repetition fractions must be sane and threshold-able. */
class CurationSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("withRunningTotal ≡ window cumsum, invariant to partitioning") {
    import spark.implicits._
    val rows = (0L until 5000L).map(i => (i, (i * 7) % 13)).toDF("id", "v")
    val want = rows.withColumn("cum",
        coalesce(sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    for (parts <- Seq(1, 7, 32)) {
      val got = Curation.withRunningTotal(rows.repartition(11), "id", "v",
          "cum", partitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
      assert(got.toSeq == want.toSeq, s"partitions=$parts")
    }
  }

  test("withRunningTotal and packSequences survive empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Curation.withRunningTotal(empty, "id", "v", "cum").collect().isEmpty)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.packSequences(emptyDocs, "text", "doc_id", 10L)
      .collect().isEmpty)
  }

  test("packSequences: sequences are contiguous in id order and budget-bounded") {
    val packed = Curation.packSequences(docs, "text", "doc_id", 256L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.length == docs.count())
    // seq ids are non-decreasing in doc order and start at 0
    assert(packed.head._3 == 0L)
    packed.sliding(2).foreach { case Array((_, _, a), (_, _, b)) =>
      assert(b == a || b > a)
    }
    // each sequence's EXCLUSIVE-prefix contract: a doc starts a new
    // sequence exactly when the running total crosses a budget line
    var cum = 0L
    packed.foreach { case (_, n, seq) =>
      assert(seq == cum / 256L)
      cum += n
    }
  }

  test("chunkByTokens covers every token; overlap equals width - stride") {
    import spark.implicits._
    val d = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"), (3L, ""), (4L, "solo")).toDF("doc_id", "text")
    val chunks = Curation.chunkByTokens(d, "text", "doc_id", 16, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = chunks.groupBy(_._1)
    // 40 tokens, width 16, stride 8 -> 1 + ceil(24/8) = 4 chunks
    assert(byDoc(1L).length == 4)
    // every token appears in some chunk, in order
    val covered = byDoc(1L).sortBy(_._2).flatMap(_._3.split(" ")).distinct
    assert(covered.toSeq == (1 to 40).map(i => s"t$i"))
    // consecutive chunks overlap by width - stride tokens
    val ordered = byDoc(1L).sortBy(_._2)
    val c0 = ordered.apply(0)._3.split(" ")
    val c1 = ordered.apply(1)._3.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    // short and empty docs yield exactly one chunk
    assert(byDoc(2L).map(_._3).toSeq == Seq("a b c"))
    assert(byDoc(3L).map(_._3).toSeq == Seq(""))
    assert(byDoc(4L).map(_._3).toSeq == Seq("solo"))
  }

  test("repetitionStats: fractions in [0,1]; synthetic extremes behave") {
    import spark.implicits._
    val d = Seq(
      (1L, "x x x x x x"),              // max token repetition
      (2L, "a b c d e f"),              // no repetition
      (3L, "ab ab ab"),                 // repeated bigrams ("ab ab" x2)
      (4L, "one")).toDF("doc_id", "text")
    val m = Curation.repetitionStats(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L)._1 > 0.8 && m(1L)._2 == 1.0 - 1.0 / 5.0)
    assert(m(2L) == ((0.0, 0.0)))
    assert(m(3L)._2 == 1.0 - 1.0 / 2.0)
    assert(m(4L) == ((0.0, 0.0))) // single token: no bigrams, guard -> 0
    // real corpus: all fractions within [0,1]
    val real = Curation.repetitionStats(docs, "text", "doc_id").collect()
    assert(real.forall { r =>
      val (a, b) = (r.getDouble(1), r.getDouble(2))
      a >= 0.0 && a <= 1.0 && b >= 0.0 && b <= 1.0
    })
    // and the corpus genuinely exercises the signal (word-bag docs)
    assert(real.exists(_.getDouble(1) > 0.3))
  }

  // -------------------------------- DSIR importance resampling (X116)

  /** Independent map-based DSIR reference: same tokenizer contract,
   *  same md5-h60 bucketing, same digit-count weights, same
   *  truncating integer mean, (score DESC, id ASC) selection. */
  private def dsirRef(corpus: Seq[(Long, String, Boolean)], buckets: Int,
      topN: Int): Seq[(Long, Long, Long)] = {
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    def feats(t: String): Seq[Long] = {
      val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      w.zip(w.drop(1)).map { case (a, b) => h60(s"$a $b") % buckets }
    }
    val all = corpus.flatMap { case (_, t, isT) => feats(t).map(_ -> isT) }
    val dw = all.groupBy(_._1).map { case (b, xs) =>
      b -> ((xs.count(_._2) + 1).toString.length.toLong -
        (xs.size + 1).toString.length.toLong)
    }
    corpus.collect { case (id, t, false) if feats(t).nonEmpty =>
      val f = feats(t)
      (id, f.map(dw).sum * 1000000L / f.size)
    }.sortBy { case (id, s) => (-s, id) }.take(topN)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
  }

  test("dsirSelect ≡ independent reference, including ties and short-doc exclusion") {
    import spark.implicits._
    // the digit-count proxy only discriminates once counts cross a
    // power of ten, so the fixture repeats each phrase 12×: target
    // bigrams land at c_tgt=12 (dw = digits(13)−digits(c_all+1) = 0
    // for target-like candidates), the alien phrase at c_tgt=0,
    // c_all=24 (dw = 1−2 = −1) — target-like mean 0 beats alien −10⁶
    val corpus =
      (1L to 12L).map(i => (i, "the quick brown fox jumps", true)) ++
      Seq((20L, "the quick brown fox naps", false),
        (21L, "the quick brown fox naps", false)) ++ // exact twin: tie, id order
      (30L to 41L).map(i => (i, "zzz yyy xxx zzz yyy", false)) ++
      Seq((50L, "single", false), (51L, "", false)) // < 2 tokens: unselectable
    val df = corpus.toDF("doc_id", "text", "is_t")
    val got = Curation.dsirSelect(df, "doc_id", "text", col("is_t"), 4096, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = dsirRef(corpus, 4096, 20)
    assert(got === want)
    // the reference itself behaves: target-like twins tie first in id
    // order, every alien scores a full digit below, shorts absent
    val byId = want.map(w => w._2 -> w._1).toMap
    val score = want.map(w => w._2 -> w._3).toMap
    assert(byId(20L) === 1L && byId(21L) === 2L)
    assert(score(20L) === 0L && score(30L) === -1000000L)
    assert((30L to 41L).forall(i => byId(i) > byId(21L)))
    assert(!byId.contains(50L) && !byId.contains(51L))
  }

  test("dsirSelect: topN bounds the output and empty candidate pools are empty") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d", true), (2L, "a b c e", false),
      (3L, "a b c f", false), (4L, "x y z w", false))
    val df = corpus.toDF("doc_id", "text", "is_t")
    assert(Curation.dsirSelect(df, "doc_id", "text", col("is_t"), 32, 2)
      .count() === 2L)
    assert(Curation.dsirSelect(df.filter(col("is_t")), "doc_id", "text",
      col("is_t"), 32, 2).count() === 0L)
  }

  // ------------------------------- CCNet perplexity buckets (X134)

  test("ccnetBuckets ≡ plain-Scala replay of sample-calibrated thirds over judged LM scores") {
    import spark.implicits._
    // fluency gradient: docs repeat frequent bigrams more or less
    val corpus = (0L until 60L).map { i =>
      val fluent = "the cat sat on the mat " * (1 + (i % 5).toInt)
      val noise = s"zq$i xw${i * 7} " * (1 + ((i / 5) % 4).toInt)
      (i, fluent + noise)
    }
    val df = corpus.toDF("doc_id", "text")
    val got = Curation.ccnetBuckets(df, "doc_id", "text", 2, 0.5, "s|")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    // reference: the judged LM scores, replayed bucketing
    val scores = graft.operators.Lm
      .bigramBackoffScore(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def h60(s: String): Long =
      graft.functions.HashOps.h60(s.getBytes("UTF-8"))
    val sample = scores.keys.toSeq
      .filter(id => h60("s|" + id) % 10000L < 5000L)
      .map(id => (scores(id), id)).sorted
    assert(sample.size >= 3)
    val c1 = sample((sample.size / 3) - 1)
    val c2 = sample((2 * sample.size / 3) - 1)
    def bucket(id: Long): Long = {
      val t = (scores(id), id)
      if (t._1 < c1._1 || (t._1 == c1._1 && t._2 <= c1._2)) 0L
      else if (t._1 < c2._1 || (t._1 == c2._1 && t._2 <= c2._2)) 1L
      else 2L
    }
    val want = scores.keys.toSeq.groupBy(bucket).toSeq.sortBy(_._1)
      .map { case (b, ids) =>
        val ss = ids.map(scores)
        (b, Seq("tail", "middle", "head")(b.toInt), ids.size.toLong,
          ss.sum, ss.min, ss.max)
      }
    assert(got === want)
    // thirds cover the corpus, and score ranges are ordered:
    // every tail score ≤ every head score boundary-wise
    assert(got.map(_._3).sum === 60L)
    assert(got.size === 3)
    assert(got(0)._6 <= got(1)._6 && got(1)._5 <= got(2)._5)
  }

  test("ccnetBuckets trains the LM model ONCE per run (round-13, closes the q160 doubled-train finding)") {
    import spark.implicits._
    // Instrument the corpus source with an accumulator-bumping filter
    // (test-only UDF): every execution of the scoring subtree scans
    // the source, so the accumulated row count measures how many
    // times the model-train plan actually ran. The round-12 form held
    // `scored` as a def — the calibration sample and the bucket pass
    // each re-executed the FULL q130 plan, model-train aggregations
    // included. The fixed form persists the 2-column (id, score)
    // frame once, so a whole ccnetBuckets run must scan the source
    // exactly as often as ONE bigramBackoffScore execution does
    // (that plan legitimately references the corpus k times within
    // one pass — the baseline measures k, the assertion pins 1×k,
    // not 2×k).
    val corpus = (0L until 40L)
      .map(i => (i, s"the cat sat on the mat zq$i"))
    def instrumented(name: String) = {
      val acc = spark.sparkContext.longAccumulator(name)
      val bump = udf { (_: Long) => acc.add(1L); true }
      (corpus.toDF("doc_id", "text").filter(bump(col("doc_id"))), acc)
    }
    val (base, accBase) = instrumented("q160_base")
    graft.operators.Lm.bigramBackoffScore(base, "doc_id", "text", 2)
      .collect()
    val perTrain = accBase.value
    assert(perTrain >= 40L, s"baseline scan count $perTrain is implausible")
    val (df, acc) = instrumented("q160_ccnet")
    Curation.ccnetBuckets(df, "doc_id", "text", 2, 0.5, "s|").collect()
    assert(acc.value === perTrain,
      s"ccnetBuckets scanned the corpus ${acc.value} source-rows, " +
        s"expected ONE model-train's worth ($perTrain) — the scored " +
        "frame is being recomputed instead of read from cache")
  }
}
