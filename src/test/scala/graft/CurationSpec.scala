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
}
