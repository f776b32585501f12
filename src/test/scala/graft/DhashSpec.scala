package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Media, MediaRecord}
import graft.operators.Dedup

/** X140 perceptual image dedup: the 63-bit dHash over REAL decoded
 *  PNG pixels must equal the block-arithmetic closed form at any
 *  dims (resize invariance — the property that makes it a perceptual
 *  hash), a one-block edit must move ≤ 2 bits, and the generic
 *  Hamming pigeonhole must find exactly the brute-force pair set. */
class DhashSpec extends SparkTestBase {

  import spark.implicits._

  /** Independent replay of the fixture hash from (fam, edit) alone —
   *  the oracle's formula, in plain Scala. */
  private def refHash(fam: Long, edit: Boolean): Long = {
    def v(bx: Int, by: Int): Int = Media.dhashBlockVal(fam, bx, by, edit)
    var h = 0L
    for (gy <- 0 until 9; gx <- 0 until 7)
      if (v(gx + 1, gy) > v(gx, gy)) h |= 1L << (gy * 7 + gx)
    h
  }

  private def hashOf(fam: Long, w: Int, h: Int, edit: Boolean): Long = {
    val writer = Media.pngWriter()
    val rec = MediaRecord(fam, Media.encodeBlockPng(writer, fam, w, h, edit),
      "image/png")
    val rows = Media.dhash63(Seq(rec).toDS()).collect()
    assert(rows.length === 1)
    rows(0).getLong(1)
  }

  test("decoded-pixel dHash equals the closed form at ANY dims >= the grid (resize invariance)") {
    for (fam <- Seq(0L, 1L, 7L, 40L, 123456L);
         (w, h) <- Seq((8, 9), (16, 18), (17, 23), (33, 22), (64, 48))) {
      assert(hashOf(fam, w, h, edit = false) === refHash(fam, edit = false),
        s"fam=$fam dims=${w}x$h")
    }
    // and the edited variant
    assert(hashOf(3L, 21, 19, edit = true) === refHash(3L, edit = true))
  }

  test("a one-block edit moves at most 2 of the 63 bits, and moves at least 1 for some family") {
    val dists = (0L until 40L).map { fam =>
      java.lang.Long.bitCount(refHash(fam, edit = false) ^
        refHash(fam, edit = true))
    }
    assert(dists.forall(_ <= 2), s"edit must stay within hamming 2: $dists")
    assert(dists.exists(_ >= 1), "fixture must actually move bits somewhere")
  }

  test("hammingPairs over dHashes ≡ brute-force all-pairs (lossless pigeonhole at 63 bits)") {
    val media = Media.dhashPngsFromDocuments(
      (0L until 200L).map(i => (i, i)).toDF("doc_id", "n_chars"))
    val hashes = Media.dhash63(media)
    val got = Dedup.hammingPairs(hashes, "doc_id", "dh", 2, 63)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want)
    // the fixture really carries both twin classes
    assert(want.exists { case (a, b, d) => b == a + 1000000L && d == 0L },
      "resized re-encode twins must collide at hamming 0")
    assert(want.exists { case (a, b, _) => b == a + 2000000L },
      "edited twins must pair within the threshold")
  }
}
