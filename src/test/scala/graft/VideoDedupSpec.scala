package graft

import graft.multimodal.{Media, MediaRecord}
import graft.operators.Dedup

/** X145 perceptual video dedup: per-frame dHash over REAL GIF demux +
 *  pixel decode must equal the quantized-block closed form at any
 *  dims (the indexed-palette fixture is lossless by construction), a
 *  one-frame edit must leave every OTHER frame's hash untouched, and
 *  the frame-containment join must find exactly the rule's pair set. */
class VideoDedupSpec extends SparkTestBase {

  import spark.implicits._

  /** Independent replay of one frame's fixture hash from (fam, f,
   *  editFrame) alone — the oracle's formula, in plain Scala. */
  private def refFrameHash(fam: Long, f: Int, editFrame: Int): Long = {
    def v(bx: Int, by: Int): Int =
      Media.videoBlockVal(fam, f, bx, by, f == editFrame)
    var h = 0L
    for (gy <- 0 until 9; gx <- 0 until 7)
      if (v(gx + 1, gy) > v(gx, gy)) h |= 1L << (gy * 7 + gx)
    h
  }

  private def frameHashes(fam: Long, w: Int, h: Int, nFrames: Int,
      editFrame: Int): Map[Int, Long] = {
    val rec = MediaRecord(fam,
      Media.encodeBlockGif(fam, w, h, nFrames, editFrame), "image/gif")
    Media.frameDhash63(Seq(rec).toDS()).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
  }

  test("decoded per-frame dHash equals the closed form at ANY dims (GIF palette losslessness + demux)") {
    for (fam <- Seq(0L, 1L, 7L, 40L);
         (w, h) <- Seq((8, 9), (16, 18), (33, 22))) {
      val got = frameHashes(fam, w, h, nFrames = 4, editFrame = -1)
      assert(got.size === 4, s"fam=$fam dims=${w}x$h must demux 4 frames")
      for (f <- 0 until 4)
        assert(got(f) === refFrameHash(fam, f, -1),
          s"fam=$fam dims=${w}x$h frame=$f")
    }
  }

  test("a one-frame edit touches only that frame's hash, by at most 2 bits") {
    val clean = frameHashes(5L, 21, 19, nFrames = 5, editFrame = -1)
    val edited = frameHashes(5L, 21, 19, nFrames = 5, editFrame = 1)
    for (f <- Seq(0, 2, 3, 4))
      assert(edited(f) === clean(f), s"untouched frame $f must not move")
    assert(java.lang.Long.bitCount(edited(1) ^ clean(1)) <= 2)
    // a one-block edit flips 0-2 of the two adjacent comparisons; it
    // must actually move bits for SOME family (the fixture's edited
    // twins would otherwise be exact dups)
    assert((0L until 20L).exists { fam =>
      refFrameHash(fam, 1, 1) != refFrameHash(fam, 1, -1)
    }, "the edit must move bits somewhere")
  }

  test("frameMatchPairs ≡ the brute-force containment rule, and the fixture carries both twin classes") {
    val media = Media.videoGifsFromDocuments(
      (0L until 200L).map(i => (i, i)).toDF("doc_id", "n_chars"))
    val frames = Media.frameDhash63(media)
    val got = Dedup.frameMatchPairs(frames, "doc_id", "dh", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byId = frames.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (id, fs) => id -> fs.map(_._2).toSet }
    val ids = byId.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      common = (byId(a) & byId(b)).size
      if common * 3 >= math.min(byId(a).size, byId(b).size) * 2
    } yield (a, b, common.toLong)).toSet
    assert(got === want)
    assert(want.exists { case (a, b, _) => b == a + 1000000L },
      "re-encoded twins must pair (every frame matches)")
    assert(want.exists { case (a, b, _) => b == a + 2000000L },
      "one-frame-edited twins must pair (all but one match)")
  }
}
