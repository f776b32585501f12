package graft

import graft.multimodal.{Media, MediaRecord}
import graft.operators.Dedup

/** X144 perceptual audio dedup: the 63-bit 1-D difference hash over
 *  REAL decoded WAV PCM must equal the segment-arithmetic closed form
 *  at any (sample rate, clip length) — re-render invariance, the
 *  property that makes it a perceptual fingerprint — a one-segment
 *  splice must move ≤ 2 bits, the RIFF parse must agree with the JDK
 *  header decode, and the generic Hamming pigeonhole must find
 *  exactly the brute-force pair set. */
class AhashSpec extends SparkTestBase {

  import spark.implicits._

  /** Independent replay of the fixture fingerprint from (fam, edit)
   *  alone — the oracle's formula, in plain Scala. */
  private def refHash(fam: Long, edit: Boolean): Long = {
    var h = 0L
    for (g <- 0 until 63)
      if (Media.ahashSegVal(fam, g + 1, edit) >
          Media.ahashSegVal(fam, g, edit)) h |= 1L << g
    h
  }

  private def hashOf(fam: Long, rate: Int, n: Int, edit: Boolean): Long = {
    val rec = MediaRecord(fam, Media.encodeSegWav(fam, rate, n, edit),
      "audio/wav")
    val rows = Media.ahash63(Seq(rec).toDS()).collect()
    assert(rows.length === 1)
    rows(0).getLong(1)
  }

  test("decoded-PCM fingerprint equals the closed form at ANY rate/length >= the grid (re-render invariance)") {
    for (fam <- Seq(0L, 1L, 7L, 40L, 123456L);
         (rate, n) <- Seq((8000, 64), (8000, 192), (16000, 257),
           (44100, 1000), (22050, 331))) {
      assert(hashOf(fam, rate, n, edit = false) === refHash(fam, edit = false),
        s"fam=$fam rate=$rate n=$n")
    }
    // and the spliced variant
    assert(hashOf(3L, 12000, 300, edit = true) === refHash(3L, edit = true))
  }

  test("a one-segment splice moves at most 2 of the 63 bits, and at least 1 for some family") {
    val dists = (0L until 40L).map { fam =>
      java.lang.Long.bitCount(refHash(fam, edit = false) ^
        refHash(fam, edit = true))
    }
    assert(dists.forall(_ <= 2), s"splice must stay within hamming 2: $dists")
    assert(dists.exists(_ >= 1), "fixture must actually move bits somewhere")
  }

  test("the direct RIFF/PCM parse agrees with the JDK header decode on the fixture clips") {
    for (fam <- Seq(0L, 5L, 20L)) {
      val bytes = Media.encodeSegWav(fam, 8000 + (fam % 4).toInt * 4000,
        192 + (fam % 97).toInt, edit = false)
      val pcm = Media.wavPcm16(bytes)
      assert(pcm.isDefined, s"fam=$fam must parse as mono 16-bit PCM")
      val meta = Media.audioMeta(bytes)
      assert(meta.isDefined)
      val (rate, ch, frames) = meta.get
      assert(ch === 1)
      assert(rate === (8000 + (fam % 4).toInt * 4000).toFloat)
      assert(frames === pcm.get.length.toLong,
        "frame count must agree between the two decode paths")
      // and the samples really carry the segment levels
      val n = pcm.get.length
      assert((0 until n).forall(i =>
        pcm.get(i) === Media.ahashSegVal(fam, (i.toLong * 64 / n).toInt,
          edit = false).toShort))
    }
  }

  test("hammingPairs over fingerprints ≡ brute-force all-pairs (lossless pigeonhole at 63 bits)") {
    val media = Media.ahashWavsFromDocuments(
      (0L until 200L).map(i => (i, i)).toDF("doc_id", "n_chars"))
    val hashes = Media.ahash63(media)
    val got = Dedup.hammingPairs(hashes, "doc_id", "ah", 2, 63)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want)
    // the fixture really carries both twin classes
    assert(want.exists { case (a, b, d) => b == a + 1000000L && d == 0L },
      "re-rendered twins must collide at hamming 0")
    assert(want.exists { case (a, b, _) => b == a + 2000000L },
      "spliced twins must pair within the threshold")
  }
}
