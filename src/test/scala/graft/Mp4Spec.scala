package graft

import graft.multimodal.Mp4

/** ISO BMFF parse-only demux (round-7 item 7): container metadata off
 *  the box tree, torn-file tolerance pinned byte-by-byte. */
class Mp4Spec extends SparkTestBase {

  private def file(codec: String = "avc1", w: Int = 320, h: Int = 240,
      ts: Long = 90000L, delta: Long = 3003L,
      sizes: Seq[Int] = Seq(10, 20, 30)) =
    Mp4.encode(codec, w, h, ts, delta, sizes, seed = 7L)

  test("mux → demux round-trips every container field") {
    val got = Mp4.demux(file())
    assert(got == Seq(Mp4.Mp4Track("avc1", 3L, 90000L, 3L * 3003L,
      320, 240, 60L)))
    val got2 = Mp4.demux(file(codec = "mp4v", w = 48, h = 32,
      ts = 600L, delta = 25L, sizes = Seq(5)))
    assert(got2 == Seq(Mp4.Mp4Track("mp4v", 1L, 600L, 25L, 48, 32, 5L)))
  }

  test("torn files never throw: every byte-prefix parses to a safe result") {
    val full = file()
    (0 to full.length).foreach { n =>
      val tracks = Mp4.demux(java.util.Arrays.copyOfRange(full, 0, n))
      // whatever parsed must be internally consistent — a cut stsz
      // table may NOT report a sample count it has no sizes for
      tracks.foreach { t =>
        assert(t.nSamples > 0 && t.sampleBytes > 0,
          s"prefix $n emitted a torn track $t")
      }
    }
    // the complete file parses; one byte short of complete, the mdat
    // box is torn but the moov metadata already stands
    assert(Mp4.demux(full).nonEmpty)
  }

  test("foreign and hostile bytes yield no tracks") {
    assert(Mp4.demux(Array.empty[Byte]).isEmpty)
    assert(Mp4.demux("not an mp4 at all, just text".getBytes).isEmpty)
    assert(Mp4.demux(Array.fill(4096)(0x41.toByte)).isEmpty)
    // a deep hostile container nest must hit the depth cap, not the
    // stack: 'moov' boxes nested 10k levels
    val hostile = new java.io.ByteArrayOutputStream()
    val levels = 10000
    (0 until levels).foreach { i =>
      val remaining = (levels - i) * 8L
      hostile.write(Array(
        ((remaining >> 24) & 0xFF).toByte, ((remaining >> 16) & 0xFF).toByte,
        ((remaining >> 8) & 0xFF).toByte, (remaining & 0xFF).toByte))
      hostile.write("moov".getBytes("US-ASCII"))
    }
    assert(Mp4.demux(hostile.toByteArray).isEmpty)
  }

  test("size-0 (to-EOF) and unknown boxes are tolerated") {
    val full = file()
    // append an unknown to-EOF box: parse result unchanged
    val freeBox = Array[Byte](0, 0, 0, 0) ++ "free".getBytes("US-ASCII") ++
      Array.fill(64)(0x00.toByte)
    assert(Mp4.demux(full ++ freeBox) == Mp4.demux(full))
  }
}
