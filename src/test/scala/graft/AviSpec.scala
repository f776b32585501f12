package graft

import graft.multimodal.{Avi, Media}

/** RIFF/AVI MJPEG codec: real mux → real chunk-tree demux round-trip,
 *  header fidelity, and the malformed-tolerance posture shared by the
 *  whole media surface. */
class AviSpec extends SparkTestBase {

  private def jpeg(docId: Long, w: Int, h: Int): Array[Byte] = {
    Media.codecWarm
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    Media.writeImage(Media.jpegWriter(), img)
  }

  test("mux → demux round-trips every frame byte-for-byte, in order") {
    val frames = Seq(jpeg(1, 16, 12), jpeg(2, 16, 12), jpeg(3, 16, 12))
    val avi = Avi.encode(frames, 16, 12)
    val out = Avi.demux(avi)
    assert(out.length === 3)
    out.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("container is a well-formed RIFF AVI that ImageIO-decodable JPEGs ride in") {
    val avi = Avi.encode(Seq(jpeg(7, 20, 10)), 20, 10)
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") === "AVI ")
    // declared RIFF size spans the file exactly
    val sz = (avi(4) & 0xFFL) | ((avi(5) & 0xFFL) << 8) |
      ((avi(6) & 0xFFL) << 16) | ((avi(7) & 0xFFL) << 24)
    assert(sz + 8 === avi.length.toLong)
    // the demuxed frame is a real JPEG with the right header dims
    val f = Avi.demux(avi).head
    assert(Media.imageDims(f) === Some((20, 10)))
  }

  test("odd-sized frames keep chunk alignment (pad byte) without corrupting successors") {
    // JPEG sizes are arbitrary; force oddness explicitly by trailing
    // a byte (decoders ignore bytes after EOI, so dims still read)
    val odd = {
      val j = jpeg(9, 8, 8)
      if (j.length % 2 == 1) j else j :+ 0xFF.toByte
    }
    val avi = Avi.encode(Seq(odd, jpeg(10, 8, 8), odd), 8, 8)
    val out = Avi.demux(avi)
    assert(out.length === 3)
    assert(java.util.Arrays.equals(out(0), odd))
    assert(java.util.Arrays.equals(out(2), odd))
  }

  test("malformed/foreign/truncated bytes demux to no frames, never throw") {
    assert(Avi.demux(Array.emptyByteArray).isEmpty)
    assert(Avi.demux("not an avi at all".getBytes).isEmpty)
    assert(Avi.demux(jpeg(1, 4, 4)).isEmpty) // a bare JPEG is not RIFF
    val avi = Avi.encode(Seq(jpeg(2, 8, 8)), 8, 8)
    assert(Avi.demux(avi.take(20)).isEmpty) // truncated inside hdrl
    // RIFF magic with a lying size: bounded walk, no crash
    val lying = avi.clone(); lying(4) = 0xFF.toByte; lying(5) = 0xFF.toByte
    Avi.demux(lying) // must not throw
  }

  test("a frame truncated mid-payload is dropped, not emitted partially") {
    val f1 = jpeg(21, 8, 8); val f2 = jpeg(22, 8, 8)
    val avi = Avi.encode(Seq(f1, f2), 8, 8)
    // cut inside the LAST frame's payload (truncate 10 bytes into it);
    // also restore a consistent RIFF size so only the frame is short
    val cut = avi.take(avi.length - f2.length + 10)
    val out = Avi.demux(cut)
    assert(out.length === 1)
    assert(java.util.Arrays.equals(out.head, f1))
  }

  test("demuxAviFrames samples every Nth frame with true header dims") {
    import spark.implicits._
    val docs = Seq((3L, 10L), (4L, 40L)).toDF("doc_id", "n_chars")
    val media = Media.aviFromDocuments(docs)
    val rows = Media.demuxAviFrames(media, 2)
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // doc 3: frames = 3%5+2 = 5 → sampled 0,2,4; w=10%32+8=18, h=3%24+8=11
    // doc 4: frames = 4%5+2 = 6 → sampled 0,2,4; w=40%32+8=16, h=4%24+8=12
    assert(rows.toSeq === Seq(
      (3L, 0, 18, 11), (3L, 2, 18, 11), (3L, 4, 18, 11),
      (4L, 0, 16, 12), (4L, 2, 16, 12), (4L, 4, 16, 12)))
  }
}
