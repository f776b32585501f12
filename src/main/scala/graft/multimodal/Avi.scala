package graft.multimodal

/**
 * Minimal RIFF/AVI (MJPEG) muxer + demuxer in pure JVM bytes — the
 * video-container twin of [[graft.sources.Msgpack]]'s wire codec. The
 * JDK ships no video codec, but MJPEG-in-AVI needs none: frames are
 * ordinary JPEGs (ImageIO encodes/decodes those natively) and the
 * container is plain RIFF chunk framing, publicly documented in
 * Microsoft's "AVI RIFF File Reference". This gives the multimodal
 * surface a TRUE non-GIF video container path: mux on executors,
 * demux by parsing the chunk tree, decode only the sampled frames.
 *
 * Layout written (all sizes little-endian, chunks word-aligned):
 *   RIFF('AVI '
 *     LIST('hdrl' avih(56) LIST('strl' strh(56 'vids'/'MJPG')
 *                                strf(40 BITMAPINFOHEADER 'MJPG')))
 *     LIST('movi' '00dc'(jpeg)…)
 *     idx1)
 *
 * The demuxer is a real chunk-tree walker (RIFF magic, bounded chunk
 * scan, LIST recursion into 'movi'/'rec ', '00dc'/'00db' payload
 * collection) — not an offset formula — and tolerates truncated or
 * foreign bytes by returning no frames, matching the decode-tolerance
 * posture of the rest of the media surface.
 */
object Avi {

  // ------------------------------------------------------------ writer

  private final class W {
    private val bos = new java.io.ByteArrayOutputStream()
    def bytes(b: Array[Byte]): this.type = { bos.write(b); this }
    def fcc(s: String): this.type = {
      require(s.length == 4, s"fourcc '$s'"); bytes(s.getBytes("US-ASCII"))
    }
    def u32(v: Long): this.type = bytes(Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte))
    def u16(v: Int): this.type =
      bytes(Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
    def out: Array[Byte] = bos.toByteArray
  }

  /** One chunk: fourcc + LE size + payload + odd-size pad byte. */
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val w = new W().fcc(id).u32(payload.length.toLong).bytes(payload)
    if ((payload.length & 1) == 1) w.bytes(Array[Byte](0))
    w.out
  }

  private def list(tpe: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", new W().fcc(tpe).bytes(payload).out)

  /** Mux pre-encoded JPEG frames into a well-formed single-stream
   *  MJPEG AVI (with idx1 index — players and strict parsers expect
   *  it even though [[demux]] walks the chunk tree instead). */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val frameChunks = frames.map(chunk("00dc", _))
    val movi = list("movi", frameChunks.toArray.flatten)
    // idx1 offsets are relative to the 'movi' fourcc (first chunk = 4)
    val idxW = new W
    var off = 4L
    frames.zip(frameChunks).foreach { case (f, ck) =>
      idxW.fcc("00dc").u32(0x10L /*AVIIF_KEYFRAME*/).u32(off).u32(f.length.toLong)
      off += ck.length
    }
    val idx1 = chunk("idx1", idxW.out)
    val maxFrame = frames.map(_.length).max.toLong
    val strh = new W()
      .fcc("vids").fcc("MJPG")
      .u32(0)            // dwFlags
      .u16(0).u16(0)     // wPriority, wLanguage
      .u32(0)            // dwInitialFrames
      .u32(1)            // dwScale
      .u32(fps.toLong)   // dwRate (rate/scale = fps)
      .u32(0)            // dwStart
      .u32(frames.length.toLong) // dwLength
      .u32(maxFrame)     // dwSuggestedBufferSize
      .u32(0xFFFFFFFFL)  // dwQuality (default)
      .u32(0)            // dwSampleSize (varies per frame)
      .u16(0).u16(0).u16(width).u16(height) // rcFrame
      .out
    val strf = new W()
      .u32(40)           // biSize
      .u32(width.toLong).u32(height.toLong)
      .u16(1).u16(24)    // biPlanes, biBitCount
      .fcc("MJPG")       // biCompression
      .u32(width.toLong * height * 3) // biSizeImage
      .u32(0).u32(0).u32(0).u32(0)    // pels/clr fields
      .out
    val strl = list("strl",
      chunk("strh", strh) ++ chunk("strf", strf))
    val avih = new W()
      .u32(1000000L / fps) // dwMicroSecPerFrame
      .u32(0)              // dwMaxBytesPerSec
      .u32(0)              // dwPaddingGranularity
      .u32(0x10L)          // dwFlags: AVIF_HASINDEX
      .u32(frames.length.toLong)
      .u32(0)              // dwInitialFrames
      .u32(1)              // dwStreams
      .u32(maxFrame)       // dwSuggestedBufferSize
      .u32(width.toLong).u32(height.toLong)
      .u32(0).u32(0).u32(0).u32(0) // dwReserved
      .out
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    chunk("RIFF", new W().fcc("AVI ").out ++ hdrl ++ movi ++ idx1)
  }

  // ----------------------------------------------------------- demuxer

  /** Video frame payloads ('00dc'/'00db' chunks inside 'movi', in
   *  stream order). Truncated, malformed, or non-AVI bytes → empty. */
  def demux(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    def fccAt(p: Long): String =
      new String(bytes, p.toInt, 4, "US-ASCII")
    def u32At(p: Long): Long =
      ((bytes(p.toInt) & 0xFFL)) | ((bytes(p.toInt + 1) & 0xFFL) << 8) |
        ((bytes(p.toInt + 2) & 0xFFL) << 16) | ((bytes(p.toInt + 3) & 0xFFL) << 24)
    def isFrame(id: String): Boolean =
      (id.endsWith("dc") || id.endsWith("db")) &&
        id.take(2).forall(_.isDigit)
    // depth-capped: real AVIs nest ≤3 (RIFF→movi→rec ); a hostile
    // payload can encode ~80k LIST levels in 1 MB, and an unbounded
    // recursion would die with StackOverflowError — an Error, which
    // the tolerance catch below deliberately does not swallow
    def walk(start: Long, end: Long, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 16) return
      var p = start
      while (p + 8 <= end) {
        val id = fccAt(p)
        val sz = u32At(p + 4)
        val dataStart = p + 8
        if (id == "LIST" && sz >= 4 && dataStart + 4 <= end) {
          val tpe = fccAt(dataStart)
          walk(dataStart + 4, math.min(dataStart + sz, end),
            inMovi || tpe == "movi" || tpe == "rec ", depth + 1)
        } else if (inMovi && isFrame(id) && dataStart + sz <= end) {
          // a frame whose declared size overruns the buffer is
          // TRUNCATED — drop it rather than emit partial bytes
          out += java.util.Arrays.copyOfRange(
            bytes, dataStart.toInt, (dataStart + sz).toInt)
        }
        p = dataStart + sz + (sz & 1)
      }
    }
    try {
      if (bytes.length < 12 || fccAt(0) != "RIFF" || fccAt(8) != "AVI ")
        return Seq.empty
      val riffEnd = math.min(bytes.length.toLong, 8L + u32At(4))
      walk(12, riffEnd, inMovi = false, depth = 0)
      out.result()
    } catch { case _: Exception => Seq.empty }
  }
}
