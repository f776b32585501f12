package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque payload bytes + typed metadata.
 *  Image/audio/video payloads all ride the same shape — `binary` is
 *  format-agnostic, `mime` discriminates. */
final case class MediaRecord(doc_id: Long, bytes: Array[Byte], mime: String)

/** Decoded/extracted features. In a real deployment width/height/
 *  n_frames come from the codec; here they come from [[Media.decode]]
 *  (a deterministic stub — see its scaladoc). */
final case class MediaFeatures(
    doc_id: Long, mime: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int)

/** One sampled frame of a (video-shaped) payload. */
final case class FrameRecord(doc_id: Long, frame_idx: Int, bytes: Array[Byte])

/**
 * Multimodal-column plumbing for the LLM-data-pipeline surface:
 * binary payload columns with typed metadata, batch-shaped decode /
 * feature-extraction over `mapPartitions`.
 *
 * The Spark-side shape is the real thing a 100 TB media pipeline
 * needs and is fully tested: typed `Dataset[MediaRecord]` with
 * kryo-free product encoders, per-PARTITION batched iteration (the
 * JVM analog of `mapInPandas` batches — decoder state is initialized
 * once per partition, amortized over every record in it), and an
 * explicit repartition knob so decode cost balances across executors
 * independently of upstream file splits.
 *
 * Image payloads (image mimes) decode, demux, AND resize FOR REAL:
 * `javax.imageio` + `java.awt` ship with the JDK — [[Media.imageDims]]
 * reads true width/height off the container header (no pixel decode),
 * [[Media.decodeFrames]] demuxes multi-frame containers, and
 * [[Media.resize]] does decode → bilinear scale → re-encode. Audio
 * headers decode for real through `javax.sound.sampled`. The one
 * remaining STUB surface is byte→samples for mimes with no JDK codec
 * (mp4/h264): [[Media.decode]] derives deterministic pseudo-features
 * from the byte length there. Swapping in a real codec changes one
 * function body and nothing else — signature, schema, batching, and
 * partitioning stay as tested here.
 */
object Media {

  /** Wrap text-derived payloads as a media table: UTF-8 bytes +
   *  mime derived from the source tag. (Stand-in for reading real
   *  blobs; binary column semantics are identical.) */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("bytes"),
      concat(lit("application/x-"), col("source")).as("mime")
    ).as[MediaRecord]
  }

  /** One-time JVM codec warm-up: the FIRST use of javax.imageio /
   *  java.awt loads the image plugin registry and the color-management
   *  stack — seconds of class-init that 32 simultaneous first-use
   *  tasks serialize on badly (measured: 2 s amortized vs 7–15 s when
   *  a whole stage races through it). A lazy val makes exactly one
   *  thread pay it; the rest block briefly on the monitor. Referenced
   *  at partition start by every codec-touching operator. */
  lazy val codecWarm: Unit = {
    val probe = encodePng(pngWriter(), 0L, 1, 1)
    imageDims(probe)
    ()
  }

  /** Decode dispatch: image payloads read their REAL dimensions from
   *  the container header ([[imageDims]]); anything else (audio/video
   *  stand-ins — no codec in the JDK) falls back to the deterministic
   *  stub whose formulas are mirrored in [[decodeSql]] for the
   *  oracle. An image payload imageio cannot read also falls back
   *  (malformed-tolerance, like every other graft source). */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.mime.startsWith("image/"))
      imageDims(r.bytes) match {
        case Some((w, h)) =>
          MediaFeatures(r.doc_id, r.mime, r.bytes.length.toLong, w, h, 1)
        case None => stubDecode(r)
      }
    else stubDecode(r)

  /** True image header decode via `javax.imageio` (in the JDK — no
   *  external codec): width/height come off the format header through
   *  `ImageReader.getWidth/getHeight(0)`, which does NOT decode pixel
   *  data — O(header) per record no matter the image size. Returns
   *  None when no installed reader claims the bytes (wrong mime,
   *  truncated file, unsupported format). */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
    withImageReader(bytes)(r => (r.getWidth(0), r.getHeight(0)))

  /** Shared reader acquisition for the single-image paths
   *  ([[imageDims]], [[readImage]]): memory-cached stream → first
   *  claiming `ImageReader` → `f`, disposing/closing on every path.
   *  MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
   *  the factory default is a FileCache* stream — a temp file created
   *  and deleted PER RECORD, which dwarfs the actual work on small
   *  payloads (measured ~6s for 5k records before this). Returns None
   *  when no installed reader claims the bytes or `f` throws
   *  (truncated/undecodable payload). */
  private def withImageReader[T](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => T): Option[T] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Option(f(reader))
        } catch { case _: Exception => None }
        finally reader.dispose()
      }
    } finally iis.close()
  }

  /** The installed `AudioFileReader` SPI providers, resolved ONCE per
   *  JVM: `AudioSystem.getAudioFileFormat` re-enters a SYNCHRONIZED
   *  JDK provider lookup on every call, which serializes concurrent
   *  decode tasks (measured on the 10× sweep: 13× more per-record
   *  cost under 8 executor threads than in a single driver loop).
   *  Probing the cached readers directly is the same dispatch the
   *  facade performs, minus the per-call global lock. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Direct RIFF/WAVE header parse — the WAV twin of [[Avi.demux]]'s
   *  chunk walk: 'fmt ' yields rate/channels/blockAlign, 'data' yields
   *  frame count (bytes / blockAlign), identical values to
   *  `AudioSystem` on the same container. Exists because the JDK SPI
   *  path does NOT thread-scale: concurrent decode tasks inflate its
   *  per-call CPU ~7-13× (measured on the 10× sweep — provider
   *  iteration allocates streams + exceptions per non-claiming
   *  reader, and the facade adds a synchronized registry lookup), so
   *  a 50k-record stage burned 42 cpu-s where this parse needs <0.1.
   *  Zero allocation, no locks, no exceptions on the happy path. */
  private def wavMeta(bytes: Array[Byte]): Option[(Float, Int, Long)] = {
    if (bytes.length < 12) return None
    def fcc(p: Int) = new String(bytes, p, 4, "US-ASCII")
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    def u16(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
    if (fcc(0) != "RIFF" || fcc(8) != "WAVE") return None
    val end = math.min(bytes.length.toLong, 8L + u32(4))
    var p = 12L
    var rate = 0f; var ch = 0; var blockAlign = 0; var dataLen = -1L
    while (p + 8 <= end && (blockAlign == 0 || dataLen < 0)) {
      val id = fcc(p.toInt); val sz = u32(p.toInt + 4)
      if (id == "fmt " && sz >= 16 && p + 24 <= bytes.length) {
        ch = u16(p.toInt + 10)
        rate = u32(p.toInt + 12).toFloat
        blockAlign = u16(p.toInt + 20)
      } else if (id == "data")
        dataLen = math.min(sz, bytes.length - (p + 8))
      p += 8 + sz + (sz & 1)
    }
    if (blockAlign > 0 && ch > 0 && dataLen >= 0)
      Some((rate, ch, dataLen / blockAlign))
    else None
  }

  /** True audio header decode: WAV via the direct RIFF parse above;
   *  other JDK-supported containers (AIFF/AU) via the cached
   *  `javax.sound.sampled` SPI readers. Sample rate, channel count,
   *  and frame length come off the header without touching sample
   *  data. Returns None when nothing claims the bytes. */
  def audioMeta(bytes: Array[Byte]): Option[(Float, Int, Long)] = {
    val fast = wavMeta(bytes)
    if (fast.isDefined) return fast
    val readers = audioReaders.iterator
    while (readers.hasNext) {
      try {
        val f = readers.next().getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        return Some((f.getFormat.getSampleRate, f.getFormat.getChannels,
          f.getFrameLength.toLong))
      } catch { case _: Exception => () } // this reader doesn't claim it
    }
    None
  }

  /** Deterministic tiny PCM WAV: real, decodable audio bytes written
   *  with the JDK's own encoder (16-bit mono PCM; sample pattern keyed
   *  by `docId`). Executor-side generation for the audio-decode query,
   *  exactly like [[encodePng]] for images. */
  def encodeWav(docId: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = ((docId * 31L + i * 7L) % 65536L - 32768L).toShort
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Documents → real WAV payloads with parameters derived from the
   *  row (sampleRate = 8000 + (doc_id%4)·4000, frames = n_chars + 1):
   *  the oracle states the expected metadata without the bytes. */
  def audioFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        codecWarm
        it.map { case (id, nChars) =>
          MediaRecord(id,
            encodeWav(id, 8000 + (id % 4).toInt * 4000, (nChars + 1).toInt),
            "audio/wav")
        }
      }
  }

  /** (doc_id, sample_rate, channels, n_frames) for audio payloads —
   *  real header decode, stub-free. Non-audio/unreadable payloads are
   *  absent from the output (a media pipeline routes by mime first). */
  def extractAudioMeta(media: Dataset[MediaRecord],
      parallelism: Int = 0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // codec-bound stage: input partitioning follows parquet byte
    // splits, but cost follows RECORD count — a binary-heavy corpus
    // can arrive as a handful of splits and starve the cluster
    // (measured: the 10× scale sweep put 50k decodes on 2 of 32
    // cores). Same rebalance knob as [[extractFeatures]].
    val balanced =
      if (parallelism > 0) media.repartition(parallelism) else media
    balanced.mapPartitions { records =>
      records.flatMap { r =>
        audioMeta(r.bytes).map { case (sr, ch, fr) =>
          (r.doc_id, sr.toDouble, ch, fr)
        }
      }
    }.toDF("doc_id", "sample_rate", "channels", "n_frames")
  }

  /** Deterministic animated GIF: a REAL multi-frame container written
   *  with the JDK's own sequence encoder — the closest thing to video
   *  the JDK can produce natively. Each frame carries one marker pixel
   *  keyed by (docId, frame); few distinct colors keep the GIF
   *  palette lossless. */
  def encodeGif(docId: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, (((docId * 131) + f * 17) & 0xFFFF).toInt)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Frame sampling with REAL container demux: every `everyN`-th frame
   *  of a multi-frame image container (animated GIF — the JDK's native
   *  video stand-in), decoded through `ImageReader` — frame count and
   *  per-frame dimensions come off the container, not a byte formula.
   *  This is the "demux the container, decode only the sampled frames"
   *  dataflow [[sampleFrames]]'s stub documents; payloads no reader
   *  claims yield no rows. Output (doc_id, frame_idx, width, height). */
  def decodeFrames(media: Dataset[MediaRecord], everyN: Int): DataFrame = {
    require(everyN >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      codecWarm
      records.flatMap { r =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n by everyN).map { i =>
              (r.doc_id, i, reader.getWidth(i), reader.getHeight(i))
            }.iterator
          } catch { case _: Exception => Iterator.empty }
          finally { reader.dispose(); iis.close() }
        }
      }
    }.toDF("doc_id", "frame_idx", "width", "height")
  }

  /** Documents → real animated-GIF payloads with frame count and
   *  dimensions derived from the row, so the oracle knows the
   *  expected demux output without the bytes. */
  def videoFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        codecWarm
        it.map { case (id, nChars) =>
          MediaRecord(id,
            encodeGif(id, (nChars % 32 + 1).toInt, (id % 24 + 1).toInt,
              (id % 5 + 2).toInt),
            "image/gif")
        }
      }
  }

  /** One JPEG `ImageWriter` per partition — same registry-scan
   *  amortization as [[pngWriter]]. */
  def jpegWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()

  /** Deterministic AVI/MJPEG: REAL executor-rendered JPEG frames
   *  muxed into a real RIFF container ([[Avi.encode]]) — a true
   *  non-GIF video path with no native codec dependency. Frame
   *  pixels vary by (docId, frame) so frames are distinct; the
   *  lossy JPEG payload is fine because demux correctness is judged
   *  on frame COUNT and per-frame header DIMENSIONS, which survive
   *  exactly. */
  def encodeAvi(writer: javax.imageio.ImageWriter, docId: Long,
      width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(
          (((docId * 131) + f * 17) & 0xFFFFFF).toInt))
        g.fillRect(0, 0, width, height)
      } finally g.dispose()
      writeImage(writer, img)
    }
    Avi.encode(frames, width, height)
  }

  /** Documents → real AVI/MJPEG payloads with frame count and
   *  dimensions derived from the row (width = n_chars%32+8, height =
   *  doc_id%24+8, frames = doc_id%5+2), so the oracle knows the
   *  expected demux output without the bytes. */
  def aviFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        codecWarm
        val writer = jpegWriter()
        it.map { case (id, nChars) =>
          MediaRecord(id,
            encodeAvi(writer, id, (nChars % 32 + 8).toInt,
              (id % 24 + 8).toInt, (id % 5 + 2).toInt),
            "video/x-msvideo")
        }
      }
  }

  /** Documents → real single-track MP4 payloads whose container
   *  metadata (codec fourcc, sample count, timescale/duration,
   *  dimensions, per-sample sizes) is derived from the row, so the
   *  oracle knows the expected demux output without the bytes. The
   *  samples themselves are deterministic filler — there is no JDK
   *  h264 encoder and [[Mp4]] is parse-only by design. */
  def mp4FromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val codec = if (id % 2 == 0) "avc1" else "mp4v"
        val sizes = (0L until id % 7 + 1)
          .map(i => ((id + i) % 100 + 1).toInt)
        MediaRecord(id,
          Mp4.encode(codec, (nChars % 32 + 16).toInt, (id % 24 + 16).toInt,
            90000L, 3000L + nChars % 100, sizes, id),
          "video/mp4")
      })
  }

  /** Container-level MP4 metadata per video track — [[Mp4.demux]]'s
   *  box-tree walk lifted over the corpus: per-record codec CPU,
   *  embarrassingly parallel, no shuffle; unparseable payloads yield
   *  no rows (torn files cost their own tail). One row per (doc,
   *  video track): the sample-count / duration / codec-id curation
   *  signals usable with no frame decoder. */
  def demuxMp4Meta(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      Mp4.demux(r.bytes).iterator.map(t =>
        (r.doc_id, t.codec, t.nSamples, t.timescale, t.duration,
          t.width, t.height, t.sampleBytes))
    }).toDF("doc_id", "codec", "n_samples", "timescale", "duration",
      "width", "height", "sample_bytes")
  }

  /** Every `everyN`-th frame of an AVI payload: [[Avi.demux]] walks
   *  the container's chunk tree, then ONLY the sampled frames'
   *  JPEG headers are decoded for dimensions ([[imageDims]]) — the
   *  demux-then-decode-selectively dataflow that matters at scale
   *  (decoding every frame of every video to sample a tenth of them
   *  would be 10× the codec work). Undemuxable payloads and
   *  undecodable frames yield no rows. Output
   *  (doc_id, frame_idx, width, height). */
  def demuxAviFrames(media: Dataset[MediaRecord], everyN: Int): DataFrame = {
    require(everyN >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      codecWarm
      records.flatMap { r =>
        val frames = Avi.demux(r.bytes)
        (0 until frames.length by everyN).iterator.flatMap { i =>
          imageDims(frames(i)).map { case (w, h) => (r.doc_id, i, w, h) }
        }
      }
    }.toDF("doc_id", "frame_idx", "width", "height")
  }

  /** STUB DECODER — deterministic fake for mimes with no JDK codec. */
  private def stubDecode(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      n_bytes = n,
      width = ((n % 640) + 1).toInt,
      height = (((n * 7) % 480) + 1).toInt,
      n_frames = ((n % 30) + 1).toInt)
  }

  /** Deterministic tiny PNG: real, decodable image bytes rendered
   *  with the JDK's own encoder (pixel pattern keyed by `docId` so
   *  payloads differ). Executor-side generation for the image-decode
   *  query — the testdata carries no binary blobs, so the query
   *  synthesizes real images in flight and proves the imageio path
   *  end-to-end against an oracle that knows the dimensions. */
  def encodePng(docId: Long, width: Int, height: Int): Array[Byte] =
    encodePng(pngWriter(), docId, width, height)

  /** One PNG `ImageWriter` per partition — `ImageIO.write`'s
   *  per-call registry scan and stream setup dominate tiny-image
   *  encode cost; reusing the writer is the standard batched-encode
   *  shape (and is why [[extractFeatures]]-style per-partition init
   *  exists at all). */
  def pngWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

  def encodePng(writer: javax.imageio.ImageWriter, docId: Long,
      width: Int, height: Int): Array[Byte] = {
    // 3BYTE_BGR: the PNG encoder consumes the raster directly — no
    // per-pixel int→byte repack on write
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val rgb = (docId * 2654435761L + x * 31L + y * 17L) & 0xFFFFFF
        val o = (y * width + x) * 3
        raster(o) = (rgb & 0xff).toByte
        raster(o + 1) = ((rgb >> 8) & 0xff).toByte
        raster(o + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    writeImage(writer, img)
  }

  /** Encode a raster through a reused writer of ANY format (PNG,
   *  JPEG, …) — memory-cached stream for the same reason as
   *  [[imageDims]]: the factory default buffers through a per-call
   *  temp FILE. */
  def writeImage(writer: javax.imageio.ImageWriter,
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally ios.close()
    bos.toByteArray
  }

  /** Documents → real PNG payloads with dimensions derived from the
   *  row (width = n_chars%64+1, height = doc_id%48+1): the oracle can
   *  state the expected dimensions without seeing the bytes. */
  def imagesFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        codecWarm // serialize JVM-wide awt/imageio class init
        val writer = pngWriter() // codec init once per partition
        it.map { case (id, nChars) =>
          MediaRecord(id,
            encodePng(writer, id, (nChars % 64 + 1).toInt, (id % 48 + 1).toInt),
            "image/png")
        }
      }
  }

  /** DuckDB mirror of the stub decode (oracle). */
  def decodeSql(table: String): String =
    s"""SELECT doc_id, 'application/x-' || source AS mime,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       |  CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
       |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
       |FROM $table""".stripMargin

  /**
   * Batched feature extraction: one decoder per PARTITION (init cost
   * amortized), records streamed through it lazily — the mapInPandas
   * batch shape, JVM-native. `parallelism` rebalances decode work
   * across executors when upstream splits are skewed (binary blobs
   * rarely split evenly); pass 0 to keep the upstream partitioning.
   */
  def extractFeatures(media: Dataset[MediaRecord], parallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced =
      if (parallelism > 0) media.repartition(parallelism) else media
    balanced.mapPartitions { records =>
      // Real codecs would be opened HERE, once per partition.
      codecWarm
      records.map(decode)
    }
  }

  /** Full pixel decode via the same memory-cached reader path as
   *  [[imageDims]] (never `ImageIO.read(InputStream)` — its factory
   *  wraps a temp-FILE-cached stream per record). None when no
   *  installed reader claims or can decode the bytes. */
  def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    withImageReader(bytes)(_.read(0))

  /** REAL RESIZE for image mimes: decode ([[readImage]]) → bilinear
   *  scale onto a `width`×`height` raster (`java.awt.Graphics2D`, in
   *  the JDK) → re-encode as PNG with a per-PARTITION writer (the q54
   *  lesson: per-call registry scans dominate tiny-image encode).
   *  Output mime records the transform (`image/png;resized=WxH`).
   *  Mimes with no JDK codec (and image bytes no reader can decode)
   *  fall back to the byte-level stub below — the one remaining stub
   *  surface, since the JDK ships no mp4/h264 codec. */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    require(width >= 1 && height >= 1, "resize needs positive target dims")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      codecWarm
      val writer = pngWriter() // codec init once per partition
      records.map { r =>
        val real =
          if (r.mime.startsWith("image/")) readImage(r.bytes).map { src =>
            val dst = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, width, height, null)
            } finally g.dispose()
            MediaRecord(r.doc_id, writeImage(writer, dst),
              s"image/png;resized=${width}x$height")
          } else None
        real.getOrElse(stubResize(r, width, height))
      }
    }
  }

  /** STUB RESIZE — deterministic byte truncation/cycle for payloads
   *  with no JDK codec (the real path above handles images). */
  private def stubResize(r: MediaRecord, width: Int, height: Int): MediaRecord = {
    val target = width * height / 64 // stub "compressed" size
    val out = new Array[Byte](math.max(target, 1))
    var i = 0
    while (i < out.length) {
      out(i) = if (r.bytes.isEmpty) 0 else r.bytes(i % r.bytes.length)
      i += 1
    }
    MediaRecord(r.doc_id, out, s"${r.mime};resized=${width}x$height")
  }

  /** Frame size of the stub container format (small enough that
   *  testdata payloads span multiple frames, so the 1→N explode is
   *  actually exercised). */
  val FrameBytes = 64

  /** STUB FRAME SAMPLER — every `everyN`-th fixed-size frame of the
   *  payload (a real implementation demuxes the container and decodes
   *  only the sampled frames). The 1→N flatMap dataflow — one blob
   *  exploding into many frame rows, each independently processable
   *  downstream — is the real video-pipeline shape and is what the
   *  oracle verifies (q48). Empty payloads yield one empty frame so
   *  no document silently disappears. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[FrameRecord] = {
    require(everyN >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = math.max((r.bytes.length + FrameBytes - 1) / FrameBytes, 1)
      (0 until n by everyN).iterator.map { i =>
        val start = i * FrameBytes
        val end = math.min(start + FrameBytes, r.bytes.length)
        val b = if (end > start)
          java.util.Arrays.copyOfRange(r.bytes, start, end)
        else Array.emptyByteArray
        FrameRecord(r.doc_id, i, b)
      }
    }
  }

  // --------------------- perceptual hashing fixtures + dHash (X140)

  /** Grid the perceptual-hash machinery samples: 8 block columns ×
   *  9 block rows → 7 horizontal comparisons × 9 rows = 63 bits, so
   *  the hash never touches the sign bit and both engines sum the
   *  bit terms in plain non-negative BIGINT arithmetic. */
  val DhashCols = 8
  val DhashRows = 9

  /** Deterministic block value of the dHash fixture imagery: the
   *  grayscale of block (bx, by) in content family `fam`. A
   *  piecewise-constant 8×9 block pattern is the fixture shape that
   *  makes perceptual-hash semantics JUDGEABLE: any re-encode or
   *  resize (dims ≥ 8×9) preserves the block structure, so the dHash
   *  of the decoded pixels is derivable by the oracle from (fam,
   *  edit) alone — no image codec in DuckDB required — while the
   *  Spark side must still run the REAL decode to reach the pixels.
   *  `edit` perturbs exactly one interior block (the "slightly
   *  edited near-duplicate"), moving ≤ 2 of the 63 gradient bits. */
  /** The fixture cell hash is the repo's judged cross-engine h60
   *  (md5-derived — [[graft.functions.Hashing]]'s exact contract, in
   *  plain JVM form for the executor-side encoders). Every ALGEBRAIC
   *  mix tried here leaked structure into the small output modulus:
   *  an additive-LCG pre-mix collided whole families at constant
   *  offsets (Δfam·403·C ≡ 0 mod 2²⁰−3 ⇒ ghost twins at Δfam=3740),
   *  and a multiply-then-square form factorized mod 251 whenever the
   *  big-prime reduction didn't bite (mirror families with
   *  multipliers ≡ ±m mod 251 hashed IDENTICALLY — both caught by
   *  sf0.1 row counts). md5 has no such congruence structure, and
   *  both engines already replay it bit-exactly everywhere else. */
  private[multimodal] def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** SQL twin of one fixture-cell h60 over a '||'-built key. */
  private def h60FixSql(keySql: String): String =
    s"CAST('0x' || substr(md5($keySql), 1, 15) AS BIGINT)"

  def dhashBlockVal(fam: Long, bx: Int, by: Int, edit: Boolean): Int = {
    val v = (h60(s"d:$fam:$bx:$by") % 251L).toInt
    if (edit && bx == 4 && by == 4) (v + 128) % 251 else v
  }

  /** Render one fixture image: real PNG bytes whose pixel (x, y)
   *  carries gray [[dhashBlockVal]](fam, x·8 div W, y·9 div H) on all
   *  three channels — so integer luma (299r + 587g + 114b) / 1000
   *  recovers the block value EXACTLY after the lossless PNG
   *  round-trip. */
  def encodeBlockPng(writer: javax.imageio.ImageWriter, fam: Long,
      width: Int, height: Int, edit: Boolean): Array[Byte] = {
    require(width >= DhashCols && height >= DhashRows,
      s"fixture dims must cover the ${DhashCols}x$DhashRows grid, " +
        s"got ${width}x$height")
    // grid precomputed once per image: the cell hash is md5-backed,
    // so per-PIXEL evaluation would pay 72× the digests for nothing
    val grid = Array.tabulate(DhashRows, DhashCols)((by, bx) =>
      dhashBlockVal(fam, bx, by, edit).toByte)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < height) {
      val row = grid(y * DhashRows / height)
      var x = 0
      while (x < width) {
        val v = row(x * DhashCols / width)
        val o = (y * width + x) * 3
        raster(o) = v; raster(o + 1) = v; raster(o + 2) = v
        x += 1
      }
      y += 1
    }
    writeImage(writer, img)
  }

  /** The near-duplicate-bearing image corpus the perceptual-dedup row
   *  judges: every %20 doc contributes a base image (dims keyed by
   *  the doc so the corpus is heterogeneous), every %40==0 doc a
   *  RESIZED re-encode twin (+10⁶ — same content family, different
   *  dims: hamming 0 by block preservation), every %40==20 doc an
   *  EDITED twin (+2·10⁶ — one block perturbed: hamming ≤ 2). */
  def dhashPngsFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id")).filter(col("doc_id") % 20 === 0)
    blockPngsFor(base
      .select(col("doc_id").as("id"), col("doc_id").as("fam"),
        lit(false).as("alt"), lit(false).as("edit"))
      .unionAll(base.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("id"), col("doc_id").as("fam"),
          lit(true).as("alt"), lit(false).as("edit")))
      .unionAll(base.filter(col("doc_id") % 40 === 20)
        .select((col("doc_id") + 2000000L).as("id"), col("doc_id").as("fam"),
          lit(false).as("alt"), lit(true).as("edit")))
      .as[(Long, Long, Boolean, Boolean)])
  }

  /** Render block-fixture PNGs for an EXPLICIT variant set (id, fam,
   *  alt, edit) — the generator under [[dhashPngsFromDocuments]],
   *  factored so other rows (the X146 ingest-screen batches) can
   *  build their own twin/novel mixes. `alt` re-renders the same
   *  content family at different dims (the re-encode twin). */
  def blockPngsFor(
      variants: Dataset[(Long, Long, Boolean, Boolean)]): Dataset[MediaRecord] = {
    val spark = variants.sparkSession
    import spark.implicits._
    variants.mapPartitions { it =>
      codecWarm
      val writer = pngWriter()
      it.map { case (id, fam, alt, edit) =>
        val w = 16 + (fam % 17).toInt + (if (alt) 6 else 0)
        val h = 18 + (fam % 13).toInt + (if (alt) 4 else 0)
        MediaRecord(id, encodeBlockPng(writer, fam, w, h, edit), "image/png")
      }
    }
  }

  /** 63-bit perceptual dHash over REAL decoded pixels (X140 — the
   *  difference-hash of Krawetz's dHash construction, at the 8×9
   *  sign-free grid): decode ([[readImage]]), integer luma, sample
   *  one pixel per grid cell (x = ⌈gx·W/8⌉ — the first pixel OF block
   *  gx for any W ≥ 8, so block content, not interpolation, decides
   *  the hash), set bit gy·7+gx iff luma(gx+1, gy) > luma(gx, gy).
   *  One zero-shuffle mapPartitions pass, decoder opened per
   *  partition (the [[extractFeatures]] batch shape); undecodable
   *  payloads yield no row. Output (doc_id, dh). */
  def dhash63(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      codecWarm
      records.flatMap { r =>
        readImage(r.bytes).flatMap(dhash63OfImage)
          .map(h => (r.doc_id, h)).iterator
      }
    }.toDF("doc_id", "dh")
  }

  /** The oracle's closed form of the fixture dHash: a 63-term
   *  bit sum over [[dhashBlockVal]] replayed in SQL from (fam, edit)
   *  alone — dims drop out because block sampling is exact at any
   *  size, which is precisely the resize-invariance the row judges. */
  def dhash63FixtureSql(famExpr: String, editExpr: String): String = {
    def v(bx: Int, by: Int): String = {
      val base =
        s"(${h60FixSql(s"'d:' || $famExpr || ':$bx:$by'")} % 251)"
      if (bx == 4 && by == 4)
        s"(CASE WHEN $editExpr THEN ($base + 128) % 251 ELSE $base END)"
      else base
    }
    val terms = for (gy <- 0 until DhashRows; gx <- 0 until DhashCols - 1)
      yield s"(CASE WHEN ${v(gx + 1, gy)} > ${v(gx, gy)} THEN " +
        s"${1L << (gy * (DhashCols - 1) + gx)} ELSE 0 END)"
    terms.mkString("(", " + ", ")")
  }

  // ------------------ per-frame video fingerprint + fixtures (X145)

  /** Deterministic block value of the VIDEO fixture imagery: the
   *  grayscale of block (bx, by) in frame `f` of content family
   *  `fam`, QUANTIZED to 64 levels (multiples of 4) so every frame
   *  holds ≤ 64 distinct colors and the JDK GIF writer's palette
   *  round-trips the pixels exactly — the lossless-codec property the
   *  [[dhashBlockVal]] PNG fixture gets for free. `edit` perturbs one
   *  interior block of ONE frame (the "re-titled frame" of a video
   *  near-duplicate). */
  def videoBlockVal(fam: Long, f: Int, bx: Int, by: Int,
      edit: Boolean): Int = {
    // the [[dhashBlockVal]] h60 cell hash (see its structure note) at
    // 61 quantized levels, with the frame in the key
    val q0 = (h60(s"v:$fam:$f:$bx:$by") % 61L).toInt
    val q = if (edit && bx == 4 && by == 4) (q0 + 32) % 61 else q0
    q * 4
  }

  /** Render one fixture video: a REAL animated GIF ([[encodeGif]]'s
   *  writer path) whose frame f carries the [[videoBlockVal]] block
   *  pattern — block structure at any dims ≥ the 8×9 grid, exactly
   *  like [[encodeBlockPng]], but multi-frame. `editFrame` ≥ 0 marks
   *  that one frame's perturbed variant. */
  def encodeBlockGif(fam: Long, width: Int, height: Int, nFrames: Int,
      editFrame: Int): Array[Byte] = {
    require(width >= DhashCols && height >= DhashRows,
      s"fixture dims must cover the ${DhashCols}x$DhashRows grid, " +
        s"got ${width}x$height")
    // hand the writer an explicitly INDEXED image (64 gray entries,
    // value i·4): the GIF encoder copies the palette verbatim instead
    // of running its own quantizer — losslessness by construction,
    // not by hoping the octree doesn't reduce
    val grays = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 64, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        // per-frame grid precomputed once (md5-backed cell hash)
        val grid = Array.tabulate(DhashRows, DhashCols)((by, bx) =>
          videoBlockVal(fam, f, bx, by, f == editFrame) / 4)
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          val row = grid(y * DhashRows / height)
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, row(x * DhashCols / width))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** The near-duplicate-bearing video corpus the frame-fingerprint
   *  dedup row judges: every %20 doc a base clip (3–5 frames, dims
   *  keyed by the doc), every %40==0 doc a RE-ENCODED twin (+10⁶ —
   *  same frames at different dims: every frame fingerprint matches),
   *  every %40==20 doc an EDITED twin (+2·10⁶ — one frame perturbed:
   *  all but one match). */
  def videoGifsFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id")).filter(col("doc_id") % 20 === 0)
    val variants = base
      .select(col("doc_id").as("id"), col("doc_id").as("fam"),
        lit(false).as("alt"), lit(-1).as("editFrame"))
      .unionAll(base.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("id"), col("doc_id").as("fam"),
          lit(true).as("alt"), lit(-1).as("editFrame")))
      .unionAll(base.filter(col("doc_id") % 40 === 20)
        .select((col("doc_id") + 2000000L).as("id"), col("doc_id").as("fam"),
          lit(false).as("alt"), lit(1).as("editFrame")))
      .as[(Long, Long, Boolean, Int)]
    variants.mapPartitions { it =>
      codecWarm
      it.map { case (id, fam, alt, editFrame) =>
        val w = (if (alt) 24 else 16) + (fam % 17).toInt
        val h = (if (alt) 13 else 18) + (fam % 13).toInt
        MediaRecord(id,
          encodeBlockGif(fam, w, h, 3 + (fam % 3).toInt, editFrame),
          "image/gif")
      }
    }
  }

  /** Per-frame 63-bit dHash with REAL container demux + pixel decode
   *  (X145): every frame of a multi-frame image container decodes
   *  through `ImageReader.read(i)` and hashes through the
   *  [[dhash63]] grid kernel. One zero-shuffle mapPartitions pass,
   *  reader opened per record, decoder registry warmed per partition;
   *  unclaimed payloads or sub-grid frames yield no rows. Output
   *  (doc_id, frame_idx, dh). */
  def frameDhash63(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      codecWarm
      records.flatMap { r =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n).flatMap { i =>
              val img = reader.read(i)
              dhash63OfImage(img).map(h => (r.doc_id, i, h))
            }.iterator
          } catch { case _: Exception => Iterator.empty }
          finally { reader.dispose(); iis.close() }
        }
      }
    }.toDF("doc_id", "frame_idx", "dh")
  }

  /** The [[dhash63]] grid kernel over one decoded image — factored so
   *  the single-image and per-frame paths hash identically. */
  def dhash63OfImage(img: java.awt.image.BufferedImage): Option[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < DhashCols || h < DhashRows) None
    else {
      val g = Array.ofDim[Int](DhashRows, DhashCols)
      var gy = 0
      while (gy < DhashRows) {
        val sy = (gy * h + DhashRows - 1) / DhashRows
        var gx = 0
        while (gx < DhashCols) {
          val sx = (gx * w + DhashCols - 1) / DhashCols
          val rgb = img.getRGB(sx, sy)
          g(gy)(gx) = (((rgb >> 16) & 0xFF) * 299 +
            ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      gy = 0
      while (gy < DhashRows) {
        var gx = 0
        while (gx < DhashCols - 1) {
          if (g(gy)(gx + 1) > g(gy)(gx))
            hash |= 1L << (gy * (DhashCols - 1) + gx)
          gx += 1
        }
        gy += 1
      }
      Some(hash)
    }
  }

  /** The oracle's closed form of the fixture VIDEO frame hash: the
   *  [[dhash63FixtureSql]] bit sum over [[videoBlockVal]], replayed
   *  from (fam, frame, editFrame) alone — dims drop out by block
   *  sampling, the quantization is part of the formula. */
  def videoFrameDhashSql(famExpr: String, frameExpr: String,
      editFrameExpr: String): String = {
    def v(bx: Int, by: Int): String = {
      val base = s"(${h60FixSql(
          s"'v:' || $famExpr || ':' || $frameExpr || ':$bx:$by'")} % 61)"
      if (bx == 4 && by == 4)
        s"(CASE WHEN $frameExpr = $editFrameExpr THEN ($base + 32) % 61 " +
          s"ELSE $base END)"
      else base
    }
    // the ·4 rescale is order-preserving, so comparisons run on the
    // 64-level pre-image
    val terms = for (gy <- 0 until DhashRows; gx <- 0 until DhashCols - 1)
      yield s"(CASE WHEN ${v(gx + 1, gy)} > ${v(gx, gy)} THEN " +
        s"${1L << (gy * (DhashCols - 1) + gx)} ELSE 0 END)"
    terms.mkString("(", " + ", ")")
  }

  // ------------------ perceptual audio fingerprint + fixtures (X144)

  /** Window count of the audio difference hash: 64 sample windows →
   *  63 successor comparisons — the 1-D twin of the
   *  [[DhashCols]]×[[DhashRows]] image grid, sign-free in a BIGINT
   *  for the same reason (both engines sum bit terms in plain
   *  non-negative arithmetic). */
  val AhashSegs = 64

  /** Deterministic per-segment PCM level of the audio fixture: the
   *  s16 sample value of segment `seg` in content family `fam`.
   *  Piecewise-constant segments are the 1-D twin of the dHash block
   *  fixture: any re-render of the same content at a different sample
   *  rate or clip length (≥ [[AhashSegs]] frames) preserves the
   *  segment structure, so the fingerprint of the DECODED samples is
   *  derivable by the oracle from (fam, edit) alone — no audio codec
   *  in DuckDB — while the Spark side must run the real RIFF/PCM
   *  decode to reach them. `edit` perturbs exactly one interior
   *  segment (a dropped-in splice), moving ≤ 2 of the 63 comparison
   *  bits. The −30000 centering makes the payload honest signed
   *  audio; it cancels out of every comparison, so the oracle's
   *  closed form runs on the non-negative pre-image. */
  def ahashSegVal(fam: Long, seg: Int, edit: Boolean): Int = {
    // the [[dhashBlockVal]] h60 cell hash (see its structure note)
    // in 1-D, centered to honest signed PCM
    val w = (h60(s"a:$fam:$seg") % 59999L).toInt
    val v = if (edit && seg == 32) (w + 30000) % 59999 else w
    v - 30000
  }

  /** Render one fixture clip: a REAL mono 16-bit PCM WAV (written
   *  with the JDK's own encoder, like [[encodeWav]]) whose frame i
   *  carries sample [[ahashSegVal]](fam, i·64 div N, edit) — the RIFF
   *  data-chunk round trip recovers each segment level exactly. */
  def encodeSegWav(fam: Long, sampleRate: Int, nFrames: Int,
      edit: Boolean): Array[Byte] = {
    require(nFrames >= AhashSegs,
      s"fixture clips must cover the $AhashSegs-window grid, got $nFrames")
    // segment levels precomputed once per clip (md5-backed hash)
    val segs = Array.tabulate(AhashSegs)(s => ahashSegVal(fam, s, edit))
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = segs((i.toLong * AhashSegs / nFrames).toInt)
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The near-duplicate-bearing audio corpus the perceptual-dedup row
   *  judges — the WAV twin of [[dhashPngsFromDocuments]]: every %20
   *  doc contributes a base clip (rate and length keyed by the doc so
   *  the corpus is heterogeneous), every %40==0 doc a RE-RENDERED
   *  twin (+10⁶ — same content family at a different sample rate AND
   *  length: hamming 0 by segment preservation, the re-encode/
   *  resample case), every %40==20 doc a SPLICED twin (+2·10⁶ — one
   *  segment perturbed: hamming ≤ 2). */
  def ahashWavsFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id")).filter(col("doc_id") % 20 === 0)
    val variants = base
      .select(col("doc_id").as("id"), col("doc_id").as("fam"),
        lit(false).as("alt"), lit(false).as("edit"))
      .unionAll(base.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 1000000L).as("id"), col("doc_id").as("fam"),
          lit(true).as("alt"), lit(false).as("edit")))
      .unionAll(base.filter(col("doc_id") % 40 === 20)
        .select((col("doc_id") + 2000000L).as("id"), col("doc_id").as("fam"),
          lit(false).as("alt"), lit(true).as("edit")))
      .as[(Long, Long, Boolean, Boolean)]
    variants.mapPartitions { it =>
      codecWarm
      it.map { case (id, fam, alt, edit) =>
        val rate = if (alt) 16000 + (fam % 3).toInt * 8000
                   else 8000 + (fam % 4).toInt * 4000
        val n = if (alt) 320 + (fam % 89).toInt else 192 + (fam % 97).toInt
        MediaRecord(id, encodeSegWav(fam, rate, n, edit), "audio/wav")
      }
    }
  }

  /** Sample payload of a plain mono 16-bit PCM WAV: [[wavMeta]]'s
   *  RIFF chunk walk carried through to the data chunk's samples
   *  (little-endian s16). None for any other shape — the fingerprint
   *  only defines itself over samples it can decode exactly. */
  def wavPcm16(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 12) return None
    def fcc(p: Int) = new String(bytes, p, 4, "US-ASCII")
    def u32(p: Int): Long =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    def u16(p: Int): Int = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
    if (fcc(0) != "RIFF" || fcc(8) != "WAVE") return None
    val end = math.min(bytes.length.toLong, 8L + u32(4))
    var p = 12L
    var pcm16Mono = false
    var dataOff = -1L; var dataLen = -1L
    while (p + 8 <= end) {
      val id = fcc(p.toInt); val sz = u32(p.toInt + 4)
      if (id == "fmt " && sz >= 16 && p + 24 <= bytes.length)
        pcm16Mono = u16(p.toInt + 8) == 1 && u16(p.toInt + 10) == 1 &&
          u16(p.toInt + 22) == 16
      else if (id == "data") {
        dataOff = p + 8
        dataLen = math.min(sz, bytes.length - (p + 8))
      }
      p += 8 + sz + (sz & 1)
    }
    if (!pcm16Mono || dataOff < 0 || dataLen < 0) return None
    val n = (dataLen / 2).toInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val o = (dataOff + i * 2).toInt
      out(i) = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
      i += 1
    }
    Some(out)
  }

  /** 63-bit perceptual audio fingerprint over REAL decoded PCM (X144
   *  — the 1-D difference hash, [[dhash63]]'s audio twin): RIFF parse
   *  → s16 samples → one sample per window (index ⌈w·N/64⌉, the first
   *  frame OF window w, so segment content — not interpolation —
   *  decides the hash for any N ≥ 64) → bit w iff s(w+1) > s(w). One
   *  zero-shuffle mapPartitions pass; undecodable or short payloads
   *  yield no row. Output (doc_id, ah). */
  def ahash63(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      records.flatMap { r =>
        wavPcm16(r.bytes).flatMap { pcm =>
          val n = pcm.length
          if (n < AhashSegs) None
          else {
            val w = new Array[Int](AhashSegs)
            var g = 0
            while (g < AhashSegs) {
              w(g) = pcm(((g.toLong * n + AhashSegs - 1) / AhashSegs).toInt)
              g += 1
            }
            var hash = 0L
            g = 0
            while (g < AhashSegs - 1) {
              if (w(g + 1) > w(g)) hash |= 1L << g
              g += 1
            }
            Some((r.doc_id, hash))
          }
        }.iterator
      }
    }.toDF("doc_id", "ah")
  }

  /** The oracle's closed form of the fixture audio fingerprint: a
   *  63-term bit sum over [[ahashSegVal]] replayed in SQL from (fam,
   *  edit) alone — rate and length drop out because window sampling
   *  is exact at any N ≥ 64, which is precisely the re-render
   *  invariance the row judges. Comparisons run on the non-negative
   *  pre-image (the −30000 centering cancels). */
  def ahash63FixtureSql(famExpr: String, editExpr: String): String = {
    def v(seg: Int): String = {
      val base = s"(${h60FixSql(s"'a:' || $famExpr || ':$seg'")} % 59999)"
      if (seg == 32)
        s"(CASE WHEN $editExpr THEN ($base + 30000) % 59999 ELSE $base END)"
      else base
    }
    val terms = for (g <- 0 until AhashSegs - 1)
      yield s"(CASE WHEN ${v(g + 1)} > ${v(g)} THEN ${1L << g} ELSE 0 END)"
    terms.mkString("(", " + ", ")")
  }

  /** DuckDB mirror of the stub frame sampler's (doc_id, frame_idx,
   *  n_bytes) view. */
  def sampleFramesSql(table: String, everyN: Int): String =
    s"""SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       |  CAST(greatest(least($FrameBytes, len - frame_idx * $FrameBytes), 0) AS INT) AS n_bytes
       |FROM (
       |  SELECT doc_id, len, unnest(range(0,
       |    greatest((len + ${FrameBytes - 1}) // $FrameBytes, 1), $everyN)) AS frame_idx
       |  FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM $table))""".stripMargin
}
