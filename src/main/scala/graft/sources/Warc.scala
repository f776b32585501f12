package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

/**
 * Minimal WARC 1.0 codec (ISO 28500 / the Common Crawl container) in
 * pure JVM bytes — the web-crawl twin of [[Msgpack]]'s wire codec and
 * [[graft.multimodal.Avi]]'s RIFF walker. Common Crawl publishes its
 * corpus as `.warc.gz` files where EACH record is its own gzip member
 * and members are concatenated; that convention is what makes the
 * format splittable-ish in practice (readers can resynchronize on
 * gzip magic) and it is exactly what [[encodeGz]] emits and
 * [[decode]] consumes (Java's GZIPInputStream reads concatenated
 * members natively).
 *
 * Record layout written (all line ends CRLF):
 * {{{
 *   WARC/1.0
 *   WARC-Type: response
 *   WARC-Record-ID: <urn:uuid:...>          (deterministic, id-derived)
 *   WARC-Date: 2026-01-01T00:00:00Z
 *   WARC-Target-URI: http://...
 *   Content-Type: text/plain
 *   Content-Length: N
 *   <blank>
 *   payload (N raw bytes — may contain CRLFs, NULs, anything)
 *   <blank><blank>                          (record separator)
 * }}}
 *
 * The decoder is a real header parser (version line, folded-header-free
 * key: value lines to the blank separator, `Content-Length`-bounded
 * payload read, separator consume) — payload bytes are NEVER scanned
 * for delimiters, so binary payloads round-trip exactly. Malformed or
 * truncated input ends the stream: records decoded so far are
 * returned (the same tolerance posture as [[Msgpack.decodeEvents]]
 * and [[graft.multimodal.Avi.demux]] — at 100 TB a torn file must
 * cost its tail, not the job).
 */
object Warc {

  final case class Record(
      uri: String, recordType: String, contentType: String,
      payload: Array[Byte])

  private val Crlf = "\r\n"

  // ------------------------------------------------------------ encode

  /** Serialize one record (uncompressed). `idSeed` only feeds the
   *  deterministic WARC-Record-ID — replay-stable, no RNG/clock. */
  def encodeRecord(uri: String, payload: Array[Byte],
      recordType: String = "response",
      contentType: String = "text/plain; charset=utf-8",
      idSeed: Long = 0L): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(recordType).append(Crlf)
      .append("WARC-Record-ID: <urn:uuid:")
      .append(f"${idSeed}%016x-0000-0000-0000-000000000000")
      .append(">").append(Crlf)
      .append("WARC-Date: 2026-01-01T00:00:00Z").append(Crlf)
      .append("WARC-Target-URI: ").append(uri).append(Crlf)
      .append("Content-Type: ").append(contentType).append(Crlf)
      .append("Content-Length: ").append(payload.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload)
    out.write(Crlf.getBytes("US-ASCII")); out.write(Crlf.getBytes("US-ASCII"))
    out.toByteArray
  }

  /** One gzip member per record, members concatenated — the Common
   *  Crawl `.warc.gz` convention. */
  def encodeGz(records: Seq[(String, Array[Byte])],
      idSeedOf: Int => Long = _.toLong): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((uri, payload), i) =>
      val gz = new GZIPOutputStream(out)
      gz.write(encodeRecord(uri, payload, idSeed = idSeedOf(i)))
      gz.finish()
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode a chunk: gzipped (multi-member, by magic 1f 8b) or plain
   *  concatenated records. Truncated/foreign tails yield the records
   *  parsed so far. */
  def decode(bytes: Array[Byte]): Seq[Record] = {
    val plain =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
          (bytes(1) & 0xff) == 0x8b) gunzipAll(bytes)
      else bytes
    parseAll(plain)
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 4)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 65536)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () } // torn member: keep prefix
    out.toByteArray
  }

  private def parseAll(b: Array[Byte]): Seq[Record] = {
    val acc = mutable.ArrayBuffer.empty[Record]
    var p = 0
    var ok = true
    while (ok && p < b.length) {
      parseOne(b, p) match {
        case Some((rec, next)) => acc += rec; p = next
        case None => ok = false
      }
    }
    acc.toSeq
  }

  /** Read one CRLF-terminated ASCII line; None on no terminator. */
  private def line(b: Array[Byte], p: Int): Option[(String, Int)] = {
    var i = p
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 >= b.length) None
    else Some((new String(b, p, i - p, "UTF-8"), i + 2))
  }

  private def parseOne(b: Array[Byte], start: Int): Option[(Record, Int)] = {
    line(b, start) match {
      case Some((v, p0)) if v.startsWith("WARC/") =>
        var p = p0
        var len = -1L
        var uri = ""; var tpe = ""; var ct = ""
        var done = false
        var bad = false
        while (!done && !bad) {
          line(b, p) match {
            case Some(("", np)) => p = np; done = true
            case Some((h, np)) =>
              p = np
              val c = h.indexOf(':')
              if (c < 0) bad = true
              else {
                val k = h.substring(0, c).trim.toLowerCase
                val vv = h.substring(c + 1).trim
                k match {
                  case "content-length" =>
                    len = try vv.toLong catch { case _: NumberFormatException => -1L }
                  case "warc-target-uri" => uri = vv
                  case "warc-type" => tpe = vv
                  case "content-type" => ct = vv
                  case _ => () // unknown headers pass through
                }
              }
            case None => bad = true
          }
        }
        if (bad || len < 0 || p + len > b.length) None
        else {
          val payload = java.util.Arrays.copyOfRange(b, p, p + (len.toInt))
          var next = p + len.toInt
          // consume the record separator (two CRLFs); tolerate EOF
          var crlfs = 0
          while (crlfs < 2 && next + 1 < b.length &&
              b(next) == '\r' && b(next + 1) == '\n') { next += 2; crlfs += 1 }
          Some((Record(uri, tpe, ct, payload), next))
        }
      case _ => None // not a WARC version line: stop (foreign bytes)
    }
  }
}
