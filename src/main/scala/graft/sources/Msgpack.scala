package graft.sources

import scala.collection.mutable

/**
 * Minimal msgpack codec for the fluent-bit EVENT subset — the
 * reference's actual wire format: a chunk is CONCATENATED msgpack
 * objects, each a 2-element array `[timestamp, {key => value}]`
 * (filter_math/math.c:311-319, 321-353). Pure Scala because this
 * environment ships no msgpack dependency; the format subset is
 * exactly what fluent-bit 1.4 emits.
 *
 * Decoding semantics mirror the reference:
 *  - timestamp: positive/negative int (seconds), float (seconds), or
 *    fluent-bit's fixext8/ext8 type 0 (BE sec + BE nsec) — all
 *    normalized to NANOSECONDS since epoch, matching the engine's
 *    `nanosAsLong` events table;
 *  - payload values: the four numeric families coerce to double
 *    (math.c:151-159); any other type keeps the KEY with a null
 *    value (presence matters: the reference's scan skips it and
 *    continues, math.c:161);
 *  - duplicate exact keys: first numeric occurrence wins (the
 *    observable result of the reference's forward scan);
 *  - a malformed object ends the chunk: events decoded so far are
 *    returned (the reference logs and passes raw bytes through —
 *    unrepresentable in typed rows; documented divergence).
 */
object Msgpack {

  final case class Event(ts: Long, payload: Seq[(String, Option[Double])])

  // ------------------------------------------------------------ decode

  private final class Cursor(val b: Array[Byte]) {
    var p = 0
    def hasMore: Boolean = p < b.length
    def u8(): Int = { val v = b(p) & 0xff; p += 1; v }
    def i8(): Int = { val v = b(p).toInt; p += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def i16(): Int = u16().toShort.toInt
    def i32(): Int = u32().toInt
    def i64(): Long = (u32() << 32) | u32()
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def str(n: Int): String = {
      val s = new String(b, p, n, "UTF-8"); p += n; s
    }
    def skip(n: Int): Unit = p += n
  }

  private case class Malformed(at: Int) extends Exception

  /** Decode one value; numbers → Some(double), strings/bools/nil/
   *  containers → None (present but non-numeric). */
  private def value(c: Cursor): Option[Double] = {
    val t = c.u8()
    t match {
      case x if x <= 0x7f => Some(x.toDouble) // positive fixint
      case x if x >= 0xe0 => Some((x - 256).toDouble) // negative fixint
      case 0xcc => Some(c.u8().toDouble)
      case 0xcd => Some(c.u16().toDouble)
      case 0xce => Some(c.u32().toDouble)
      case 0xcf => // uint64: C casts (double)u64
        val v = c.i64()
        Some(if (v >= 0) v.toDouble
        else (v & 0x7fffffffffffffffL).toDouble + 9.223372036854776e18)
      case 0xd0 => Some(c.i8().toDouble)
      case 0xd1 => Some(c.i16().toDouble)
      case 0xd2 => Some(c.i32().toDouble)
      case 0xd3 => Some(c.i64().toDouble)
      case 0xca => Some(c.f32().toDouble)
      case 0xcb => Some(c.f64())
      case 0xc0 | 0xc2 | 0xc3 => None // nil / false / true
      case x if (x & 0xe0) == 0xa0 => { c.skip(x & 0x1f); None } // fixstr
      case 0xd9 => { c.skip(c.u8()); None }
      case 0xda => { c.skip(c.u16()); None }
      case 0xdb => { c.skip(c.u32().toInt); None }
      case 0xc4 => { c.skip(c.u8()); None } // bin8
      case 0xc5 => { c.skip(c.u16()); None }
      case 0xc6 => { c.skip(c.u32().toInt); None }
      case x if (x & 0xf0) == 0x90 => { // fixarray: skip elements
        (0 until (x & 0x0f)).foreach(_ => value(c)); None
      }
      case 0xdc => { val n = c.u16(); (0 until n).foreach(_ => value(c)); None }
      case x if (x & 0xf0) == 0x80 => { // fixmap: skip pairs
        (0 until (x & 0x0f)).foreach { _ => value(c); value(c) }; None
      }
      case 0xde => { val n = c.u16(); (0 until n).foreach { _ => value(c); value(c) }; None }
      case 0xdd => { val n = c.u32().toInt; (0 until n).foreach(_ => value(c)); None } // array32
      case 0xdf => { val n = c.u32().toInt; (0 until n).foreach { _ => value(c); value(c) }; None } // map32
      // ext family: the reference passes these through untouched — skip
      case 0xc7 => { val n = c.u8(); c.skip(1 + n); None } // ext8
      case 0xc8 => { val n = c.u16(); c.skip(1 + n); None } // ext16
      case 0xc9 => { val n = c.u32().toInt; c.skip(1 + n); None } // ext32
      case 0xd4 => { c.skip(2); None } // fixext1
      case 0xd5 => { c.skip(3); None } // fixext2
      case 0xd6 => { c.skip(5); None } // fixext4
      case 0xd7 => { c.skip(9); None } // fixext8
      case 0xd8 => { c.skip(17); None } // fixext16
      case _ => throw Malformed(c.p - 1)
    }
  }

  private def key(c: Cursor): String = {
    val t = c.u8()
    t match {
      case x if (x & 0xe0) == 0xa0 => c.str(x & 0x1f)
      case 0xd9 => c.str(c.u8())
      case 0xda => c.str(c.u16())
      case 0xdb => c.str(c.u32().toInt)
      case _ => throw Malformed(c.p - 1)
    }
  }

  private def timestamp(c: Cursor): Long = {
    val t = c.u8()
    t match {
      case x if x <= 0x7f => x.toLong * 1000000000L
      case 0xce => c.u32() * 1000000000L
      case 0xcf | 0xd3 => c.i64() * 1000000000L
      case 0xd2 => c.i32().toLong * 1000000000L
      case 0xca => (c.f32().toDouble * 1e9).toLong
      case 0xcb => (c.f64() * 1e9).toLong
      case 0xd7 => // fixext8, fluent-bit event-time is type 0
        val tp = c.i8(); if (tp != 0) throw Malformed(c.p - 1)
        c.u32() * 1000000000L + c.u32()
      case 0xc7 => // ext8 len 8 type 0
        val len = c.u8(); val tp = c.i8()
        if (len != 8 || tp != 0) throw Malformed(c.p - 1)
        c.u32() * 1000000000L + c.u32()
      case _ => throw Malformed(c.p - 1)
    }
  }

  private def mapHeader(c: Cursor): Int = {
    val t = c.u8()
    t match {
      case x if (x & 0xf0) == 0x80 => x & 0x0f
      case 0xde => c.u16()
      case 0xdf => c.u32().toInt
      case _ => throw Malformed(c.p - 1)
    }
  }

  private def arrayHeader(c: Cursor): Int = {
    val t = c.u8()
    t match {
      case x if (x & 0xf0) == 0x90 => x & 0x0f
      case 0xdc => c.u16()
      case 0xdd => c.u32().toInt
      case _ => throw Malformed(c.p - 1)
    }
  }

  /** Decode a chunk of concatenated events; stops (keeping the parsed
   *  prefix) at the first malformed object. */
  def decodeEvents(bytes: Array[Byte]): Seq[Event] = {
    val c = new Cursor(bytes)
    val out = mutable.ArrayBuffer.empty[Event]
    try {
      while (c.hasMore) {
        val n = arrayHeader(c)
        if (n < 2) throw Malformed(c.p)
        val ts = timestamp(c)
        val entries = mapHeader(c)
        val payload = mutable.LinkedHashMap.empty[String, Option[Double]]
        var i = 0
        while (i < entries) {
          val k = key(c)
          val v = value(c)
          payload.get(k) match {
            case Some(None) if v.isDefined => payload(k) = v // scan continues past non-numeric
            case Some(_) => // first numeric occurrence already won
            case None => payload(k) = v
          }
          i += 1
        }
        (2 until n).foreach(_ => value(c)) // tolerate >2-element arrays
        out += Event(ts, payload.toSeq)
      }
    } catch { case Malformed(_) => /* keep parsed prefix */ }
    out.toSeq
  }

  // ------------------------------------------------------------ encode

  /** Test-support encoder for the same subset. */
  def encodeEvent(tsNanos: Long, payload: Seq[(String, Any)]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def w(i: Int): Unit = o.write(i)
    def w32(v: Long): Unit = { w(((v >> 24) & 0xff).toInt); w(((v >> 16) & 0xff).toInt); w(((v >> 8) & 0xff).toInt); w((v & 0xff).toInt) }
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
    w(0x92) // [ts, map]
    w(0xd7); w(0x00); w32(tsNanos / 1000000000L); w32(tsNanos % 1000000000L)
    require(payload.size < 16); w(0x80 | payload.size)
    payload.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8"); require(kb.length < 32)
      w(0xa0 | kb.length); o.write(kb)
      v match {
        case d: Double => w(0xcb); w64(java.lang.Double.doubleToLongBits(d))
        case i: Int if i >= 0 && i <= 0x7f => w(i)
        case i: Int => w(0xd2); w32(i.toLong & 0xffffffffL)
        case l: Long => w(0xd3); w64(l)
        case s: String =>
          val sb = s.getBytes("UTF-8"); require(sb.length < 32)
          w(0xa0 | sb.length); o.write(sb)
        case b: Boolean => w(if (b) 0xc3 else 0xc2)
        case null => w(0xc0)
      }
    }
    o.toByteArray
  }
}
