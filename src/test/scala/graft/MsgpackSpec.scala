package graft

import org.apache.spark.sql.functions._
import graft.core.{MathCompiler, MathOp}
import graft.sources.{Msgpack, Sources}

/** msgpack wire-format parity: the reference's event encoding decodes
 *  into the engine's map-payload mode with identical semantics. */
class MsgpackSpec extends SparkTestBase {

  test("decode: numerics coerce, non-numerics keep the key, dup keys scan forward") {
    val bytes =
      Msgpack.encodeEvent(1700000000123456789L, Seq(
        "Mem.total" -> 4050908, "Mem.used" -> 476.5, "host" -> "box1")) ++
      Msgpack.encodeEvent(1700000001000000000L, Seq(
        "k" -> "junk", "k" -> 7, "flag" -> true))
    val events = Msgpack.decodeEvents(bytes)
    assert(events.length == 2)
    assert(events(0).ts == 1700000000123456789L)
    assert(events(0).payload == Seq(
      "Mem.total" -> Some(4050908.0), "Mem.used" -> Some(476.5), "host" -> None))
    // duplicate key: non-numeric first, numeric later → numeric wins
    assert(events(1).payload == Seq("k" -> Some(7.0), "flag" -> None))
  }

  test("ext/array32/map32 values are skipped, not treated as malformed") {
    // hand-encode [1, {"e": fixext4, "k": 7, "big": array32[], "m": map32{}}]
    // — the reference passes unknown value types through and keeps
    // scanning (math.c:161); these must not truncate the chunk.
    val o = new java.io.ByteArrayOutputStream()
    def w(xs: Int*): Unit = xs.foreach(o.write)
    w(0x92, 0x01, 0x84) // [1, 4-entry map]
    w(0xa1, 'e'); w(0xd6, 0x7f, 1, 2, 3, 4) // fixext4, type 127
    w(0xa1, 'k', 0x07)
    w(0xa3, 'b', 'i', 'g'); w(0xdd, 0, 0, 0, 0) // array32, 0 elems
    w(0xa1, 'm'); w(0xdf, 0, 0, 0, 0) // map32, 0 pairs
    val tail = Msgpack.encodeEvent(2L * 1000000000L, Seq("x" -> 1))
    val events = Msgpack.decodeEvents(o.toByteArray ++ tail)
    assert(events.length == 2)
    assert(events(0).payload == Seq(
      "e" -> None, "k" -> Some(7.0), "big" -> None, "m" -> None))
    assert(events(1).payload == Seq("x" -> Some(1.0)))
  }

  test("ext8/16/32 and all fixext widths skip their exact payload size") {
    def one(hdr: Seq[Int], key: Char = 'e'): Seq[(String, Option[Double])] = {
      val o = new java.io.ByteArrayOutputStream()
      (Seq(0x92, 0x01, 0x82, 0xa1, key.toInt) ++ hdr).foreach(o.write)
      Seq(0xa1, 'k'.toInt, 0x05).foreach(o.write)
      val ev = Msgpack.decodeEvents(o.toByteArray)
      assert(ev.length == 1); ev(0).payload
    }
    val p = Map(
      "fixext1" -> Seq(0xd4, 1, 9),
      "fixext2" -> Seq(0xd5, 1, 9, 9),
      "fixext8" -> (Seq(0xd7, 1) ++ Seq.fill(8)(9)),
      "fixext16" -> (Seq(0xd8, 1) ++ Seq.fill(16)(9)),
      "ext8" -> Seq(0xc7, 2, 1, 9, 9),
      "ext16" -> Seq(0xc8, 0, 3, 1, 9, 9, 9),
      "ext32" -> Seq(0xc9, 0, 0, 0, 1, 1, 9))
    for ((name, hdr) <- p)
      assert(one(hdr) == Seq("e" -> None, "k" -> Some(5.0)), name)
  }

  test("property: chunk grouping size (1/2/odd/large) never changes the decoded stream") {
    // q60 groups ~100 events per wire chunk (SparkEntry) — an
    // arbitrary transport constant. Pin that the constant is
    // semantics-free: any grouping of the same event stream into
    // chunks decodes to the identical event sequence, including the
    // degenerate one-event and two-event chunk sizes that put every
    // event against a chunk boundary.
    val rnd = new scala.util.Random(13)
    val events = (0 until 23).map { i =>
      val ts = 1700000000L * 1000000000L + i * 1000L
      val payload: Seq[(String, Any)] =
        Seq("event_id" -> i.toLong, "value" -> rnd.nextDouble(), "tag" -> s"t$i")
      (ts, payload)
    }
    def decodeGrouped(n: Int) = events.grouped(n).toSeq.flatMap { g =>
      Msgpack.decodeEvents(
        g.flatMap { case (ts, p) => Msgpack.encodeEvent(ts, p) }.toArray)
    }
    val ref = decodeGrouped(events.length)
    assert(ref.length == events.length)
    for (n <- Seq(1, 2, 3, 7, 100))
      assert(decodeGrouped(n) == ref, s"chunk size $n changed the decode")
  }

  test("property: random event chunks round-trip encode→decode exactly") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val events = (0 until rnd.nextInt(6)).map { _ =>
        val ts = math.abs(rnd.nextLong()) % (4102444800L * 1000000000L)
        val payload = (0 until rnd.nextInt(8)).map { i =>
          val key = s"k${i}_${rnd.nextInt(100)}"
          val v: Any = rnd.nextInt(6) match {
            case 0 => rnd.nextInt(128) // positive fixint
            case 1 => -rnd.nextInt(100000) - 1 // int32
            case 2 => rnd.nextLong() // int64
            case 3 => rnd.nextDouble() * 1e6 // float64
            case 4 => s"s${rnd.nextInt(999)}" // non-numeric
            case 5 => rnd.nextBoolean() // non-numeric
          }
          key -> v
        }
        (ts, payload)
      }
      val bytes = events.flatMap { case (ts, p) => Msgpack.encodeEvent(ts, p) }.toArray
      val decoded = Msgpack.decodeEvents(bytes)
      assert(decoded.length == events.length)
      decoded.zip(events).foreach { case (d, (ts, p)) =>
        assert(d.ts == ts)
        val expected = p.foldLeft(Vector.empty[(String, Option[Double])]) {
          case (acc, (k, v)) =>
            val num: Option[Double] = v match {
              case i: Int => Some(i.toDouble)
              case l: Long => Some(l.toDouble)
              case f: Double => Some(f)
              case _ => None
            }
            acc.indexWhere(_._1 == k) match {
              case -1 => acc :+ (k -> num)
              case idx =>
                // duplicate key: first numeric occurrence wins
                if (acc(idx)._2.isEmpty && num.isDefined) acc.updated(idx, k -> num)
                else acc
            }
        }
        assert(d.payload == expected, s"ts=$ts payload=$p")
      }
    }
  }

  test("malformed tail keeps the parsed prefix") {
    val good = Msgpack.encodeEvent(1L, Seq("a" -> 1))
    val events = Msgpack.decodeEvents(good ++ Array[Byte](0xc1.toByte, 0x00))
    assert(events.length == 1)
  }

  test("end-to-end: msgpack chunks → map payload → math filter (reference hot path)") {
    import spark.implicits._
    val chunk1 =
      Msgpack.encodeEvent(10L * 1000000000L, Seq("Mem.total" -> 4050908, "Mem.used" -> 476)) ++
      Msgpack.encodeEvent(11L * 1000000000L, Seq("Mem.total" -> 4050908, "Mem.used" -> 500))
    val chunk2 =
      Msgpack.encodeEvent(12L * 1000000000L, Seq("Mem.total" -> 100, "note" -> "no used key"))
    val df = Sources.msgpackEvents(Seq(chunk1, chunk2).toDS())
    val op = MathOp("Operation" -> "sub", "Field" -> "Mem.total",
      "Field" -> "Mem.used", "Output_field" -> "Mem.free")
    val out = MathCompiler.applyToMap(df, op, "payload")
      .orderBy("ts").select(col("`Mem.free`")).collect().map(_.getDouble(0)).toSeq
    // missing Mem.used in chunk2 → 0.0 → free = total
    assert(out == Seq(4050432.0, 4050408.0, 100.0))
  }

  test("case-insensitive lookup works over decoded payloads (math.c:150)") {
    import spark.implicits._
    val df = Sources.msgpackEvents(
      Seq(Msgpack.encodeEvent(1L, Seq("Value" -> 5))).toDS())
    val op = MathOp("Operation" -> "sum", "Field" -> "VALUE",
      "Constant" -> "2", "Output_field" -> "o")
    assert(MathCompiler.applyToMap(df, op, "payload")
      .select("o").collect()(0).getDouble(0) == 7.0)
  }
}
