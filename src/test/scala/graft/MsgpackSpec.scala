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
