package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sampling

/** X89 temperature-flattened mixing + X90 homoglyph skeleton. */
class HomoglyphMixSpec extends SparkTestBase {

  import spark.implicits._

  test("homoglyph skeleton folds confusables, fullwidth, and zero-width") {
    val rows = Seq(
      // Cyrillic а/е/о disguising Latin — same skeleton
      (1L, "a top secret report"),
      (2L, "а tоp sеcrеt rеpоrt"),
      // zero-width padding — same skeleton
      (3L, "a top​ secret﻿ report"),
      // fullwidth — same skeleton
      (4L, "ａ top secret repｏrt"),
      // genuinely different text — different skeleton
      (5L, "a top secret memo"))
      .toDF("id", "text")
    val sk = rows.select(col("id"),
        TextFunctions.homoglyphSkeleton(col("text")).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sk(1L) == "a top secret report")
    assert(sk(2L) == sk(1L), s"cyrillic fold failed: '${sk(2L)}'")
    assert(sk(3L) == sk(1L), s"zero-width strip failed: '${sk(3L)}'")
    assert(sk(4L) == sk(1L), s"fullwidth fold failed: '${sk(4L)}'")
    assert(sk(5L) != sk(1L), "distinct texts must keep distinct skeletons")
    // uppercase confusables fold through the lowercase step too
    val up = rows.sparkSession.range(1)
      .select(TextFunctions.homoglyphSkeleton(lit("АЕОRT")).as("s"))
      .head.getString(0)
    assert(up == "aeort")
  }

  test("r9 widened table: Armenian, Cherokee, Greek, Cyrillic-breadth fixtures fold") {
    def skel(s: String): String = spark.range(1)
      .select(TextFunctions.homoglyphSkeleton(lit(s)).as("s"))
      .head.getString(0)
    // Armenian: յ օ ո spoofing "journal"
    assert(skel("յօurոal") === "journal",
      s"armenian fold: '${skel("յօurոal")}'")
    // Cherokee capitals Ꮋ Ꭼ Ꮮ Ꮲ spoofing "HELP" (lowered by the chain)
    assert(skel("ᎻᎬᏞᏢ") === "help")
    // Greek ρ/χ spoofing "proxy"
    assert(skel("ρroχy") === "proxy")
    // Cyrillic breadth: dze/je/qa + ze→3
    assert(skel("ѕјԛ") === "sjq")
    assert(skel("Зd-print") === "3d-print")
    // table hygiene is require()-checked at load; touching the object
    // here proves the checks passed
    assert(TextFunctions.confusableFrom.length ===
      TextFunctions.confusableTo.length)
  }

  test("mixTemperature equalizes toward sqrt shares with integer-exact rates") {
    // 900 'big' + 100 'small': r=30/10, S=40, N=1000 →
    // bps(big) = 10^4·30·1000 / (900·40) = 8333 (0.8333 epochs)
    // bps(small) = 10^4·10·1000 / (100·40) = 25000 (2.5 epochs)
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.mixTemperature(df, "source", "doc_id", "t|")
      .groupBy("source", "doc_id").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1)
    // per-doc copy counts are floor/ceil of the epoch factor
    assert(byDoc("big").forall(_._3 == 1L),
      "big-source docs keep 0 or 1 copies (0-copy rows are filtered)")
    assert(byDoc("small").forall(t => t._3 == 2L || t._3 == 3L))
    // totals converge to the basis-point rates (hash-exact, so the
    // tolerance is only the hash's sampling error at n=900/100)
    val bigTotal = byDoc("big").map(_._3).sum.toDouble
    val smallTotal = byDoc("small").map(_._3).sum.toDouble
    assert(math.abs(bigTotal / 900.0 - 0.8333) < 0.05, s"big=$bigTotal")
    assert(math.abs(smallTotal / 100.0 - 2.5) < 0.25, s"small=$smallTotal")
    // deterministic: a rerun is row-identical
    val again = Sampling.mixTemperature(df, "source", "doc_id", "t|")
      .groupBy("source", "doc_id").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
    // a different salt draws a different subset at the same rates
    val other = Sampling.mixTemperature(df, "source", "doc_id", "u|")
      .groupBy("source", "doc_id").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(other.toSet != out.toSet)
  }

  test("rate arithmetic is exact at trillion-row magnitudes (no Long wrap)") {
    // the naive in-plan 10^4·r·N div (n·S) wraps Long here: N ≈ 1.1e12,
    // r(1e12) = 1e6 → 10^4·1e6·1.1e12 ≈ 1.1e22 ≫ 2^63. BigInt keeps it
    // exact; hand-check: S = 1e6 + 316227 + 1000
    val counts = Seq("web" -> 1000000000000L, "books" -> 100000000000L,
      "wiki" -> 1000000L)
    val bps = Sampling.bpsForSources(counts)
    val s = BigInt(1000000) + BigInt(316227) + BigInt(1000)
    val n = counts.map(c => BigInt(c._2)).sum
    def expect(src: String, cnt: Long, r: Long) =
      assert(bps(src) == (BigInt(10000) * r * n / (BigInt(cnt) * s)).toLong,
        s"$src: ${bps(src)}")
    expect("web", 1000000000000L, 1000000L)
    expect("books", 100000000000L, 316227L)
    expect("wiki", 1000000L, 1000L)
    assert(bps.values.forall(v => v > 0L),
      s"no source may silently drop to zero/negative copies: $bps")
    // the tiny source is massively up-weighted, the giant one damped
    assert(bps("wiki") > 1000000L && bps("web") < 10000L, s"$bps")
  }

  test("powFp: cross-engine golden values up to 10^12, monotone, accurate") {
    // golden values cross-checked against the DuckDB recursive-CTE
    // twin (mixTemperatureRationalSql) during development: 71 random
    // magnitudes up to 10^12 matched bit-for-bit; these pin the
    // shared algorithm so either side drifting breaks a spec, not
    // just the oracle hash
    val golden = Seq( // (n, ⌊n^0.7·2^30⌋-quantized via the spec'd chain)
      1L -> 1073741824L,
      2L -> 1744298738L,
      3L -> 2316779747L,
      17L -> 7802146750L,
      1000L -> 135176086726L,
      999983L -> 17017458558848L,
      123456789L -> 495404963501962L,
      549755826233L -> 177426611403713344L,
      999999999999L -> 269711751668233664L,
      1000000000000L -> 269711751668233664L)
    for ((n, want) <- golden)
      assert(Sampling.powFp(n, 7, 10) == want, s"powFp($n)")
    // accuracy: within 1e-8 relative of the true power (the pin is
    // the algorithm, but it must still BE n^0.7 for the schedule)
    for (n <- Seq(5L, 1234L, 987654L, 123456789012L)) {
      val got = Sampling.powFp(n, 7, 10).toDouble / (1L << 30).toDouble
      val truth = math.pow(n.toDouble, 0.7)
      assert(math.abs(got - truth) / truth < 1e-8, s"n=$n got=$got want=$truth")
    }
    // monotone in n (a sampling schedule must not invert sizes)
    val seq = Seq(1L, 2L, 3L, 10L, 100L, 10000L, 123456L, 99999999L,
      1000000000000L).map(Sampling.powFp(_, 7, 10))
    assert(seq == seq.sorted)
    // T=1 is identity at the fixed-point scale (within quantization)
    assert(math.abs(Sampling.powFp(1000000L, 1, 1).toDouble
      / (1L << 30).toDouble - 1000000.0) < 1e-2)
  }

  test("general-T rates are exact at trillion-row magnitudes and T=1/2 agrees") {
    val counts = Seq("web" -> 1000000000000L, "books" -> 100000000000L,
      "wiki" -> 1000000L)
    val bps = Sampling.bpsForSourcesRational(counts, 7, 10)
    // exact-chain re-derivation
    val r = counts.map { case (s, n) => s -> Sampling.powFp(n, 7, 10) }.toMap
    val tn = counts.map(c => BigInt(c._2)).sum
    val ts = counts.map(c => BigInt(r(c._1))).sum
    for ((s, n) <- counts)
      assert(bps(s) == (BigInt(10000) * r(s) * tn / (BigInt(n) * ts)).toLong)
    assert(bps.values.forall(_ > 0L), s"$bps")
    // T=0.7 flattens LESS than T=0.5: the giant source keeps more
    // share, the tiny one is boosted less
    val bpsHalf = Sampling.bpsForSources(counts)
    assert(bps("web") > bpsHalf("web"), s"t07=$bps t05=$bpsHalf")
    assert(bps("wiki") < bpsHalf("wiki"), s"t07=$bps t05=$bpsHalf")
    // and p/q = 1/2 through the SAME general chain stays within one
    // quantum of the closed-form isqrt rates everywhere
    val bpsHalfFp = Sampling.bpsForSourcesRational(counts, 1, 2)
    for ((s, _) <- counts)
      assert(math.abs(bpsHalfFp(s) - bpsHalf(s)).toDouble
        <= math.max(2.0, bpsHalf(s) * 1e-5), s"$s: $bpsHalfFp vs $bpsHalf")
  }

  test("mixTemperature fails LOUDLY on a null source instead of dropping rows") {
    val df = Seq((1L, "a"), (2L, null), (3L, "a"))
      .toDF("doc_id", "source")
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixTemperature(df, "source", "doc_id", "t|").collect()
    }
    assert(ex.getMessage.contains("NULL"), ex.getMessage)
  }
}
