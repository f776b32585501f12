package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck equivalence of the fused [[graft.functions.HashOps
 *  .bigramFreqs]] kernel against a plain-JDK model of the builtin
 *  pipeline it replaces — `split(trim(lower(s)), "\s+")`, drop
 *  empties, `sliding(2)` pairs joined by one space, group + count,
 *  sort by pair. Same whitespace-adversarial generator family as
 *  [[TermCountsPropertySpec]], plus repeated-pair pieces so the
 *  per-doc counts exceed 1. */
class BigramFreqsPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private def model(s: String): Seq[(String, Long)] = {
    val lowered = UTF8String.fromString(s).toLowerCase.toString
    val trimmed = {
      var from = 0; var to = lowered.length
      while (from < to && lowered.charAt(from) == ' ') from += 1
      while (to > from && lowered.charAt(to - 1) == ' ') to -= 1
      lowered.substring(from, to)
    }
    val toks = trimmed.split("\\s+", -1).filter(_.nonEmpty).toSeq
    toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      .toSeq.sortBy { case (k, _) => UTF8String.fromString(k) }
  }

  private def kernel(s: String): Seq[(String, Long)] = {
    val out = graft.functions.HashOps.bigramFreqs(UTF8String.fromString(s))
    (0 until out.numElements()).map { i =>
      val row = out.getStruct(i, 2)
      (row.getUTF8String(0).toString, row.getLong(1))
    }
  }

  test("bigramFreqs ≡ split/sliding(2) model on whitespace-adversarial strings") {
    val words = Seq("big", "hash", "join", "z1")
    val piece = Gen.frequency(
      6 -> Gen.oneOf(words),
      3 -> Gen.oneOf("JOIN", "Hash", "BiG", "big hash", "big hash big hash"),
      2 -> Gen.oneOf("été", "你好", "Über"),
      5 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "", "\f"))
    val genStr = for {
      n <- Gen.chooseNum(0, 12)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString(" ")
    check(Prop.forAll(genStr) { s => kernel(s) == model(s) })
  }

  test("bigramFreqs edge shapes: <2 tokens, repeats, boundary whitespace") {
    for (s <- Seq("", " ", "one", " one ", "a b", "a  b", "\ta b\n",
        "a b a b a", "A B a b", "x\u00A0y" /* NBSP is NOT \s */)) {
      assert(kernel(s) == model(s), s"input='${s.replace("\n", "\\n")}'")
    }
  }
}
