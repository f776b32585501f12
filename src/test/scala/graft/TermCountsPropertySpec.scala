package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck equivalence of the fused [[graft.functions.HashOps
 *  .termCounts]] kernel against a plain-JDK model of the builtin
 *  pipeline it replaces — `split(trim(lower(s)), "\s+")` with
 *  limit -1 (boundary empties kept), count non-empty tokens and
 *  exact matches. The kernel byte-walks UTF-8 directly, so the
 *  generator mixes every `\s` class member, multi-byte unicode,
 *  and the vocabulary terms themselves. */
class TermCountsPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  /** The builtin model: Spark `trim` strips 0x20 only; Java regex
   *  `\s+` splits; `split` with limit -1 keeps boundary empties. */
  private def model(s: String, terms: Seq[String]): Seq[Long] = {
    val lowered = UTF8String.fromString(s).toLowerCase.toString
    val trimmed = {
      var from = 0; var to = lowered.length
      while (from < to && lowered.charAt(from) == ' ') from += 1
      while (to > from && lowered.charAt(to - 1) == ' ') to -= 1
      lowered.substring(from, to)
    }
    val toks = trimmed.split("\\s+", -1).filter(_.nonEmpty)
    (toks.length.toLong +: terms.map(t => toks.count(_ == t).toLong)).toSeq
  }

  private def kernel(s: String, terms: Seq[String]): Seq[Long] = {
    val out = graft.functions.HashOps.termCounts(
      UTF8String.fromString(s), terms.map(_.getBytes("UTF-8")).toArray)
    (0 until out.numElements()).map(out.getLong)
  }

  test("termCounts ≡ split/trim/lower model on whitespace-adversarial strings") {
    val terms = Seq("big", "hash", "join", "z1")
    val piece = Gen.frequency(
      6 -> Gen.oneOf(terms),
      3 -> Gen.oneOf("JOIN", "Hash", "BiG", "tab", "hashx", "jo in"),
      2 -> Gen.oneOf("été", "你好", "Über"),
      5 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "", "\f"))
    val genStr = for {
      n <- Gen.chooseNum(0, 12)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString
    check(Prop.forAll(genStr) { s =>
      kernel(s, terms) == model(s, terms)
    })
  }

  test("termCounts edge shapes: empty, all-whitespace, exact-term, no trailing match") {
    val terms = Seq("join", "hash")
    for (s <- Seq("", " ", "   ", "\t", "join", " join ", "join\thash\njoin",
        "JOIN", "joinx", "xjoin", "joïn", "hash hash hash")) {
      assert(kernel(s, terms) == model(s, terms), s"input=${s.replace("\n", "\\n")}")
    }
  }
}
