package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** ScalaCheck properties for the X53 PII patterns, run through the
 *  SAME java.util.regex engine Spark's RegExpReplace compiles to
 *  (RedactSpec ties the Column builder to these patterns; q72 ties
 *  them to RE2). */
class RedactPropertySpec extends AnyFunSuite {

  private def redact(s: String): String = s
    .replaceAll(TextFunctions.emailPat, "<EMAIL>")
    .replaceAll(TextFunctions.ipv4Pat, "<IP>")
    .replaceAll(TextFunctions.phonePat, "<PHONE>")

  private def check(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val cleanText = // no digits, no @, no + → nothing can match
    Gen.listOfN(8, word).map(_.mkString(" "))

  test("property: PII-free text is untouched") {
    check(Prop.forAll(cleanText)(t => redact(t) == t))
  }

  private val email = for {
    l <- word; d <- word; tld <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
  } yield s"$l@$d.$tld"
  private val ip = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
  private val phone = for {
    n <- Gen.choose(7, 15); ds <- Gen.listOfN(n, Gen.numChar)
  } yield "+" + ds.mkString

  test("property: injected PII is always masked, context always survives") {
    val gen = for {
      pre <- cleanText; post <- cleanText
      (pii, mask) <- Gen.oneOf(
        email.map(_ -> "<EMAIL>"), ip.map(_ -> "<IP>"),
        phone.map(_ -> "<PHONE>"))
    } yield (pre, pii, mask, post)
    check(Prop.forAll(gen) { case (pre, pii, mask, post) =>
      redact(s"$pre $pii $post") == s"$pre $mask $post"
    })
  }

  test("property: every PII occurrence is masked, not just the first") {
    val gen = for { e1 <- email; e2 <- email; i <- ip; p <- phone }
      yield s"$e1 x $i y $e2 z $p"
    check(Prop.forAll(gen) { s =>
      val out = redact(s)
      !out.contains("@") && !out.contains("+") &&
        out.count(_ == '<') == 4
    })
  }
}
