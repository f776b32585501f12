package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** ScalaCheck properties for the pure (Spark-free) config layer —
 *  the executable spec of configure() (math.c:37-132). */
class MathOpPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("parseConstant ≡ strtod-prefix + trunc-toward-zero model") {
    val genNum = for {
      d <- Gen.chooseNum(-1e6, 1e6)
      suffix <- Gen.oneOf("", "abc", " x", "e")
    } yield (d, s"$d$suffix")
    check(Prop.forAll(genNum) { case (d, s) =>
      MathOp.parseConstant(s) == d.toInt
    })
  }

  test("operation parsing: any string with a valid 3-char prefix parses, case-blind") {
    val id: String => String = identity
    val up: String => String = _.toUpperCase
    val genOp = for {
      op <- Gen.oneOf("sum", "sub", "mul", "div")
      tail <- Gen.alphaNumStr.map(_.take(8))
      cased <- Gen.oneOf(id, up)
    } yield (op, cased(op + tail))
    check(Prop.forAll(genOp) { case (op, s) =>
      Operation.parse(s).contains(Operation.all.find(_.name == op).get)
    })
  }

  test("operands preserve config order and arity for arbitrary interleavings") {
    val genProps = Gen.listOfN(6, Gen.oneOf(
      Gen.alphaStr.map(f => "Field" -> ("f" + f.take(5))),
      Gen.chooseNum(1, 99).map(c => "Constant" -> c.toString)))
    check(Prop.forAll(genProps) { ops =>
      val props = Seq("Operation" -> "sum", "Output_field" -> "o") ++ ops
      MathOp.fromProperties(props) match {
        case Right(m) =>
          m.operands.length == ops.length &&
            m.operands.zip(ops).forall {
              case (FieldRef(n), ("Field", v)) => n == v
              case (Const(c), ("Constant", v)) => c == v.toInt
              case _ => false
            }
        case Left(e) =>
          // only legal failure: fewer than 2 operands
          ops.length < 2 && e.message.contains("at least 2 operands")
      }
    })
  }

  test("referenceEval: missing fields behave as literal zeros") {
    val genVals = Gen.listOfN(3, Gen.chooseNum(-100.0, 100.0))
    val genOp = Gen.oneOf("sum", "sub", "mul", "div")
    check(Prop.forAll(genVals, genOp) { (vs, opName) =>
      val op = MathOp("Operation" -> opName, "Field" -> "a",
        "Field" -> "missing", "Field" -> "b", "Output_field" -> "o")
      val resolve: String => Double =
        Map("a" -> vs(0), "b" -> vs(1)).withDefaultValue(0.0)
      val folded = op.referenceEval(resolve)
      val expected = Seq(vs(0), 0.0, vs(1))
        .reduceLeft(op.operation.fold)
      folded == expected || (folded.isNaN && expected.isNaN)
    })
  }
}
