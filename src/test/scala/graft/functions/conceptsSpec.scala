package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class conceptsSpec extends SparkSpec {
  import spark.implicits._

  private val va = Seq(1.0, 2.0, 3.0, 4.0)
  private val vb = Seq(0.5, -1.0, 0.25, 2.0)
  private val env: Map[String, Seq[Double]] = Map("a" -> va, "b" -> vb)

  test("mult binds tighter than add") {
    concepts.parse("a + 2 * b", env) shouldBe va.zip(vb).map { case (x, y) => x + 2 * y }
  }

  test("parens override precedence") {
    concepts.parse("(a + b) * 2", env) shouldBe va.zip(vb).map { case (x, y) => (x + y) * 2 }
  }

  test("scalar on either side; division; unary minus; nesting") {
    concepts.parse("2 * a", env) shouldBe va.map(2 * _)
    concepts.parse("a * 2", env) shouldBe va.map(_ * 2)
    concepts.parse("a / 4", env) shouldBe va.map(_ / 4)
    concepts.parse("6 / a", env) shouldBe va.map(6 / _)
    concepts.parse("-a", env) shouldBe va.map(0.0 - _)
    concepts.parse("a - (b - a)", env) shouldBe
      va.zip(vb).map { case (x, y) => x - (y - x) }
    concepts.parse("((a))", env) shouldBe va
    concepts.parse("0.5 * (a + b) - 2 * a / 4", env) shouldBe
      va.zip(vb).map { case (x, y) => 0.5 * (x + y) - 2 * x / 4 }
  }

  test("vector * vector is pointwise (the reference's arrayMap((x,y)->x*y))") {
    concepts.parse("a * b", env) shouldBe va.zip(vb).map { case (x, y) => x * y }
  }

  test("quoted phrases resolve like the reference's QuotedString operands") {
    val phraseEnv: Map[String, Seq[Double]] =
      env ++ Map("fluffy dog" -> vb, "it's" -> va)
    concepts.parse("'fluffy dog' + a", phraseEnv) shouldBe
      vb.zip(va).map { case (x, y) => x + y }
    concepts.parse("2 * 'fluffy dog'", phraseEnv) shouldBe vb.map(2 * _)
    concepts.parse("'it\\'s'", phraseEnv) shouldBe va
    an[IllegalArgumentException] should be thrownBy
      concepts.parse("'unterminated", phraseEnv)
    an[IllegalArgumentException] should be thrownBy
      concepts.parse("'no such concept'", phraseEnv)
  }

  test("errors: unknown concept, trailing garbage, scalar result, bad dim") {
    an[IllegalArgumentException] should be thrownBy concepts.parse("nope", env)
    an[IllegalArgumentException] should be thrownBy concepts.parse("a + ", env)
    an[IllegalArgumentException] should be thrownBy concepts.parse("a b", env)
    an[IllegalArgumentException] should be thrownBy concepts.parse("1 + 2", env)
    an[IllegalArgumentException] should be thrownBy
      concepts.parse("a + c", env + ("c" -> Seq(1.0)))
  }

  test("property: rendered random trees re-parse to their direct evaluation") {
    sealed trait T
    case class Leaf(name: String) extends T
    case class Scalar(x: Double) extends T
    case class Node(op: Char, l: T, r: T) extends T

    def gen(depth: Int): Gen[T] =
      if (depth == 0) Gen.oneOf(Gen.oneOf("a", "b").map(Leaf),
        Gen.choose(1, 9).map(n => Scalar(n / 2.0)))
      else Gen.frequency(
        2 -> gen(0),
        3 -> (for {
          op <- Gen.oneOf('+', '-', '*')
          l <- gen(depth - 1); r <- gen(depth - 1)
        } yield Node(op, l, r)))

    def render(t: T): String = t match {
      case Leaf(n) => n
      case Scalar(x) => x.toString
      case Node(op, l, r) => s"(${render(l)} $op ${render(r)})"
    }
    def eval(t: T): concepts.Term = t match {
      case Leaf(n) => concepts.Vec(env(n))
      case Scalar(x) => concepts.Num(x)
      case Node(op, l, r) => (eval(l), eval(r)) match {
        case (x, y) =>
          val f: (Double, Double) => Double = op match {
            case '+' => _ + _; case '-' => _ - _; case '*' => _ * _
          }
          (x, y) match {
            case (concepts.Num(p), concepts.Num(q)) => concepts.Num(f(p, q))
            case (concepts.Num(p), concepts.Vec(v)) => concepts.Vec(v.map(f(p, _)))
            case (concepts.Vec(v), concepts.Num(q)) => concepts.Vec(v.map(f(_, q)))
            case (concepts.Vec(u), concepts.Vec(v)) =>
              concepts.Vec(u.zip(v).map { case (p, q) => f(p, q) })
          }
      }
    }

    val trees = Gen.listOfN(60, gen(3)).sample.get
    trees.foreach { t =>
      eval(t) match {
        case concepts.Vec(expect) =>
          concepts.parse(render(t), env) shouldBe expect
        case concepts.Num(_) =>
          an[IllegalArgumentException] should be thrownBy
            concepts.parse(render(t), env)
      }
    }
  }

  test("column forms match driver algebra") {
    val df = Seq((va, vb)).toDF("a", "b")
    val got = df.select(
      concepts.addCol(col("a"), col("b")).as("add"),
      concepts.subCol(col("a"), col("b")).as("sub"),
      concepts.mulCol(col("a"), col("b")).as("mul"),
      concepts.divCol(col("a"), col("b")).as("div"),
      concepts.scaleCol(0.5, col("a")).as("scale"),
      concepts.shiftCol(col("a"), 2.0).as("shift")).head()
    got.getSeq[Double](0) shouldBe va.zip(vb).map { case (x, y) => x + y }
    got.getSeq[Double](1) shouldBe va.zip(vb).map { case (x, y) => x - y }
    got.getSeq[Double](2) shouldBe va.zip(vb).map { case (x, y) => x * y }
    got.getSeq[Double](3) shouldBe va.zip(vb).map { case (x, y) => x / y }
    got.getSeq[Double](4) shouldBe va.map(_ * 0.5)
    got.getSeq[Double](5) shouldBe va.map(_ + 2.0)
  }
}
