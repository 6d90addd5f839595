package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Unit contract of [[NearestCentroid]] — the reference-object argmin
  * that replaced the `least(struct(l2², cid))` literal fold. The fold's
  * observable semantics are pinned here: min dist², ties to min cid,
  * NaN sorts greatest, null in → null out, loud on dim mismatch; plus
  * codegen (DataFrame path) == interpreted (direct eval) equality. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def expr(cids: Seq[Long], cents: Seq[Seq[Double]], dt: DataType) =
    NearestCentroid(BoundReference(0, ArrayType(dt), nullable = true),
      cids.toArray, cents.flatten.toArray)

  private def evalOne(cids: Seq[Long], cents: Seq[Seq[Double]],
                      v: Seq[Double]): Any =
    expr(cids, cents, DoubleType).eval(
      org.apache.spark.sql.catalyst.InternalRow(ArrayData.toArrayData(v.toArray)))

  test("interpreted: min distance wins; distance ties fall to the FIRST centroid (builder sorts by cid → min cid)") {
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    evalOne(Seq(7L, 3L, 5L), cents, Seq(0.9, 0.1)) shouldBe 3L
    // (0.5, 0.5) is equidistant from (1,0) and (0,1): the raw expression
    // keeps the first (Ann.nearestCentroid sorts by cid before building,
    // which makes first-wins == the old fold's min-cid-on-ties)
    evalOne(Seq(7L, 5L, 3L),
      Seq(Seq(9.0, 9.0), Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(0.5, 0.5)) shouldBe 5L
    evalOne(Seq(7L, 3L, 5L),
      Seq(Seq(9.0, 9.0), Seq(1.0, 0.0), Seq(0.0, 1.0)),
      Seq(0.5, 0.5)) shouldBe 3L
  }

  test("interpreted: NaN centroid distances sort greatest; all-NaN keeps the first cid") {
    val nanC = Seq(Double.NaN, 0.0)
    evalOne(Seq(1L, 2L), Seq(nanC, Seq(5.0, 5.0)), Seq(0.0, 0.0)) shouldBe 2L
    evalOne(Seq(4L, 2L), Seq(nanC, nanC), Seq(0.0, 0.0)) shouldBe 4L
  }

  test("interpreted: dimension mismatch fails loudly") {
    val e = intercept[IllegalArgumentException] {
      evalOne(Seq(1L), Seq(Seq(1.0, 2.0)), Seq(1.0, 2.0, 3.0))
    }
    e.getMessage should include("components")
  }

  test("null vector → null expression, -1 after Ann.nearestCentroid's coalesce") {
    val got = expr(Seq(1L), Seq(Seq(0.0)), DoubleType)
      .eval(org.apache.spark.sql.catalyst.InternalRow(null))
    assert(got == null)
  }

  test("codegen (DataFrame) matches interpreted eval on float and double corpora, k past the old fold limit") {
    vectors.register(spark)
    val rnd = new scala.util.Random(77)
    val dim = 16
    val k = 700 // > the k≈625 that tripped the literal fold's Janino limit
    val cents = (0 until k).map(j => (j.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val sorted = cents.sortBy(_._1)
    val vecsF = (0 until 200).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val gotF = vecsF.toDF("id", "v")
      .select(col("id"), vectors.nearestCentroid(col("v"), sorted.map(_._1),
        sorted.flatMap(_._2)).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecsF.foreach { case (id, v) =>
      val exp = evalOne(sorted.map(_._1), sorted.map(_._2), v.map(_.toDouble))
      withClue(s"vec $id: ") { gotF(id) shouldBe exp }
    }
    val vecsD = vecsF.map { case (i, v) => (i, v.map(_.toDouble)) }
    val gotD = vecsD.toDF("id", "v")
      .select(col("id"), vectors.nearestCentroid(col("v"), sorted.map(_._1),
        sorted.flatMap(_._2)).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecsD.foreach { case (id, v) =>
      withClue(s"vec $id: ") { gotD(id) shouldBe evalOne(sorted.map(_._1), sorted.map(_._2), v) }
    }
  }

  test("matches the replaced least(struct(l2², cid)) fold value-for-value") {
    vectors.register(spark)
    val rnd = new scala.util.Random(99)
    val dim = 8
    val cents = (0 until 20).map(j => (j.toLong * 5 + 1, Seq.fill(dim)(rnd.nextGaussian())))
    val vecs = (0 until 100).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
    val oldFold = {
      val cand = cents.map { case (cid, cv) =>
        struct(vectors.l2SquaredDistance(col("v"), typedlit(cv)).as("d"),
          lit(cid).as("cid")) }
      coalesce(least(cand: _*).getField("cid"), lit(-1L))
    }
    val both = df.select(col("id"),
      graft.operators.Ann.nearestCentroid(cents, col("v")).as("nw"),
      oldFold.as("od")).collect()
    both.foreach(r => withClue(s"vec ${r.getLong(0)}: ") {
      r.getLong(1) shouldBe r.getLong(2) })
  }
}
