package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Unit contracts of the r20 d5 expressions: [[SignBucketProbe]] (the
  * fused sign-bucket + multi-probe map) and [[NearPairExplode]] (the
  * fused in-bucket cosine verify), pinned against driver-side
  * reference math, plus codegen (DataFrame path) == interpreted
  * equality and the SQL registry path with literal arguments. */
class SignBucketProbeSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- sign_bucket_probe

  private def refPacked(v: Seq[Double], planes: Seq[Seq[Double]]): Long = {
    var bkt = 0L
    var bestM = Double.MaxValue
    var bestP = 0
    planes.zipWithIndex.foreach { case (pl, p) =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * pl(i); i += 1 }
      if (s >= 0) bkt |= (1L << p)
      if (math.abs(s) < bestM) { bestM = math.abs(s); bestP = p }
    }
    ((bkt ^ (1L << bestP)) << 32) | bkt
  }

  private def evalOne(v: Seq[Double], planes: Seq[Seq[Double]]): Long =
    SignBucketProbe(BoundReference(0, ArrayType(DoubleType), nullable = true),
      planes.flatten.toArray, planes.length)
      .eval(InternalRow(ArrayData.toArrayData(v.toArray)))
      .asInstanceOf[Long]

  test("interpreted eval matches driver-side reference on random vectors") {
    val rnd = new scala.util.Random(42)
    val planes = Seq.fill(10)(Seq.fill(16)(rnd.nextGaussian()))
    (0 until 200).foreach { _ =>
      val v = Seq.fill(16)(rnd.nextGaussian())
      evalOne(v, planes) shouldBe refPacked(v, planes)
    }
  }

  test("margin ties resolve to the LOWEST plane index") {
    // planes 0 and 1 identical → equal |margin|; strict < keeps p=0
    val planes = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val packed = evalOne(Seq(0.5, 3.0), planes)
    (packed >>> 32) shouldBe ((packed & 0xFFFFFFFFL) ^ 1L)
  }

  test("codegen path (DataFrame) == interpreted, float input, via the registry") {
    vectors.register(spark)
    val rnd = new scala.util.Random(7)
    val planes = Seq.fill(12)(Seq.fill(8)(rnd.nextGaussian()))
    val rows = (0 until 100).map(i => (i.toLong,
      Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("id", "v")
      .select(col("id"),
        vectors.signBucketProbe(col("v"), planes.flatten, planes.length).as("pk"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      got(id) shouldBe refPacked(v.map(_.toDouble), planes)
    }
  }

  test("SQL surface: integer literal plane_count widens (no ClassCastException)") {
    vectors.register(spark)
    Seq((Seq(1.0f, 2.0f))).toDF("v").createOrReplaceTempView("sbp_t")
    val out = spark.sql(
      "SELECT sign_bucket_probe(v, array(1.0D, 0.0D, 0.0D, 1.0D), 2) FROM sbp_t")
      .head().getLong(0)
    (out & 0xFFFFFFFFL) shouldBe 3L // both dots positive
  }

  test("two_level_cell: SQL integer stride literal widens (no ClassCastException)") {
    vectors.register(spark)
    Seq((Seq(1.0f, 0.0f))).toDF("v").createOrReplaceTempView("tlc_t")
    // one coarse centroid at the origin, one fine centroid under it:
    // cell = rank 0 * stride + fid 0 = 0 regardless of stride value
    spark.sql(
      "SELECT two_level_cell(v, array(0.0D, 0.0D), array(0), array(1), " +
        "array(0.0D, 0.0D), 4096) FROM tlc_t").head().getLong(0) shouldBe 0L
  }

  // -------------------------------------------------- near_pair_explode

  test("near_pair_explode matches the join + cosine_distance brute force") {
    vectors.register(spark)
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map(i => (i.toLong,
      Seq.fill(16)(rnd.nextGaussian().toFloat)))
    // plant a few near-dups so survivors exist
    val planted = vecs.take(5).map { case (id, v) =>
      (id + 100, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val all = vecs ++ planted
    val df = all.toDF("vec_id", "embedding")
    val maxD = 0.3
    // brute force: cross pairs, CosineDistance, filter
    val e = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        vectors.cosineDistance(col("a.embedding"), col("b.embedding")).as("score"))
      .filter(col("score") <= maxD)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    e should not be empty
    // one bucket holding everything
    val got = df.groupBy(lit(1))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ds"))
      .select(explode(vectors.nearPairExplode(col("ds"), maxD)).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"), col("p.score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // same pairs AND bit-identical scores (the fold mirrors CosineDistance)
    got shouldBe e
  }

  test("near_pair_explode: empty and singleton buckets yield no pairs") {
    vectors.register(spark)
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    df.groupBy(lit(1))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ds"))
      .select(explode(vectors.nearPairExplode(col("ds"), 1.0)).as("p"))
      .count() shouldBe 0L
  }

  test("near_pair_explode rejects mismatched vector lengths loudly") {
    vectors.register(spark)
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      df.groupBy(lit(1))
        .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("ds"))
        .select(explode(vectors.nearPairExplode(col("ds"), 1.0)).as("p"))
        .count()
    }
    ex.getMessage should include("in one bucket")
  }
}
