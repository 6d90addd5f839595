package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.vectors

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = VectorSearch.Dim

  /** Synthetic 64-dim corpus: row i = qvec(10 + i%5) + small id-dependent
    * perturbation, so every query has an obvious nearest neighbor. */
  private def corpus(n: Int) = {
    implicit val s = spark
    (0 until n).map { i =>
      val base = VectorSearch.qvec(10 + i % Ann.NumQueries)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        (x + (i / Ann.NumQueries) * 0.01 * ((j % 3) - 1)).toFloat })
    }.toDF("vec_id", "embedding")
  }

  test("bucketOf (driver) matches bucketCol (executor) for the query vectors") {
    vectors.register(spark)
    val vecs = (0 until 8).map(i => (i, VectorSearch.qvec(10 + i).map(_.toFloat)))
    val got = vecs.toDF("i", "v")
      .select(col("i"), Ann.bucketCol(col("v")).as("b"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, v) =>
      got(i) shouldBe Ann.bucketOf(v.map(_.toDouble))
    }
  }

  test("batchKnn: exact corpus copy of each query ranks first with score ~0") {
    vectors.register(spark)
    val embs = corpus(100)
    val queries = Ann.querySet.toDF("query_id", "qv")
    val out = Ann.batchKnn(embs, queries).collect()
    val byQuery = out.groupBy(_.getAs[Int]("query_id"))
    byQuery should have size Ann.NumQueries.toLong
    byQuery.foreach { case (q, rows) =>
      rows.length shouldBe Ann.K
      // row q IS the query vector (i/5 == 0 → zero perturbation)
      rows.head.getAs[Long]("vec_id") shouldBe q.toLong
      rows.head.getAs[Double]("score") should be < 1e-12
      val scores = rows.map(_.getAs[Double]("score")).toSeq
      scores shouldBe scores.sorted
    }
  }

  test("probeBuckets: exact bucket first, Hamming-1 neighbors, all distinct") {
    val b = 0x2a
    val probes = Ann.probeBuckets(b)
    probes.head shouldBe b
    probes.length shouldBe Ann.NumPlanes + 1
    probes.distinct.length shouldBe probes.length
    probes.tail.foreach { p => Integer.bitCount(p ^ b) shouldBe 1 }
  }

  test("lshKnn returns at most k per query, each from the query's bucket") {
    vectors.register(spark)
    val out = Ann.lshKnn(corpus(200))(spark).collect()
    out.groupBy(_.getAs[Int]("query_id")).foreach { case (_, rows) =>
      rows.length should be <= Ann.K
    }
  }

  test("ivfKnn: bounded codebook, k rows per query, self-match first") {
    vectors.register(spark)
    val out = Ann.ivfKnn(corpus(400))(spark).collect()
    out.groupBy(_.getAs[Int]("query_id")).foreach { case (q, rows) =>
      rows.length should be <= Ann.K
      val scores = rows.map(_.getAs[Double]("score")).toSeq
      scores shouldBe scores.sorted
    }
  }
}
