package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.vectors

/** a4 RP-tree ANN: driver/executor descent agreement, median-balanced
  * training, probe-set shape, scan↔index equivalence with a
  * planning-time partition-prune pin, staleness, and recall vs the
  * exact knn. */
class RpTreeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = {
    implicit val s = spark
    (0 until n).map { i =>
      val base = VectorSearch.qvec(10 + i % Ann.NumQueries)
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        (x + (i / Ann.NumQueries) * 0.01 * ((j % 3) - 1)).toFloat })
    }.toDF("vec_id", "embedding")
  }

  test("driver descent matches the staged column assignment") {
    vectors.register(spark)
    val embs = corpus(300)
    val thr = RpTree.train(embs)
    val got = RpTree.assignLeaf(embs, thr)
      .select(col("vec_id"), col("leaf")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
    vecs.foreach { case (id, v) =>
      got(id) shouldBe RpTree.leafOf(thr, v)
    }
  }

  test("median training balances leaves within rounding") {
    vectors.register(spark)
    val embs = corpus(320)
    val thr = RpTree.train(embs)
    val sizes = RpTree.assignLeaf(embs, thr)
      .groupBy("leaf").count().collect().map(_.getLong(1))
    // exact medians halve each node up to duplicate projections; the
    // synthetic corpus has distinct projections so leaves stay within
    // 2x of perfectly balanced
    val ideal = 320.0 / (1 << RpTree.Depth)
    sizes.max.toDouble should be <= ideal * 2
    sizes.min.toDouble should be >= ideal / 2
  }

  test("probeLeaves: own leaf first, distinct, bounded by MaxFlips+1") {
    vectors.register(spark)
    val thr = RpTree.train(corpus(300))
    Ann.querySet.foreach { case (_, v) =>
      val probes = RpTree.probeLeaves(thr, v)
      probes.head shouldBe RpTree.leafOf(thr, v)
      probes.distinct shouldBe probes
      probes.size should be <= RpTree.MaxFlips + 1
      all(probes) should (be >= (1 << RpTree.Depth) and
        be < (1 << (RpTree.Depth + 1)))
    }
  }

  test("indexedQuery matches a4Query and prunes leaf partitions at planning time") {
    vectors.register(spark)
    val embs = corpus(400)
    val dir = java.nio.file.Files.createTempDirectory("graft-rptspec-").toString
    embs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val indexed = RpTree.indexedQuery(spark, dir)
    val plan = indexed.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan.split("PartitionFilters").exists(_.contains("leaf")) shouldBe true

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    rows(indexed) shouldBe rows(RpTree.a4Query(spark, dir))

    // corpus regeneration invalidates the index (median tree is
    // rebuild-only: thresholds move with the data)
    val shifted = embs.withColumn("vec_id", col("vec_id") + lit(100000L))
    shifted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val after = RpTree.indexedQuery(spark, dir).collect().map(_.getAs[Long]("vec_id"))
    all(after) should be >= 100000L
  }

  test("treeFor retrains when the corpus is regenerated in place (fingerprint-keyed cache)") {
    vectors.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-rptkey-").toString
    corpus(200).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val first = RpTree.treeFor(spark, dir)
    // same bytes → cache hit, identical map instance values
    RpTree.treeFor(spark, dir) shouldBe first
    // regenerate IN PLACE with different geometry → must retrain
    corpus(200).withColumn("embedding",
        org.apache.spark.sql.functions.transform(col("embedding"), x => x * lit(2.0f)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val second = RpTree.treeFor(spark, dir)
    second should not equal first
  }

  test("recall: every query's exact nearest neighbor survives the probe") {
    vectors.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-rptrec-").toString
    corpus(500).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // corpus rows are perturbed copies of the query vectors themselves,
    // so the true top-1 is an exact-copy row; spill probing must keep it
    val exact = Ann.a1Query(spark, dir).collect()
      .groupBy(_.getAs[Int]("query_id"))
      .map { case (q, rs) => q -> rs.minBy(r =>
        (r.getAs[Double]("score"), r.getAs[Long]("vec_id"))).getAs[Long]("vec_id") }
    val approx = RpTree.a4Query(spark, dir).collect()
      .groupBy(_.getAs[Int]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    exact.foreach { case (q, top1) =>
      approx(q) should contain(top1)
    }
  }
}
