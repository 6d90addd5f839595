package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Space-Saving sketch: exactness without eviction, the published
  * heavy-hitter guarantees WITH eviction (the path the driver gate's
  * capacity ≥ cardinality configuration never exercises), and the
  * distributed merge path. */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic scalacheck sampling, same pattern as
    * OperatorPropertySpec. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private def sketchTop(keys: Seq[Long], capacity: Int, k: Int,
      partitions: Int): Seq[(Long, Long, Long)] = {
    topk.register(spark)
    keys.toDF("key").repartition(partitions)
      .agg(topk.topkSketch(col("key"), capacity, k).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("exact when capacity >= distinct keys, any partitioning") {
    val keys = Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(25)(3L) ++
      Seq.fill(7)(4L) ++ Seq.fill(3)(5L)
    for (parts <- Seq(1, 7)) {
      val got = sketchTop(new scala.util.Random(11).shuffle(keys), 16, 5, parts)
      got shouldBe Seq((1L, 40L, 0L), (2L, 25L, 0L), (3L, 25L, 0L),
        (4L, 7L, 0L), (5L, 3L, 0L))
    }
  }

  test("deterministic tie-break: equal counts order by key ascending") {
    val got = sketchTop(Seq(9L, 9L, 2L, 2L, 7L, 7L), 8, 3, 2)
    got.map(_._1) shouldBe Seq(2L, 7L, 9L)
  }

  test("heavy-hitter guarantee under eviction (capacity < distinct)") {
    // zipf-ish: key i has ~N/i occurrences; 200 distinct, capacity 64
    val keys = (1 to 200).flatMap(i => Seq.fill(2000 / i)(i.toLong))
    val n = keys.size
    val capacity = 64
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 5)) {
      val got = sketchTop(new scala.util.Random(11).shuffle(keys), capacity, capacity, parts)
      val gotMap = got.map(t => t._1 -> (t._2, t._3)).toMap
      // a merge of p summaries is a valid capacity-summary of the
      // whole stream, so the error bound is p * n_p / capacity ≈
      // n/capacity per partial; use the summed bound
      val bound = n.toLong / capacity * parts
      truth.foreach { case (key, c) =>
        if (c > bound)
          withClue(s"heavy key $key (true $c, bound $bound) missing: ") {
            gotMap.contains(key) shouldBe true
          }
      }
      got.foreach { case (key, cnt, err) =>
        val c = truth(key)
        withClue(s"key $key true=$c cnt=$cnt err=$err: ") {
          cnt should be >= c
          cnt - c should be <= bound
          cnt - err should be <= c
        }
      }
    }
  }

  test("randomized streams never violate the count bounds") {
    val gen = Gen.listOfN(300, Gen.chooseNum(0L, 30L))
    samples(gen, 10).foreach { keys =>
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = sketchTop(keys, 8, 8, 3)
      got.foreach { case (key, cnt, err) =>
        val c = truth.getOrElse(key, 0L)
        cnt should be >= c
        cnt - err should be <= c
      }
    }
  }

  test("SQL registry path works") {
    topk.register(spark)
    Seq(1L, 1L, 2L).toDF("key").createOrReplaceTempView("tks_in")
    val rows = spark.sql(
      "SELECT explode(topk_sketch(key, 4, 2)) AS e FROM tks_in")
      .select("e.item", "e.cnt").as[(Long, Long)].collect().toSeq
    rows shouldBe Seq((1L, 2L), (2L, 1L))
  }

  test("integral keys widen; DOUBLE and STRING keys fail analysis") {
    topk.register(spark)
    Seq(1, 1, 2).toDF("ik").createOrReplaceTempView("tks_int")
    spark.sql("SELECT explode(topk_sketch(ik, 4, 1)) AS e FROM tks_int")
      .select("e.item", "e.cnt").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 2L))
    // a non-integral key must FAIL, not silently truncate (double) or
    // null-skip every row (string)
    Seq(1.5).toDF("dk").createOrReplaceTempView("tks_dbl")
    val e1 = intercept[Exception](
      spark.sql("SELECT topk_sketch(dk, 4, 1) FROM tks_dbl").collect())
    e1.getMessage should include("BIGINT")
    Seq("a").toDF("sk").createOrReplaceTempView("tks_str")
    val e2 = intercept[Exception](
      spark.sql("SELECT topk_sketch(sk, 4, 1) FROM tks_str").collect())
    e2.getMessage should include("BIGINT")
  }

  test("capacity and k below 1 fail analysis") {
    topk.register(spark)
    Seq(1L).toDF("key").createOrReplaceTempView("tks_k")
    intercept[Exception](
      spark.sql("SELECT topk_sketch(key, 0, 1) FROM tks_k").collect())
      .getMessage should include("capacity")
    intercept[Exception](
      spark.sql("SELECT topk_sketch(key, 4, 0) FROM tks_k").collect())
      .getMessage should include("k must be >= 1")
  }

  test("null keys are skipped, not counted") {
    topk.register(spark)
    val got = Seq(Some(1L), None, Some(1L), None)
      .toDF("key")
      .agg(topk.topkSketch(col("key"), 4, 4).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.cnt")).as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 2L))
  }

  // ------------------------------------------------- weighted variant

  private def weightedTop(rows: Seq[(Long, Long)], capacity: Int, k: Int,
      partitions: Int): Seq[(Long, Long, Long)] = {
    topk.register(spark)
    rows.toDF("key", "w").repartition(partitions)
      .agg(topk.topkWeighted(col("key"), col("w"), capacity, k).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.w"), col("e.err"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("weighted: exact summed weights when capacity >= distinct keys, any partitioning") {
    val rows = Seq((1L, 10L), (2L, 3L), (1L, 5L), (3L, 20L), (2L, 4L))
    for (parts <- Seq(1, 4)) {
      weightedTop(rows, 8, 3, parts) shouldBe
        Seq((3L, 20L, 0L), (1L, 15L, 0L), (2L, 7L, 0L))
    }
  }

  test("weighted update is exactly the unit-expanded stream (eviction path included)") {
    // adjacency-expanded unit stream: update(k, w) is defined as w unit
    // updates collapsed into one step, so on ONE partition (no merge
    // reordering) the two sketches must be bit-identical even while
    // evicting (capacity 4 << 12 distinct keys)
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(1L, 9L)))
    samples(gen, 15).foreach { rows =>
      val expanded = rows.flatMap { case (k, w) => Seq.fill(w.toInt)(k) }
      weightedTop(rows, 4, 4, 1) shouldBe sketchTop(expanded, 4, 4, 1)
    }
  }

  test("weighted randomized streams never violate the bounds with n = total weight") {
    val gen = Gen.listOfN(120, Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(1L, 50L)))
    samples(gen, 10).foreach { rows =>
      val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      weightedTop(rows, 8, 8, 3).foreach { case (key, w, err) =>
        val c = truth.getOrElse(key, 0L)
        w should be >= c
        w - err should be <= c
      }
    }
  }

  test("weighted: null and non-positive weights are skipped; null keys skipped") {
    val got = Seq((Some(1L), Some(5L)), (Some(1L), None), (None, Some(9L)),
      (Some(2L), Some(0L)), (Some(2L), Some(-3L)), (Some(2L), Some(4L)))
      .toDF("key", "w")
      .agg(topk.topkWeighted(col("key"), col("w"), 8, 8).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.w")).as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 5L), (2L, 4L))
  }

  test("weighted: non-integral weight or key fails analysis; SQL registry path works") {
    topk.register(spark)
    Seq((1L, 2L), (1L, 3L)).toDF("key", "w").createOrReplaceTempView("tkw_in")
    spark.sql(
      "SELECT explode(topk_weighted_sketch(key, w, 4, 2)) AS e FROM tkw_in")
      .select("e.item", "e.w").as[(Long, Long)].collect().toSeq shouldBe
      Seq((1L, 5L))
    Seq((1L, 1.5)).toDF("key", "dw").createOrReplaceTempView("tkw_dbl")
    intercept[Exception](
      spark.sql("SELECT topk_weighted_sketch(key, dw, 4, 1) FROM tkw_dbl")
        .collect()).getMessage should include("BIGINT")
    Seq(("a", 1L)).toDF("sk", "w").createOrReplaceTempView("tkw_str")
    intercept[Exception](
      spark.sql("SELECT topk_weighted_sketch(sk, w, 4, 1) FROM tkw_str")
        .collect()).getMessage should include("BIGINT")
  }
}
