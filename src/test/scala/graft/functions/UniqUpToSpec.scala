package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** uniq_upto: exact below the cap, saturated (n + 1) above it, under
  * any partitioning / merge order; bounds and type contracts. */
class UniqUpToSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(31L + i)))

  private def upto(keys: Seq[Long], n: Int, partitions: Int): Long = {
    uniqupto.register(spark)
    keys.toDF("key").repartition(partitions)
      .agg(uniqupto.uniqUpTo(col("key"), n).as("u"))
      .collect().head.getLong(0)
  }

  test("exact below the cap, n + 1 at and above it, any partitioning") {
    // distinct counts bracketing the cap: 4 < 5 = n, 5 = n, 6 = n + 1, 9 > n
    for (parts <- Seq(1, 3, 7)) {
      upto((1L to 4L) ++ (1L to 4L), 5, parts) shouldBe 4L
      upto((1L to 5L).toSeq, 5, parts) shouldBe 5L
      upto((1L to 6L).toSeq, 5, parts) shouldBe 6L
      upto((1L to 9L).flatMap(k => Seq.fill(3)(k)), 5, parts) shouldBe 6L
    }
  }

  test("randomized streams: always min(true distinct, n + 1) under any partitioning") {
    val gen = Gen.zip(Gen.choose(1, 12),
      Gen.listOfN(80, Gen.chooseNum(0L, 25L)))
    samples(gen, 15).foreach { case (n, keys) =>
      val want = math.min(keys.distinct.size.toLong, n + 1L)
      for (parts <- Seq(1, 4)) {
        upto(keys, n, parts) shouldBe want
      }
    }
  }

  test("grouped aggregation matches least(count distinct, cap) per group") {
    uniqupto.register(spark)
    val rows = (0 until 400).map(i => ((i % 7).toLong, (i % (5 + i % 7 * 9)).toLong))
    val got = rows.toDF("g", "key").repartition(5)
      .groupBy(col("g")).agg(uniqupto.uniqUpTo(col("key"), 10).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> math.min(rs.map(_._2).distinct.size.toLong, 11L) }
    got shouldBe want
  }

  test("null keys are skipped; SQL registry path works") {
    uniqupto.register(spark)
    Seq(Some(1L), None, Some(2L), Some(1L)).toDF("key")
      .createOrReplaceTempView("uu_in")
    spark.sql("SELECT uniq_upto(key, 5) FROM uu_in")
      .collect().head.getLong(0) shouldBe 2L
  }

  test("non-integral key and bad n fail analysis") {
    uniqupto.register(spark)
    Seq("a").toDF("sk").createOrReplaceTempView("uu_str")
    intercept[Exception](
      spark.sql("SELECT uniq_upto(sk, 5) FROM uu_str").collect())
      .getMessage should include("BIGINT")
    Seq(1L).toDF("key").createOrReplaceTempView("uu_k")
    intercept[Exception](
      spark.sql("SELECT uniq_upto(key, 0) FROM uu_k").collect())
      .getMessage should include(">= 1")
    intercept[Exception](
      spark.sql("SELECT uniq_upto(key, 2000000) FROM uu_k").collect())
      .getMessage should include("2^20")
  }
}
