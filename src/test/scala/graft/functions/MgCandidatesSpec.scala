package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Misra-Gries candidate summary: the PODS'12 completeness bound
  * (every key with true weight > W/(capacity+1) survives ANY merge
  * order) is the single load-bearing guarantee behind the q32/q49/s5
  * fixed-capacity gates — hammer it with local merge trees and the
  * real distributed path, on skewed and adversarial streams. */
class MgCandidatesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(41L + i)))

  private def candidates(rows: Seq[(Long, Long)], capacity: Int,
      partitions: Int): Set[Long] = {
    heavyhitters.register(spark)
    rows.toDF("key", "w").repartition(partitions)
      .agg(heavyhitters.mgCandidates(col("key"), col("w"), capacity).as("c"))
      .select(explode(col("c")).as("k"))
      .as[Long].collect().toSet
  }

  /** Local harness: split the stream into random chunks, summarize
    * each, merge in a random order (including nested trees via fold
    * of shuffled partials) — the exact nondeterminism Spark's partial
    * aggregation exhibits. */
  private def mergedLocal(rows: Seq[(Long, Long)], capacity: Int,
      chunks: Int, seed: Int): MgSummary = {
    val rnd = new scala.util.Random(seed)
    val parts = rnd.shuffle(rows).grouped(
      math.max(1, rows.size / chunks)).toSeq
    val summaries = parts.map { p =>
      val s = new MgSummary(capacity)
      p.foreach { case (k, w) => s.update(k, w) }
      s
    }
    rnd.shuffle(summaries).reduce { (a, b) => a.merge(b); a }
  }

  test("completeness bound holds under random merge trees (property)") {
    val streamGen = for {
      nKeys <- Gen.choose(5, 400)
      skew <- Gen.oneOf(1.0, 1.5, 2.0) // zipf exponent
      reps <- Gen.choose(1, 40)
    } yield (1 to nKeys).flatMap { i =>
      val c = math.max(1, (reps * nKeys / math.pow(i, skew)).toInt)
      Seq.fill(c)((i.toLong, 1L))
    }
    samples(streamGen, 25).zipWithIndex.foreach { case (rows, i) =>
      val capacity = 1 + (i * 13) % 64
      val w = rows.map(_._2).sum
      val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val s = mergedLocal(rows, capacity, chunks = 1 + i % 9, seed = i)
      import scala.jdk.CollectionConverters._
      val keys = s.counts.keySet().asScala.map(_.longValue()).toSet
      s.counts.size should be <= 2 * capacity
      truth.foreach { case (k, c) =>
        if (c * (capacity + 1) > w) {
          withClue(s"key $k cnt $c W $w cap $capacity: ") {
            keys should contain(k)
          }
        }
      }
      // MG counts never overestimate, and underestimate by ≤ W/(cap+1)
      s.counts.entrySet().asScala.foreach { e =>
        val t = truth(e.getKey)
        e.getValue()(0) should be <= t
        (t - e.getValue()(0)).toDouble should be <= w.toDouble / (capacity + 1)
      }
    }
  }

  test("weighted completeness on the distributed path (unique tail + hot head)") {
    // the q49 shape: 50 hot keys with big weights over a unique tail
    val head = (0L until 50L).flatMap(k => Seq.fill(40)((k, 25L)))
    val tail = (1000L until 9000L).map(k => (k, 1L))
    val rows = head ++ tail
    val w = rows.map(_._2).sum
    val capacity = 128
    for (parts <- Seq(1, 7, 32)) {
      val got = candidates(rows, capacity, parts)
      (0L until 50L).foreach { k =>
        if (1000L * (capacity + 1) > w) got should contain(k)
      }
      got.size should be <= 2 * capacity
    }
  }

  test("null keys/weights and zero weights are skipped; NEGATIVE weight fails loudly") {
    heavyhitters.register(spark)
    val got = spark.sql(
      """SELECT mg_candidates(k, w, 8) AS c FROM VALUES
        |  (CAST(NULL AS BIGINT), 5L), (1L, CAST(NULL AS BIGINT)),
        |  (2L, 0L), (4L, 2L) AS t(k, w)""".stripMargin)
      .select(explode(col("c"))).as[Long].collect().toSet
    got shouldBe Set(4L)
    // a negative weight voids the W-relative completeness bound — the
    // summary must reject it, not silently skip (the consumer's
    // total = sum(w) would disagree with the mass the summary saw)
    val e = intercept[Exception] {
      spark.sql("SELECT mg_candidates(k, w, 8) FROM VALUES (3L, -7L) AS t(k, w)")
        .collect()
    }
    e.getMessage should include("must be >= 0")
  }

  test("exact regime: below capacity every key is a candidate") {
    val rows = (1L to 20L).map(k => (k, k))
    candidates(rows, 64, 4) shouldBe (1L to 20L).toSet
  }
}
