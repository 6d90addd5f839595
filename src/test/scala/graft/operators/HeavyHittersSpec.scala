package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The public two-pass guaranteed-heavy-hitters operator (the q32/q49
  * engine, library-facing). The composed corpus path is property-
  * tested in OperatorPropertySpec; here: the API contract — global
  * grouping, custom thresholds, output bound, and the
  * thresholdFactor ≤ capacity precondition. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("global group: exactly the keys above total/threshold, exact weights, ranked") {
    // 100 of key 1, 40 of key 2, 60 unique tail keys: total 200
    val rows = Seq.fill(100)(1L) ++ Seq.fill(40)(2L) ++ (100L until 160L)
    val df = rows.toDF("k").repartition(8)
    // threshold total/4 = 50: only key 1 qualifies
    val got = HeavyHitters.guaranteed(df, col("k"), lit(1L),
      capacity = 16, thresholdFactor = 4).collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))) shouldBe
      Array((1L, 100L, 200L, 1))
    // threshold total/8 = 25: keys 1 and 2, ranked by weight desc
    val got8 = HeavyHitters.guaranteed(df, col("k"), lit(1L),
      capacity = 16, thresholdFactor = 8).collect()
    got8.map(r => (r.getLong(0), r.getInt(3))) shouldBe
      Array((1L, 1), (2L, 2))
  }

  test("grouped + weighted: per-group totals and thresholds") {
    val df = Seq(("a", 1L, 30L), ("a", 1L, 30L), ("a", 2L, 5L),
      ("a", 3L, 35L), ("b", 1L, 1L), ("b", 9L, 99L))
      .toDF("g", "k", "w")
    val got = HeavyHitters.guaranteed(df, col("k"), col("w"),
      groups = Seq("g"), capacity = 8, thresholdFactor = 2,
      keyName = "k", weightName = "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    // group a: total 100, threshold 50 — key 1 (60) only;
    // group b: total 100 — key 9 (99) only
    got shouldBe Array(("a", 1L, 60L, 100L, 1), ("b", 9L, 99L, 100L, 1))
  }

  test("many groups: shuffle candidate join matches broadcast exactly") {
    // 5000 groups × ~20 rows each — the regime where the broadcast
    // candidate table (groups × 2·capacity rows) stops being small.
    // Each group: one heavy key (12 copies) + 8 unique tail keys;
    // threshold total/4 = 5 → exactly the heavy key per group.
    val rows = (0 until 5000).flatMap { g =>
      Seq.fill(12)((g, 7L)) ++ (0 until 8).map(i => (g, 100L + i))
    }
    val df = rows.toDF("g", "k").repartition(16)
    def run(strategy: String) = HeavyHitters.guaranteed(df, col("k"),
      lit(1L), groups = Seq("g"), capacity = 8, thresholdFactor = 4,
      candidateJoin = strategy)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val bc = run("broadcast")
    bc.length shouldBe 5000
    bc.take(2) shouldBe Array((0, 7L, 12L, 20L, 1), (1, 7L, 12L, 20L, 1))
    run("shuffle") shouldBe bc
    run("auto") shouldBe bc
    // the shuffle plan really avoids the broadcast exchange
    val shufPlan = HeavyHitters.guaranteed(df, col("k"), lit(1L),
      groups = Seq("g"), capacity = 8, thresholdFactor = 4,
      candidateJoin = "shuffle").queryExecution.executedPlan.toString
    shufPlan should include("ShuffledHashJoin")
    shufPlan should not include "BroadcastHashJoin"
  }

  test("unknown candidateJoin strategy is rejected") {
    val df = Seq(1L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.guaranteed(df, col("k"), lit(1L),
        candidateJoin = "sort")
    }
    e.getMessage should include("candidateJoin")
  }

  test("thresholdFactor beyond capacity is rejected (completeness precondition)") {
    val df = Seq(1L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.guaranteed(df, col("k"), lit(1L),
        capacity = 64, thresholdFactor = 128)
    }
    e.getMessage should include("completeness")
  }
}
