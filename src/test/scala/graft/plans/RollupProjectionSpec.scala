package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PROJECTION rewrite must be invisible to results, fire only on
  * the covered grain+aggregates, and fall back to the raw scan the
  * moment the rollup is stale — correctness never depends on it. */
class RollupProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def writeShard(dir: String, ids: Range, month: Int, mode: String): Unit =
    ids.map { i =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-$month%02d-${1 + i % 27}%02d 0${i % 9}:0${i % 6}:07.$i%06d")
      (i.toLong, ts, (i % 31).toLong,
        Seq("view", "click", "purchase")(i % 3), i * 1.37 + 0.005)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode(mode).parquet(s"$dir/events.parquet")

  /** The natural covered aggregate — what a dashboard would write. */
  private def covered(dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))

  private def collectReport(df: DataFrame) =
    df.orderBy(col("day"), col("event_type")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))

  /** Driver-side truth from the raw rows — independent of ANY Spark
    * aggregate path, so it validates both the rewritten and raw plans. */
  private def brute(dir: String) =
    spark.read.parquet(s"$dir/events.parquet")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(3), r.getDouble(4)))
      .groupBy(t => (t._2.toLocalDateTime.toLocalDate.toString, t._3))
      .map { case ((day, tpe), rows) =>
        (day, tpe, rows.size.toLong,
          rows.map(r => math.round(r._4 * 100)).sum)
      }.toSeq.sortBy(t => (t._1, t._2)).toArray

  test("fresh rollup: the covered aggregate is rewritten onto it and results are identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proj-").toString
    writeShard(dir, 0 until 400, 1, "overwrite")
    graft.operators.Rollup.ensureRollup(spark, dir)
    val q = covered(dir)
    val opt = q.queryExecution.optimizedPlan.toString
    val phys = q.queryExecution.executedPlan.toString
    withClue(phys) { phys should include("graft-rollup") }
    phys should not include "events.parquet"
    opt should not include "events.parquet"
    collectReport(q) shouldBe brute(dir)
  }

  test("stale rollup (corpus grew, no re-ensure): silent fallback to the raw scan, fresh rows included") {
    val dir = java.nio.file.Files.createTempDirectory("graft-projst-").toString
    writeShard(dir, 0 until 300, 1, "overwrite")
    graft.operators.Rollup.ensureRollup(spark, dir)
    // grow the corpus WITHOUT refreshing the rollup
    writeShard(dir, 1000 until 1200, 2, "append")
    val q = covered(dir)
    q.queryExecution.executedPlan.toString should include("events.parquet")
    collectReport(q) shouldBe brute(dir) // new rows present — raw path
    // re-ensure restores the rewrite, now over the appended rollup
    graft.operators.Rollup.ensureRollup(spark, dir)
    val q2 = covered(dir)
    q2.queryExecution.executedPlan.toString should not include "events.parquet"
    collectReport(q2) shouldBe brute(dir)
  }

  test("non-covered shapes are untouched: extra aggregate, filter, different grain") {
    val dir = java.nio.file.Files.createTempDirectory("graft-projnc-").toString
    writeShard(dir, 0 until 200, 1, "overwrite")
    graft.operators.Rollup.ensureRollup(spark, dir)
    val extraAgg = graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"),
        max(col("user_id")).as("mx"))
    extraAgg.queryExecution.executedPlan.toString should include("events.parquet")
    val filtered = graft.Tables.events(spark, dir)
      .filter(col("event_type") =!= "view")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
    filtered.queryExecution.executedPlan.toString should include("events.parquet")
    val wrongGrain = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
    wrongGrain.queryExecution.executedPlan.toString should include("events.parquet")
    // and a double-sum at the right grain must NOT be served from the
    // integer-cents rollup
    val doubleSum = graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    doubleSum.queryExecution.executedPlan.toString should include("events.parquet")
  }
}
