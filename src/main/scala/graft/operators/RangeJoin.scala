package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Banded range join — the batch analog of s4's stream-stream
  * time-range join: pair every left row with the right rows of the
  * same key whose timestamp lies within ± `band` of the left's.
  *
  * The naive plan (equi-join on the key + time-range filter) degrades
  * to per-key-quadratic work the moment keys are hot. The banded form
  * keeps the fan-out CONSTANT: both sides bucket their timestamp by
  * the band width, the LEFT side explodes to its bucket ± 1 (any
  * in-band partner is within one bucket), the join runs on
  * (key, bucket) — a plain equi-join Catalyst shuffles once — and the
  * exact |Δt| ≤ band predicate prunes the ≤ 3× candidates. Cost:
  * 3× left fan-out, one shuffle, candidates ∝ band occupancy — never
  * n² per key. (ClickHouse users express this same shape with
  * toStartOfInterval buckets; DuckDB/kdb call the operator a range
  * join.)
  */
object RangeJoin {

  /** Inner banded pairs: left.* plus `rightPayload`, one row per
    * (left row, in-band right row). `band` is inclusive, in seconds. */
  def bandedPairs(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String], bandSec: Long): DataFrame = {
    val bandUs = bandSec * 1000000L
    // floor, not cast-truncation: truncation rounds toward zero, which
    // misbuckets negative (pre-1970) timestamps by one
    def bkt(us: org.apache.spark.sql.Column) =
      floor(us / bandUs).cast("long")
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bkt", explode(array(
        bkt(col("__lus")) - 1, bkt(col("__lus")), bkt(col("__lus")) + 1)))
    val r = right.select(
      col(key).as("__rkey"),
      unix_micros(col(rightTs)).as("__rus"),
      bkt(unix_micros(col(rightTs))).as("__rbkt"),
      struct(rightPayload.map(col): _*).as("__pay"))
    l.join(r, col(key) === col("__rkey") && col("__bkt") === col("__rbkt"))
      .filter(abs(col("__rus") - col("__lus")) <= bandUs)
      .select(left.columns.map(col) ++
        rightPayload.map(c => col(s"__pay.$c").as(c)): _*)
  }

  /** q30: incident correlation — for every ERROR event, how many
    * purchases the same user made within ±30 minutes (errors with
    * none kept at 0 via the left re-join). The banded pairs aggregate
    * per error; both shuffles are on user-keyed rows. */
  def q30Query(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value").as("pvalue"))
    val pairs = bandedPairs(errors, purchases, key = "user_id",
      leftTs = "ts", rightTs = "pts",
      rightPayload = Seq("pts", "pvalue"), bandSec = 1800L)
    val counts = pairs.groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_nearby"),
        round(sum(col("pvalue")), 4).as("sum_value"))
      .withColumnRenamed("event_id", "pair_event_id")
    errors
      .join(counts, col("event_id") === col("pair_event_id"), "left")
      .select(col("user_id"), col("event_id"),
        coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    "q30_range_join" ->
      """WITH e AS (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'error'),
        |p AS (SELECT user_id, ts AS pts, value AS pvalue FROM events
        |      WHERE event_type = 'purchase')
        |SELECT e.user_id, e.event_id,
        |       count(p.pts) AS n_nearby,
        |       coalesce(round(sum(p.pvalue), 4), 0.0) AS sum_value
        |FROM e LEFT JOIN p
        |  ON e.user_id = p.user_id
        | AND abs(epoch_us(p.pts) - epoch_us(e.ts)) <= 1800000000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
