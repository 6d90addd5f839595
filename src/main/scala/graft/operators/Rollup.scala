package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** c9: pre-aggregated rollup serving — the ClickHouse
  * AggregatingMergeTree / materialized-view pattern (the server-side
  * capability behind every ClickHouse dashboard the reference's kind of
  * deployment fronts): a write-once, day-partitioned rollup of
  * MERGEABLE partial states, and report queries that are answered from
  * the rollup alone — the raw events are never rescanned at serve time.
  *
  * The rollup grain is (day, event_type); each row carries
  *  - `n`           exact row count (BIGINT, associative),
  *  - `sum_cents`   exact integer-cents revenue (`round(value*100)` —
  *                  integer addition is order-independent, so partials
  *                  merge bit-exactly on any engine),
  *  - `users_sk`    an HLL sketch of `user_id` (mergeable via
  *                  `hll_union_agg`, the q31 pattern).
  *
  * Like ClickHouse parts, the rollup does NOT promise one row per
  * grain: an incremental append lands the NEW shard's partials as
  * additional rows and the serve query merges across parts
  * (sum / sum / hll_union) — which is exactly what makes appends
  * correct under late-arriving data without rewriting history.
  * [[serveReport]] therefore never assumes grain uniqueness
  * (`countDistinct(day)`, not `count`).
  *
  * Scale shape: the build is ONE scan of events + one shuffle down to
  * ≤ days × types rows; an append aggregates ONLY the new shard files.
  * Serve reads a few-KB partition-pruned rollup scan — at 100 TB this
  * is the difference between a dashboard query costing a full corpus
  * scan and costing a metadata-sized read. The serve plan is pinned
  * scan-only (no events scan, partition filters present) in
  * PlanAuditSpec; the DuckDB gate recomputes the report from RAW
  * events, proving the rollup path lossless for the exact columns and
  * within the 5% sketch contract for the distinct-users estimate.
  */
object Rollup {

  /** Serve-report date range (half-open), inside the corpus' Jan 2024
    * span so partition pruning is visible in the plan. */
  val ServeFrom = "2024-01-08"
  val ServeUntil = "2024-01-22"

  /** Relative HLL error accepted by the distinct-users contract —
    * same 5% budget as q31/q9 (default lgConfigK ≈ 1.6% typical). */
  val UsersTol = 0.05

  /** Normalize raw event rows to the rollup input grain. Cents are
    * `round(value*100)` cast to BIGINT — round-then-cast, the q40
    * lesson: a bare cast truncates in Spark but rounds in DuckDB. */
  private def normalized(events: DataFrame): DataFrame =
    events.select(
      to_date(col("ts")).as("day"),
      col("event_type"),
      col("user_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

  /** One rollup part from a batch of events: partial states per
    * (day, event_type). Map-side partial aggregation collapses each
    * input partition to ≤ days × types rows before the only exchange. */
  def rollupPart(events: DataFrame): DataFrame =
    normalized(events)
      .groupBy(col("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("sum_cents"),
        hll_sketch_agg(col("user_id")).as("users_sk"))

  /** Write-once / append-on-growth rollup over `$d/events.parquet`,
    * maintained through [[graft.sources.LocalIndex.ensureIncremental]]:
    * append-only source growth aggregates JUST the new shard files into
    * additional part rows (existing rollup files byte-untouched);
    * mutated or removed shards full-rebuild. */
  def ensureRollup(s: SparkSession, d: String): String =
    graft.sources.LocalIndex.ensureIncremental(
      "rollup", d, "", Seq(s"$d/events.parquet"), "v1") { out =>
      rollupPart(Tables.events(s, d))
        .write.mode("overwrite").partitionBy("day").parquet(out)
    } { (newFiles, out) =>
      rollupPart(Tables.normalizeEventTs(s.read.parquet(newFiles: _*)))
        .write.mode("append").partitionBy("day").parquet(out)
    }

  /** Background merge (ClickHouse `OPTIMIZE`): fold the accreted parts
    * back to one row per (day, event_type) with the SAME mergeable ops
    * the serve path uses — sum/sum/hll_union — so the served report is
    * bit-identical before and after (HLL union is register-wise max:
    * associative, order-free). Cost ∝ rollup size (days × types ×
    * parts), never the corpus. */
  def compactParts(s: SparkSession, rollupDir: String): Unit = {
    val merged = s.read.parquet(rollupDir)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        hll_union_agg(col("users_sk")).as("users_sk"))
      .select(col("day"), col("event_type"), col("n"),
        col("sum_cents"), col("users_sk"))
    graft.streaming.Compaction.rewrite(rollupDir) { tmp =>
      merged.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
    }
  }

  /** The report, answered from the rollup ONLY: per event_type over
    * [[ServeFrom]], [[ServeUntil]]) — active days, row count, exact
    * cents revenue — plus the corpus-wide distinct-users estimate from
    * the MERGED per-part sketches. Merges across parts, so it is
    * correct whether the rollup has one row per grain or many. */
  def serveReport(rollup: DataFrame): DataFrame = {
    val in = rollup.filter(
      col("day") >= to_date(lit(ServeFrom)) &&
      col("day") < to_date(lit(ServeUntil)))
    val per = in.groupBy(col("event_type"))
      .agg(
        countDistinct(col("day")).as("days"),
        sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"))
    val users = in.agg(
      hll_sketch_estimate(hll_union_agg(col("users_sk"))).as("users_est"))
    per.crossJoin(broadcast(users)).orderBy(col("event_type"))
  }

  /** Gate query: [[serveReport]] from the persisted rollup, with the
    * sketch estimate verified against the exact distinct-user count
    * from raw events. The raw scan exists ONLY for this verification
    * column (the d8/q31 gate pattern) — the served report itself never
    * touches events, which is what PlanAuditSpec pins. */
  def c9Query(s: SparkSession, d: String): DataFrame =
    servedWithContract(s, d, ensureRollup(s, d))

  /** [[serveReport]] over an arbitrary rollup dir plus the exact
    * distinct-users verification — shared by the c9 gate and the
    * streaming-maintained rollup gate (s7), which must produce the
    * IDENTICAL report from parts written one micro-batch at a time. */
  def servedWithContract(s: SparkSession, d: String, rollupDir: String): DataFrame = {
    val served = serveReport(Tables.loadLayout(s, rollupDir))
    val exact = Tables.events(s, d)
      .filter(col("ts") >= to_timestamp(lit(s"$ServeFrom 00:00:00")) &&
        col("ts") < to_timestamp(lit(s"$ServeUntil 00:00:00")))
      .agg(count_distinct(col("user_id")).as("users_exact"))
    served.crossJoin(broadcast(exact))
      .select(
        col("event_type"), col("days"), col("n"), col("sum_cents"),
        col("users_exact"),
        (abs(col("users_est") - col("users_exact")) / col("users_exact")
          <= UsersTol).as("users_ok"))
      .orderBy(col("event_type"))
  }

  /** c13: the PROJECTION-rewrite gate. The query is the NATURAL daily
    * aggregate over raw events — no rollup in sight at the API level;
    * [[graft.plans.RollupProjection]] (installed by GraftExtensions)
    * rewrites it onto the freshly-ensured rollup, so the optimized
    * plan reads the few-KB rollup and never scans events (pinned in
    * PlanAuditSpec). The DuckDB oracle IS the raw aggregate — the
    * whole point is that the rewrite is invisible to results. */
  def c13Query(s: SparkSession, d: String): DataFrame = {
    ensureRollup(s, d)
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .orderBy(col("day"), col("event_type"))
  }

  /** DuckDB twin: the report recomputed from RAW events — proving the
    * rollup-served path lossless. `sum(BIGINT)` is HUGEINT in DuckDB →
    * cast back (the q28 lesson); cents replay Spark's round-then-cast. */
  val oracles: Map[String, String] = Map(
    "c13_projection_rewrite" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "c9_rollup_serve" ->
      s"""WITH e AS (
         |  SELECT CAST(ts AS DATE) AS day, event_type, user_id,
         |         CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE CAST(ts AS DATE) >= DATE '$ServeFrom'
         |    AND CAST(ts AS DATE) < DATE '$ServeUntil'),
         |x AS (SELECT count(DISTINCT user_id) AS users_exact FROM e)
         |SELECT event_type, count(DISTINCT day) AS days, count(*) AS n,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  (SELECT users_exact FROM x) AS users_exact,
         |  TRUE AS users_ok
         |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin)
}
