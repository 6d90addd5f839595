package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** c11: sign-collapsed upsert serving — the ClickHouse
  * CollapsingMergeTree pattern (the other half of the mutation-free
  * upsert family next to [[Replacing]]'s ReplacingMergeTree: reference
  * deployments use Collapsing when REPORTS must aggregate over current
  * state without ever grouping per key). Every state change writes TWO
  * rows: `+1` carrying the new state and `-1` carrying a byte-identical
  * copy of the state it supersedes. Because the cancel row duplicates
  * the OLD row's values exactly, every non-current version nets to zero
  * under summation, so any LINEAR statistic of current state — users
  * per state, exact-cents totals — is a plain `sum(sign * x)` over the
  * raw signed rows: no per-key merge, no window, no shuffle keyed on
  * the (at 100 TB, billions-deep) entity id at serve time. That
  * key-free serve plan is exactly why ClickHouse ships Collapsing next
  * to Replacing, and it is pinned in PlanAuditSpec.
  *
  * Scale shape:
  *  - Ingest: one window pass over the BATCH in (user, ts, event_id)
  *    order emits (+1 self, -1 predecessor) pairs — cost ∝ batch.
  *    Cross-part cancels (the batch's first event per key superseding a
  *    key's state from an older part) reconstruct each affected key's
  *    current row as the argmax over the existing parts' `+1` rows,
  *    bucket-pruned and semi-joined to ONLY the batch's keys — cost
  *    ∝ batch × parts, never corpus.
  *  - Serve: `sum(sign)` / `sum(sign·cents)` grouped by the few-valued
  *    report dimension. Map-side partials collapse every input split to
  *    ≤ |dimension| rows; exchange volume is constant in corpus size.
  *  - Contract (same as ClickHouse): per key, appends must be
  *    time-forward — a cancel must be emitted by the event that
  *    supersedes it. The build path derives both rows mechanically, so
  *    the contract holds whenever shards append in event order; a
  *    rewritten/mutated corpus full-rebuilds via the manifest check in
  *    [[graft.sources.LocalIndex.ensureIncremental]].
  *
  * The gate reports per current event_type: net user count, exact
  * integer-cents sum, and the sum of current-row epoch millis (three
  * linear stats). The DuckDB oracle replays latest-per-key from RAW
  * events with a `row_number() = 1` window — proving sign-collapse
  * lossless vs the full-scan definition. */
object Collapsing {

  /** Hash-bucket count for the part layout (`b=` dirs) — same contract
    * as [[Replacing.NumBuckets]]. */
  val NumBuckets = 32

  private def keyed(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      pmod(col("user_id"), lit(NumBuckets.toLong)).cast("int").as("b"),
      col("ts"), col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

  /** The signed rows of ONE batch: each event emits `+1` with its own
    * state and `-1` with its in-batch predecessor's state (the batch's
    * first event per key has no in-batch predecessor — its cancel, if
    * the key lives in an older part, comes from [[crossPartCancels]]).
    * One window pass, one exchange on the key. */
  def signedRows(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val st = keyed(events)
      .withColumn("p_ts", lag(col("ts"), 1).over(w))
      .withColumn("p_eid", lag(col("event_id"), 1).over(w))
      .withColumn("p_type", lag(col("event_type"), 1).over(w))
      .withColumn("p_cents", lag(col("cents"), 1).over(w))
    val plus = st.select(col("b"), col("user_id"), col("ts"),
      col("event_id"), col("event_type"), col("cents"), lit(1).as("sign"))
    val minus = st.filter(col("p_eid").isNotNull)
      .select(col("b"), col("user_id"), col("p_ts").as("ts"),
        col("p_eid").as("event_id"), col("p_type").as("event_type"),
        col("p_cents").as("cents"), lit(-1).as("sign"))
    plus.unionByName(minus)
  }

  /** `-1` rows cancelling the persisted current state of exactly the
    * batch's keys. Current state per key is the (ts, event_id) argmax
    * over the existing parts' `+1` rows (every superseded `+1` has a
    * newer `+1` beside its cancel, so the latest `+1` IS current —
    * the [[Replacing.finalState]] struct-max, restricted by a semi-join
    * to the batch's (b, user_id) set so the scan bucket-prunes). */
  def crossPartCancels(parts: DataFrame, batchKeyed: DataFrame): DataFrame =
    parts.filter(col("sign") === 1)
      .join(batchKeyed.select(col("b"), col("user_id")).distinct(),
        Seq("b", "user_id"), "left_semi")
      .groupBy(col("b"), col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("cents"))).as("v"))
      .select(col("b"), col("user_id"),
        col("v.ts").as("ts"), col("v.event_id").as("event_id"),
        col("v.event_type").as("event_type"), col("v.cents").as("cents"),
        lit(-1).as("sign"))

  /** Write-once / append-on-growth signed-part set over
    * `$d/events.parquet`: append-only source growth writes JUST the new
    * shard's signed rows plus the cross-part cancels of its keys (old
    * part files byte-untouched); mutated or removed shards
    * full-rebuild. */
  def ensureCollapsing(s: SparkSession, d: String): String =
    graft.sources.LocalIndex.ensureIncremental(
      "collapsing", d, "", Seq(s"$d/events.parquet"), s"v1-b$NumBuckets") { out =>
      signedRows(Tables.events(s, d))
        .write.mode("overwrite").partitionBy("b").parquet(out)
    } { (newFiles, out) =>
      val shard = Tables.normalizeEventTs(s.read.parquet(newFiles: _*))
      val cancels = crossPartCancels(s.read.parquet(out), keyed(shard))
      signedRows(shard).unionByName(cancels)
        .write.mode("append").partitionBy("b").parquet(out)
    }

  /** Gate: the sign-collapsed report over the persisted parts — per
    * current event_type, net users / exact-cents sum / current-row
    * epoch-millis sum, all as `sum(sign * x)` with NO per-key work.
    * Types nobody currently occupies net to zero rows everywhere and
    * are dropped, matching the oracle's latest-per-key grouping. */
  def c11Query(s: SparkSession, d: String): DataFrame =
    Tables.loadLayout(s, ensureCollapsing(s, d))
      .groupBy(col("event_type"))
      .agg(
        sum(col("sign")).cast("long").as("net_users"),
        sum(col("sign") * col("cents")).as("net_cents"),
        sum(col("sign") * unix_millis(col("ts"))).as("net_ms"))
      .filter(col("net_users") =!= 0L)
      .orderBy(col("event_type"))

  /** DuckDB twin: latest-per-key straight off raw events (the
    * [[Replacing]] oracle shape), then the same three stats computed
    * from the surviving rows — count, cents sum, epoch-millis sum. */
  val oracles: Map[String, String] = Map(
    "c11_collapsing_upsert" ->
      """WITH latest AS (
        |  SELECT user_id, ts, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, count(*) AS net_users,
        |  CAST(sum(cents) AS BIGINT) AS net_cents,
        |  CAST(sum(epoch_us(ts) // 1000) AS BIGINT) AS net_ms
        |FROM latest WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
