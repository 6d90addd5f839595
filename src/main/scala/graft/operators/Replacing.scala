package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** c10: keyed upsert serving — the ClickHouse ReplacingMergeTree +
  * `FINAL` pattern (the mutation-free upsert every ClickHouse
  * entity-state table relies on; reference-style deployments use it
  * for "current row per id" serving, the server-side complement of the
  * append-only ingest in process.py:95-120): each ingest batch writes a
  * COMPACTED part (one row per key — the batch's latest version), parts
  * accumulate append-only, and `FINAL` semantics — the newest version
  * per key across all parts — are applied at read time. History is
  * never rewritten; an "update" is just a later version in a newer
  * part, exactly how ReplacingMergeTree replaces rows at merge time.
  *
  * Version order is the lexicographic struct max on (ts, event_id) —
  * the q35 argmax shape: `max(struct(ts, event_id, payload...))` is a
  * single partial-aggregable pass, ties on ts break deterministically
  * on the unique event_id (Spark's `max_by` is explicitly
  * nondeterministic on ties).
  *
  * Scale shape:
  *  - A part compaction is ONE map-side-partial aggregation of its own
  *    batch — cost ∝ batch, never corpus.
  *  - Parts are hash-bucketed into `b=` partition dirs (user_id mod
  *    [[NumBuckets]]), so a point lookup ("current state of user X")
  *    partition-prunes to one bucket dir per part, and the FINAL merge
  *    for any key involves ≤ parts rows. At warehouse scale the bucket
  *    count rises with the key space; the layout contract is the same.
  *  - The FINAL read costs ∝ keys × parts compacted rows — at 100 TB
  *    that is the few-GB entity-state table, not the corpus of raw
  *    events. Periodic compaction (fold all parts into one — rerun of
  *    the build path) is the standard LSM trade, same as c7/d8.
  *
  * The gate reports the FINAL state grouped by latest event_type
  * (users, exact integer-cents sum of latest values, latest-timestamp
  * max as epoch millis); the DuckDB oracle recomputes it from RAW
  * events with a per-key `row_number() = 1` window — proving the
  * part-compacted, merge-on-read path lossless vs the full-scan
  * definition. */
object Replacing {

  /** Hash-bucket count for the part layout (`b=` partition dirs).
    * local[32]-sized here; at warehouse scale this tracks the key
    * cardinality, the contract is unchanged. */
  val NumBuckets = 32

  /** Normalize raw events to the versioned-upsert grain: key, bucket,
    * version (ts, event_id), payload (event_type + exact integer
    * cents — round-then-cast, the q40 lesson). */
  private def keyed(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      pmod(col("user_id"), lit(NumBuckets.toLong)).cast("int").as("b"),
      col("ts"), col("event_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))

  /** One compacted part from a batch of events: the batch-local latest
    * version per key. Map-side partials collapse each input partition
    * to ≤ its distinct keys before the only exchange. */
  def compactPart(events: DataFrame): DataFrame =
    keyed(events)
      .groupBy(col("b"), col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("cents"))).as("v"))
      .select(col("b"), col("user_id"),
        col("v.ts").as("ts"), col("v.event_id").as("event_id"),
        col("v.event_type").as("event_type"), col("v.cents").as("cents"))

  /** Write-once / append-on-growth part set over `$d/events.parquet`
    * via [[graft.sources.LocalIndex.ensureIncremental]]: append-only
    * source growth compacts JUST the new shard files into a new part
    * inside the existing `b=` dirs (old part files byte-untouched);
    * mutated or removed shards full-rebuild. */
  def ensureReplacing(s: SparkSession, d: String): String =
    graft.sources.LocalIndex.ensureIncremental(
      "replacing", d, "", Seq(s"$d/events.parquet"), s"v1-b$NumBuckets") { out =>
      compactPart(Tables.events(s, d))
        .write.mode("overwrite").partitionBy("b").parquet(out)
    } { (newFiles, out) =>
      compactPart(Tables.normalizeEventTs(s.read.parquet(newFiles: _*)))
        .write.mode("append").partitionBy("b").parquet(out)
    }

  /** Background merge (the LSM compaction the scaladoc trade points
    * at): fold all parts to ONE — the FINAL struct-max applied early.
    * Associative/commutative over versions, so FINAL over the
    * compacted part ≡ FINAL over the originals; every served result is
    * unchanged. Cost ∝ keys × parts, never raw events. */
  def compactParts(s: SparkSession, partsDir: String): Unit = {
    val merged = finalState(s.read.parquet(partsDir))
      .withColumn("b", pmod(col("user_id"), lit(NumBuckets.toLong)).cast("int"))
      .select(col("b"), col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("cents"))
    graft.streaming.Compaction.rewrite(partsDir) { tmp =>
      merged.repartition(col("b"))
        .write.mode("overwrite").partitionBy("b").parquet(tmp)
    }
  }

  /** `FINAL`: the newest version per key across all parts — the same
    * struct-max applied to the compacted part rows (≤ keys × parts
    * input, partial-aggregable; never touches raw events). */
  def finalState(parts: DataFrame): DataFrame =
    parts.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("cents"))).as("v"))
      .select(col("user_id"),
        col("v.ts").as("ts"), col("v.event_id").as("event_id"),
        col("v.event_type").as("event_type"), col("v.cents").as("cents"))

  /** Point lookup: the current row of ONE key — filters on the bucket
    * FIRST so the scan partition-prunes to `b = key mod NumBuckets`
    * (asserted in ReplacingSpec), then FINAL-merges the ≤ parts
    * candidate rows. */
  def lookup(s: SparkSession, partsDir: String, userId: Long): DataFrame =
    finalState(
      s.read.parquet(partsDir)
        .filter(col("b") === lit((userId % NumBuckets).toInt) &&
          col("user_id") === lit(userId)))

  /** The served report over a parts DataFrame: FINAL, grouped per
    * latest event_type. Shared by the c10 gate and the s8 streaming
    * maintainer (whose parts accrete per micro-batch). */
  def finalReport(parts: DataFrame): DataFrame =
    finalState(parts)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("users"),
        sum(col("cents")).as("sum_cents"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .orderBy(col("event_type"))

  /** Gate: FINAL over the persisted parts, reported per latest
    * event_type. Serves from the compacted parts ONLY (no raw events
    * scan — pinned in PlanAuditSpec); the oracle recomputes from raw. */
  def c10Query(s: SparkSession, d: String): DataFrame =
    finalReport(Tables.loadLayout(s, ensureReplacing(s, d)))

  /** DuckDB twin: latest-per-key straight off raw events via a
    * `row_number() = 1` window (ts DESC, event_id DESC — the struct-max
    * order), then the same report. `sum(BIGINT)` is HUGEINT in DuckDB →
    * cast back (the q28 lesson); millis floor-divide like the q19/q29
    * oracles. */
  val oracles: Map[String, String] = Map(
    "c10_replacing_upsert" ->
      """WITH latest AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, count(*) AS users,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(max(epoch_us(ts) // 1000) AS BIGINT) AS last_ms
        |FROM latest WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
