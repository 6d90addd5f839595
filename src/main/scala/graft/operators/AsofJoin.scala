package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join — the reference engine family's ASOF JOIN (match every
  * left row with the single most recent right row of the same key at
  * or before the left timestamp).
  *
  * Spark has no native asof operator, and the naive form — equi-join
  * on the key plus a time-range filter, then per-left-row argmax — is
  * per-key QUADRATIC (every left row joins every earlier right row
  * before the rank prunes). The scale-correct distributed shape is
  * union + window:
  *
  *   1. tag both sides, union them on a common schema;
  *   2. ONE shuffle on the key, ONE sort by (ts, side, tie);
  *   3. every left row reads the running `last(right payload,
  *      ignoreNulls)` over rows unbounded-preceding..current — O(1)
  *      running state per row, no buffering, no fan-out.
  *
  * Total cost = one exchange + one sort, the same as a groupBy on the
  * key, independent of how many right rows precede each left row.
  *
  * Semantics (pinned, deterministic): rightTs == leftTs MATCHES
  * (at-or-before); equal right timestamps resolve to the greatest
  * `tieBreak` value; left rows with no preceding right row keep NULL
  * payload (left-outer).
  */
object AsofJoin {

  /** @param rightPayload right columns carried onto matched left rows
    *                     (must not clash with left column names)
    * @param tieBreak     right column ordering equal-timestamp rights;
    *                     the greatest value wins */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String], tieBreak: String): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightPayload, tieBreak,
      forward = false)

  /** FORWARD as-of join: match every left row with the single EARLIEST
    * right row of the same key STRICTLY AFTER the left timestamp
    * (Pandas `merge_asof direction='forward'` with exact matches off).
    *
    * Same union+window shape and cost as [[asofJoin]] — one shuffle on
    * the key, one sort — with every sort key flipped DESCENDING, so
    * the match is still a running `last(ignoreNulls)` over the GROWING
    * unbounded-preceding frame (incremental, O(1) state per row). The
    * tempting direct form — `first` over a following frame — is the
    * SHRINKING frame Spark's window exec re-evaluates per row,
    * O(partition²) on a hot key; the time-reversal keeps the plan on
    * the incremental path.
    *
    * Semantics (pinned, deterministic): rightTs == leftTs does NOT
    * match (strictly-after); equal right timestamps resolve to the
    * LEAST `tieBreak` value; left rows with no following right — and
    * null-timestamp left rows, which a `r.ts > l.ts` contract never
    * matches — keep NULL payload (left-outer). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String], tieBreak: String): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightPayload, tieBreak,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String], tieBreak: String,
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // the tie column keeps its NATIVE type: a string cast would order
    // numeric ties lexicographically ("9" > "10") and silently diverge
    // from any numeric-ordered oracle the day two right rows share a
    // timestamp
    val tieType = right.schema(tieBreak).dataType
    // a NULL right timestamp must never match: Spark's ascending sort
    // places NULLs FIRST, which would make a null-ts right row the
    // running "earliest" payload for every left row of its key, while
    // the relational contract (ts <= left ts) never matches NULL.
    // Dropping them here pins SQL semantics. Null LEFT timestamps are
    // kept: they also sort first, see no preceding right, and emit the
    // NULL payload a `v.ts <= p.ts` left-outer oracle produces.
    val r = right.filter(col(rightTs).isNotNull).select(
      col(key).as("__key"),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(tieBreak).as("__tie"),
      struct(rightPayload.map(col): _*).as("__pay"))
    val payType = r.schema("__pay").dataType
    val l = left.select(
      col(key).as("__key"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"),
      struct(leftCols.map(col): _*).as("__row"))
    val rowType = l.schema("__row").dataType
    val u = l.unionByName(r.withColumn("__row", lit(null).cast(rowType)))
    // Backward: rights sort before lefts at equal ts (at-or-before
    // includes equality); equal-ts rights order by tie so `last` =
    // greatest. Forward is the TIME-REVERSAL of the same contract:
    // every key flipped desc walks timestamps from the future back, a
    // left row at equal ts sorts BEFORE the rights (side desc:
    // strictly-after excludes them), equal-ts rights order tie-desc so
    // the running `last` = LEAST tie.
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side").desc, col("__tie").desc)
      else Seq(col("__ts").asc, col("__side").asc, col("__tie").asc)
    val w = Window.partitionBy(col("__key"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__pay"), ignoreNulls = true).over(w)
    // Null-ts lefts: ascending sort puts them FIRST (empty preceding
    // frame → null payload, the contract, for free); descending sort
    // puts them LAST where the frame holds the whole key, so the
    // forward path masks them back to the no-match contract.
    u.withColumn("__match",
        if (forward) when(col("__ts").isNotNull, matched) else matched)
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) ++
        rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Skew-hardened as-of join: identical result contract to
    * [[asofJoin]], but the big sort runs per (key, TIME-CHUNK) instead
    * of per key, so a hot key's entire history never lands in one
    * task — the slowest-task ceiling [[asofJoin]] hits when one user
    * is a bot/shared account at 100×.
    *
    * Two-pass shape (chunk + boundary carry):
    *   1. union + window exactly like [[asofJoin]], but partitioned by
    *      (key, chunk): each left row sees the last right AT OR AFTER
    *      the start of its own chunk;
    *   2. a per-(key, chunk) summary — ONE row per chunk: the chunk's
    *      final right payload — then a running `last` over chunks
    *      strictly before, per key. That carry is what a left row
    *      falls back to when its own chunk held no earlier right.
    * The per-key pass now sorts per-chunk SUMMARIES (bounded by the
    * time range / chunk length), not raw rows; every other exchange is
    * on (key, chunk), which skew-splits a hot key by time.
    *
    * Equivalence with [[asofJoin]] is property-tested on random inputs
    * whose chunk length forces multi-chunk keys and boundary carries.
    *
    * @param chunkSec time-chunk length; pick so one key-chunk of rows
    *                 sorts comfortably in one task (e.g. a day) */
  def asofJoinChunked(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String], tieBreak: String,
                      chunkSec: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val tieType = right.schema(tieBreak).dataType
    val chunkUs = chunkSec * 1000000L
    def chunkOf(c: Column) = floor(unix_micros(c) / chunkUs).cast("long")
    val r = right.filter(col(rightTs).isNotNull).select(
      col(key).as("__key"),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(tieBreak).as("__tie"),
      struct(rightPayload.map(col): _*).as("__pay"),
      chunkOf(col(rightTs)).as("__chunk"))
    val payType = r.schema("__pay").dataType
    val l = left.select(
      col(key).as("__key"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__pay"),
      // sentinel, not null: a null chunk key would silently DROP the
      // null-ts left row at the carry equi-join (null never equals
      // null in a join key); MinValue sorts before every real chunk,
      // so the carry window still yields no preceding right for it
      coalesce(chunkOf(col(leftTs)), lit(Long.MinValue)).as("__chunk"),
      struct(leftCols.map(col): _*).as("__row"))
    val rowType = l.schema("__row").dataType
    val u = l.unionByName(r.withColumn("__row", lit(null).cast(rowType)))
    // pass 1: within-chunk running match (same ordering contract as
    // asofJoin: rights before lefts at equal ts, ties to greatest tie)
    val w = Window.partitionBy(col("__key"), col("__chunk"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = u
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // pass 2: one summary row per (key, chunk) present on EITHER side
    // (a left-only chunk still needs the carry from earlier chunks);
    // the chunk's final right = max (ts, tie) — the same row the
    // window ordering would keep
    val chunkLast = r.groupBy(col("__key"), col("__chunk"))
      .agg(max(struct(col("__ts"), col("__tie"), col("__pay"))).as("__fin"))
    val chunks = l.select(col("__key"), col("__chunk"))
      .unionByName(r.select(col("__key"), col("__chunk"))).distinct()
    val wc = Window.partitionBy(col("__key")).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunks
      .join(chunkLast, Seq("__key", "__chunk"), "left")
      .withColumn("__carry", last(col("__fin"), ignoreNulls = true).over(wc))
      .select(col("__key"), col("__chunk"),
        col("__carry.__pay").as("__carrypay"))
    within
      .join(carry, Seq("__key", "__chunk"))
      .withColumn("__best", coalesce(col("__match"), col("__carrypay")))
      .select(leftCols.map(c => col(s"__row.$c").as(c)) ++
        rightPayload.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** q29: purchase-to-view attribution — every purchase event matched
    * with the same user's most recent view at or before it (the
    * classic last-touch attribution asof). Non-matching purchases
    * (view came later or never) keep NULL view columns. */
  def q29Query(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event_id"),
        col("ts").as("view_ts"))
    asofJoin(purchases, views, key = "user_id",
      leftTs = "ts", rightTs = "view_ts",
      rightPayload = Seq("view_event_id", "view_ts"),
      tieBreak = "view_event_id")
      .orderBy(col("user_id"), col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    // explicit argmax form, NOT DuckDB's ASOF keyword: it pins the
    // exact tie semantics (greatest view_ts, then greatest
    // view_event_id) that the union+window implementation guarantees
    "q29_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_event_id, ts AS view_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT user_id, event_id, ts, value, view_event_id, view_ts FROM (
        |  SELECT p.*, v.view_event_id, v.view_ts,
        |         row_number() OVER (PARTITION BY p.user_id, p.event_id
        |                            ORDER BY v.view_ts DESC, v.view_event_id DESC) AS rn
        |  FROM p LEFT JOIN v
        |    ON p.user_id = v.user_id AND v.view_ts <= p.ts)
        |WHERE rn = 1 ORDER BY user_id, event_id""".stripMargin,
  )
}
