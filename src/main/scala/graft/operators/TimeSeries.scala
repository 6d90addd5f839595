package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series surface (SURVEY §2, q59–q61) — the ClickHouse
  * time-series function family (`exponentialMovingAverage`,
  * `largestTriangleThreeBuckets`, `simpleLinearRegression`)
  * re-expressed with the q56/q40 discipline: the corpus collapses to a
  * domain-sized table (days × types, buckets × types) in ONE partial
  * aggregate, and every order-sensitive comparison runs in exact
  * integer (decimal) arithmetic so both engines agree bit-for-bit.
  */
object TimeSeries {

  private val D19 = "decimal(19,0)"
  private val D38 = "decimal(38,0)"

  /** Daily revenue series per event type, exact integer cents — the
    * q56 substrate: ≤ days × types rows whatever the corpus size. */
  private def dailyCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))

  /** q59: exponential moving average — ClickHouse
    * `exponentialMovingAverage(halflife)(v, t)` — of daily revenue per
    * event type, halflife 7 days, trailing 28-day support (the weight
    * beyond 4 halflives is < 6.3% and the truncation point is PINNED,
    * so both engines sum the identical term set).
    *
    * EMA is a sequential recurrence; re-expressed scalably as the
    * banded self-join of the DAILY series against itself (≤ 28 terms
    * per output row, series is days × types — domain-sized, the
    * corpus only pays the one dailyCents partial aggregate).
    * w = 2^(−Δ/7); the weighted mean is rounded to 4 decimals on both
    * engines (the only order-dependent double fold). */
  def q59Ema(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d)
    val a = daily.select(col("event_type"), col("day"),
      col("cents").as("a_cents"))
    val b = daily.select(col("event_type"), col("day").as("b_day"),
      col("cents").as("b_cents"))
    val dd = datediff(col("day"), col("b_day"))
    val w = pow(lit(0.5), dd.cast("double") / lit(7.0))
    a.join(b, Seq("event_type"))
      .filter(dd >= 0 && dd <= 27)
      .groupBy(col("event_type"), col("day"), col("a_cents"))
      .agg(count(lit(1)).as("n_terms"),
        sum(w * col("b_cents").cast("double")).as("wy"),
        sum(w).as("wsum"))
      .select(col("event_type"), col("day"), col("a_cents").as("cents"),
        col("n_terms"),
        round(col("wy") / col("wsum") / lit(100.0), 4).as("ema_usd"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q60: largest-triangle-three-buckets downsampling — ClickHouse
    * `largestTriangleThreeBuckets(n)(x, y)` — of the events (ts, value)
    * series per event type, to 20 buckets.
    *
    * Pinned to the DISTRIBUTED variant: the anchor points are the
    * neighbor buckets' centroids (classic LTTB anchors on the
    * previously SELECTED point — a sequential dependency that cannot
    * fan out; the centroid-anchor variant is the published
    * parallelizable form and is what a 1000-executor sweep can run).
    * Each bucket's winner maximizes the triangle area against the
    * previous/next non-empty bucket centroids; the comparison runs in
    * EXACT integers — the area is cleared of the centroid divisions by
    * multiplying through by np·nn (A2 = |P·Q − R·S| below), so the
    * argmax never compares approximate doubles and ties break
    * deterministically (earliest x, then event_id). First/last buckets
    * pin to the series endpoints, as LTTB keeps them.
    *
    * Plan shape: bounds scan (1 row, broadcast) → one partial
    * aggregate to ≤ types × 20 bucket stats (broadcast back) → one
    * struct-max partial aggregate. No window touches the corpus; no
    * joins wider than the 100-row stats table. Exact while
    * rows/bucket ≲ 1e8 (P·Q ≤ span·cents·n³ < 10³⁸). */
  def q60Lttb(s: SparkSession, d: String): DataFrame = {
    val B = 20
    val ev = Tables.events(s, d).select(col("event_type"),
      col("ts").cast("long").as("es"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      col("event_id"))
    val bounds = ev.agg(min(col("es")).as("lo"), max(col("es")).as("hi"))
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("rx", col("es") - col("lo"))
      // exact integer bucket math (`div`), mirroring DuckDB's `//`
      .withColumn("bucket", expr(s"(rx * $B) div (hi - lo + 1)"))
      .select(col("event_type"), col("bucket"), col("rx"), col("cents"),
        col("event_id"))
    val stats = binned.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx").cast(D19)).as("sx"),
        sum(col("cents").cast(D19)).as("sy"))
    val wb = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val nb = stats.select(col("event_type"), col("bucket"),
      col("n").as("nc"),
      lag(col("n"), 1).over(wb).as("np"), lag(col("sx"), 1).over(wb).as("sxp"),
      lag(col("sy"), 1).over(wb).as("syp"),
      lead(col("n"), 1).over(wb).as("nn"), lead(col("sx"), 1).over(wb).as("sxn"),
      lead(col("sy"), 1).over(wb).as("syn"))
      .withColumn("kind",
        when(col("np").isNull, lit("first"))
          .when(col("nn").isNull, lit("last"))
          .otherwise(lit("interior")))
    def d19(c: org.apache.spark.sql.Column) = c.cast(D19)
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val p = d19(col("sxp")) * d19(col("nn")) - d19(col("sxn")) * d19(col("np"))
    val q = d19(col("cents")) * d19(col("np")) - d19(col("syp"))
    val r = d19(col("sxp")) - d19(col("rx")) * d19(col("np"))
    val sS = d19(col("syn")) * d19(col("np")) - d19(col("syp")) * d19(col("nn"))
    val a2 = abs(d38(p) * d38(q) - d38(r) * d38(sS))
    // Exactness-bound enforcement: past ~1e8 rows/bucket the d38
    // products overflow and non-ANSI Spark yields NULL (DuckDB's
    // HUGEINT raises instead) — a silent mis-rank. p/q/r/s are never
    // null for interior buckets, so a null a2 IS the overflow signal:
    // fail loudly rather than let the struct-max rank on NULL s1.
    val a2Checked = coalesce(a2, assert_true(lit(false),
      lit("q60: LTTB area overflow — bucket stats exceed the " +
        "decimal(38,0) exactness bound (~1e8 rows/bucket); " +
        "shrink buckets or normalize the area terms")).cast(D38))
    val s1 = when(col("kind") === "interior", a2Checked)
      .otherwise(lit(0L).cast(D19))
    val s2 = when(col("kind") === "last", col("rx")).otherwise(-col("rx"))
    val s3 = when(col("kind") === "last", col("event_id"))
      .otherwise(-col("event_id"))
    binned.join(broadcast(nb), Seq("event_type", "bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(first(col("nc")).as("n_bucket"),
        max(struct(s1.as("s1"), s2.as("s2"), s3.as("s3"),
          col("rx").as("rx"), col("cents").as("cents"),
          col("event_id").as("eid"))).as("m"))
      .join(broadcast(bounds))
      .select(col("event_type"), col("bucket"), col("n_bucket"),
        (col("m.rx") + col("lo")).as("x_epoch_s"),
        col("m.cents").as("y_cents"), col("m.eid").as("event_id"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** q61: simple linear regression — ClickHouse
    * `simpleLinearRegression(x, y)` — of event value (cents) on time
    * (days since the PINNED origin 2024-01-01) per event type.
    *
    * One partial-aggregable pass of exact decimal sums
    * (n, Σx, Σy, Σxy, Σx²); slope and intercept come from the closed
    * form with a single IEEE division each. x is days from a fixed
    * origin (bounded by the calendar span, not the corpus), so the
    * sums stay within decimal(38,0) to ~1e12 rows per type. */
  def q61LinReg(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"),
      expr("CAST(round(value * 100) AS BIGINT)").as("y"))
    val g = e.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(D19).as("n"),
        sum(col("x").cast(D19)).as("sx"),
        sum(col("y").cast(D19)).as("sy"),
        sum((col("x") * col("y")).cast(D19)).as("sxy"),
        sum((col("x") * col("x")).cast(D19)).as("sxx"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = num / den
    g.select(col("event_type"), col("n").cast("long").as("n"),
      round(slope, 6).as("slope_cents_per_day"),
      round((col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n").cast("double"), 4).as("intercept_cents"))
      .orderBy(col("event_type"))
  }

  // ------------------------------------------------------------ oracles

  val oracles: Map[String, String] = Map(
    // q59: identical pinned 28-day truncation; the weighted mean is the
    // one order-dependent double fold → round(4) on both sides
    "q59_ema" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, a.day, a.cents AS cents,
        |  count(*) AS n_terms,
        |  round(sum(pow(0.5, (a.day - b.day) / 7.0) * b.cents) /
        |        sum(pow(0.5, (a.day - b.day) / 7.0)) / 100.0, 4) AS ema_usd
        |FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type
        | AND a.day - b.day BETWEEN 0 AND 27
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,
    // q60: row_number over (s1 DESC, s2 DESC, s3 DESC) mirrors the
    // struct-max; all area math in HUGEINT = Spark's decimal(38,0)
    "q60_lttb" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS es,
        |         CAST(round(value * 100) AS BIGINT) AS cents, event_id
        |  FROM events),
        |bounds AS (SELECT min(es) AS lo, max(es) AS hi FROM ev),
        |binned AS (
        |  SELECT event_type, (es - lo) * 20 // (hi - lo + 1) AS bucket,
        |         es - lo AS rx, cents, event_id, lo
        |  FROM ev, bounds),
        |stats AS (
        |  SELECT event_type, bucket, count(*) AS n,
        |    CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(cents) AS HUGEINT) AS sy
        |  FROM binned GROUP BY 1, 2),
        |nb AS (
        |  SELECT event_type, bucket, n AS nc,
        |    lag(n) OVER w AS np, lag(sx) OVER w AS sxp, lag(sy) OVER w AS syp,
        |    lead(n) OVER w AS nn, lead(sx) OVER w AS sxn, lead(sy) OVER w AS syn
        |  FROM stats
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |scored AS (
        |  SELECT b.event_type, b.bucket, nb.nc, b.rx, b.cents, b.event_id, b.lo,
        |    CASE WHEN nb.np IS NULL THEN 'first'
        |         WHEN nb.nn IS NULL THEN 'last' ELSE 'interior' END AS kind,
        |    CASE WHEN nb.np IS NOT NULL AND nb.nn IS NOT NULL THEN
        |      abs((nb.sxp * nb.nn - nb.sxn * nb.np) *
        |            (CAST(b.cents AS HUGEINT) * nb.np - nb.syp)
        |          - (nb.sxp - CAST(b.rx AS HUGEINT) * nb.np) *
        |            (nb.syn * nb.np - nb.syp * nb.nn))
        |      ELSE 0 END AS s1
        |  FROM binned b JOIN nb USING (event_type, bucket)),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY s1 DESC,
        |        CASE WHEN kind = 'last' THEN rx ELSE -rx END DESC,
        |        CASE WHEN kind = 'last' THEN event_id
        |             ELSE -event_id END DESC) AS rn
        |  FROM scored)
        |SELECT event_type, bucket, nc AS n_bucket, rx + lo AS x_epoch_s,
        |  cents AS y_cents, event_id
        |FROM ranked WHERE rn = 1 ORDER BY event_type, bucket""".stripMargin,
    // q61: closed-form least squares from exact HUGEINT sums; x from
    // the same pinned 2024-01-01 origin
    "q61_linreg" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS HUGEINT) AS x,
        |    CAST(round(value * 100) AS HUGEINT) AS y
        |  FROM events),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM e GROUP BY 1),
        |sl AS (
        |  SELECT event_type, n, sx, sy,
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope
        |  FROM g)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round(slope, 6) AS slope_cents_per_day,
        |  round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
        |        CAST(n AS DOUBLE), 4) AS intercept_cents
        |FROM sl ORDER BY event_type""".stripMargin,
  )
}
