package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.textops

/** c12: training-mix construction — the data-mixing step every
  * large-scale pretraining pipeline runs between curation and
  * tokenization: re-weight each source to a target fraction of its
  * token mass (down-sample the over-represented crawl, keep the
  * high-value sources at full weight) with a DETERMINISTIC,
  * re-runnable document selection. Selection is defined purely by
  * arithmetic: scan a source's docs in (bucket, hash60(doc_id),
  * doc_id) order — a content-independent uniform shuffle — and keep
  * while the running token sum stays within `budget = pct% of the
  * source's total tokens` (take-while, not knapsack: the first doc
  * that would cross the line stops the source, which keeps the rule
  * order-local and both engines bit-agreed).
  *
  * The 100 TB shape is what makes this an operator and not a window:
  * a naive per-source running sum serializes each source through one
  * task (sources are FEW — the exact skew a per-key window dies on).
  * Instead:
  *  1. docs hash into [[NumBuckets]] buckets; ONE partial-aggregable
  *     pass produces the (source, bucket) token sums — ≤ sources ×
  *     [[NumBuckets]] rows, constant in corpus size;
  *  2. the cutoff table (running bucket sums, budget comparison) is
  *     computed on those few rows and BROADCAST back;
  *  3. docs in fully-in buckets pass with a broadcast-join filter —
  *     no shuffle, no sort, no window;
  *  4. ONLY the single boundary bucket per source (~1/[[NumBuckets]]
  *     of the source; shrink further by raising the bucket count with
  *     corpus size) pays a within-bucket running-sum window.
  *
  * The gate reports per source: docs/tokens kept vs total and the
  * budget. Oracle: DuckDB replays the same integer arithmetic over
  * the same cross-engine hash — bit-exact. */
object Mixture {

  /** Hash buckets for the take-while split. At warehouse scale this
    * rises with corpus size (the boundary bucket is the only windowed
    * work, sized corpus/buckets); the selection CONTRACT — global
    * (bucket, hash, doc_id) order — is unchanged by the count. */
  val NumBuckets = 64

  /** Deterministic per-source target percentage of token mass for the
    * gate: varied-but-reproducible across src0..src19. A deployment
    * passes its own (source → pct) table. */
  def pctOf(source: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(15) + (expr("CAST(substring(source, 4, 8) AS INT)") * 37) % 71)

  /** Core take-while over `(source, doc_id, n_tok, pct)` rows: returns
    * the kept rows with their bucket and hash. Pure arithmetic on the
    * cross-engine [[textops.hash60]], so any engine replays the exact
    * selection. Over a [[graft.sources.SampleKeys]] layout the hash is
    * the materialized `smp_doc` column (no per-row md5 in the scan);
    * raw frames compute it inline — identical values either way. */
  def mixtureTake(docs: DataFrame): DataFrame = {
    val h =
      if (docs.columns.contains("smp_doc")) col("smp_doc")
      else textops.hash60(col("doc_id").cast("string"))
    val withH = docs
      .withColumn("h", h)
      .withColumn("bkt", pmod(col("h"), lit(NumBuckets.toLong)))
    // (1) constant-size bucket sums
    val bucketTok = withH.groupBy(col("source"), col("pct"), col("bkt"))
      .agg(sum(col("n_tok")).as("btok"))
    // (2) cutoff table on <= sources x NumBuckets rows
    val wb = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoffs = bucketTok
      .withColumn("running", sum(col("btok")).over(wb))
      .withColumn("prev", col("running") - col("btok"))
      .withColumn("budget",
        expr("(sum(btok) OVER (PARTITION BY source) * pct) div 100"))
      .select(col("source"), col("bkt"),
        (col("running") <= col("budget")).as("full_in"),
        (col("prev") < col("budget") && col("running") > col("budget"))
          .as("boundary"),
        (col("budget") - col("prev")).as("rem"))
    val tagged = withH.join(broadcast(cutoffs), Seq("source", "bkt"))
    // (3) fully-in buckets: broadcast filter only
    val fullIn = tagged.filter(col("full_in"))
    // (4) the one boundary bucket per source pays the window
    val wd = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = tagged.filter(col("boundary"))
      .withColumn("drun", sum(col("n_tok")).over(wd))
      .filter(col("drun") <= col("rem"))
      .drop("drun")
    fullIn.unionByName(boundary)
  }

  /** Gate: mix the documents corpus with [[pctOf]] targets and report
    * per source — kept docs/tokens against totals and budget. */
  def c12Query(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: the narrow (source, doc_id, hash, n_tok, pct)
    // projection feeds FOUR consumers (bucket sums, the tagged join's
    // full-in and boundary branches, totals) and column pruning keeps
    // their exchanges from ever matching — without the cut the corpus
    // is re-scanned and re-TOKENIZED once per consumer (profiled: the
    // tokenize stages were 4 of c12's 13 jobs and most of its wall).
    // The checkpointed rows carry no text (~40 B/doc at any corpus
    // size), so materializing once is strictly cheaper than one extra
    // tokenize pass, let alone three.
    val docs = graft.sources.SampleKeys.documents(s, d).select(
      col("source"), col("doc_id"), col("smp_doc"),
      size(textops.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("pct", pctOf(col("source")))
      .transform(Lineage.cut(_))
    val kept = mixtureTake(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"), sum(col("n_tok")).as("tokens_kept"))
    val totals = docs.groupBy(col("source"), col("pct"))
      .agg(count(lit(1)).as("docs_total"), sum(col("n_tok")).as("tokens_total"))
    totals.join(kept, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        col("docs_total"), col("tokens_total"),
        expr("(tokens_total * pct) div 100").as("budget_tokens"))
      .orderBy(col("source"))
  }

  /** DuckDB twin: the same arithmetic — hash, buckets, integer budget,
    * bucket cutoffs, boundary-bucket running sum. */
  val oracles: Map[String, String] = {
    val h = textops.hash60Sql("doc_id::VARCHAR")
    Map("c12_mixture" ->
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |    len(${textops.tokensSql("text")})::BIGINT AS n_tok,
         |    (15 + (CAST(substr(source, 4) AS INT) * 37) % 71) AS pct,
         |    $h AS h, ($h) % ${NumBuckets} AS bkt
         |  FROM documents),
         |bt AS (
         |  SELECT source, pct, bkt, sum(n_tok) AS btok
         |  FROM d GROUP BY 1, 2, 3),
         |co AS (
         |  SELECT source, bkt,
         |    sum(btok) OVER (PARTITION BY source ORDER BY bkt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
         |    sum(btok) OVER (PARTITION BY source ORDER BY bkt
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - btok AS prev,
         |    (sum(btok) OVER (PARTITION BY source) * pct) // 100 AS budget
         |  FROM bt),
         |kept AS (
         |  SELECT d.source, d.doc_id, d.n_tok
         |  FROM d JOIN co ON d.source = co.source AND d.bkt = co.bkt
         |  WHERE co.running <= co.budget
         |  UNION ALL
         |  SELECT source, doc_id, n_tok FROM (
         |    SELECT d.source, d.doc_id, d.n_tok,
         |      sum(d.n_tok) OVER (PARTITION BY d.source, d.bkt
         |        ORDER BY d.h, d.doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drun,
         |      co.budget - co.prev AS rem
         |    FROM d JOIN co ON d.source = co.source AND d.bkt = co.bkt
         |    WHERE co.prev < co.budget AND co.running > co.budget)
         |  WHERE drun <= rem),
         |k AS (
         |  SELECT source, count(*) AS docs_kept,
         |    CAST(sum(n_tok) AS BIGINT) AS tokens_kept
         |  FROM kept GROUP BY 1),
         |t AS (
         |  SELECT source, pct, count(*) AS docs_total,
         |    CAST(sum(n_tok) AS BIGINT) AS tokens_total
         |  FROM d GROUP BY 1, 2)
         |SELECT t.source,
         |  coalesce(k.docs_kept, 0) AS docs_kept,
         |  CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
         |  t.docs_total, t.tokens_total,
         |  CAST((t.tokens_total * t.pct) // 100 AS BIGINT) AS budget_tokens
         |FROM t LEFT JOIN k ON t.source = k.source
         |ORDER BY t.source""".stripMargin)
  }
}
