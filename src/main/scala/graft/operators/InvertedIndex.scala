package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.textops

/** t8: inverted-index token search — the ClickHouse full-text
  * skip-index capability (`inverted` / `ngrambf_v1` + `hasToken`,
  * which the reference's hosted ClickHouse offers for text columns)
  * re-expressed as a persisted posting-list layout plus a
  * domain-pruned search.
  *
  * Spark-native shape, and the 100 TB story:
  *  - The INDEX is one `(token, doc_id, tf)` posting table derived
  *    from the corpus, written `partitionBy(tb)` where
  *    `tb = hash60(token) mod` [[Buckets]] — the d8/a2 persisted-
  *    index discipline. A needle's buckets are known DRIVER-side
  *    ([[textops.hash60Local]] is the bit-exact Scala twin of the
  *    column hash), so a search reads only `|needle|` of the
  *    [[Buckets]] partition directories — planning-time
  *    PartitionFilters, the scan-byte lever that matters when the
  *    posting table is corpus-sized.
  *  - The SEARCH is: prune buckets → filter to needle tokens →
  *    one partial-aggregable groupBy(doc_id) counting matched terms
  *    and summing term frequencies → `n_terms ≥` [[MinMatch]].
  *    No joins, no windows; the exchange carries only (doc_id,
  *    partial counts) rows for documents that contain at least one
  *    needle token.
  *  - INCREMENTAL: postings are doc-local (no corpus-global stats in
  *    the layout — unlike d8's hot-shingle cap there is nothing to
  *    drift), so a grow-only corpus appends just the new shard's
  *    postings into the existing bucket dirs
  *    ([[graft.sources.LocalIndex.ensureIncremental]]): per-ingest
  *    cost ∝ shard size, never corpus size.
  *
  * Oracle: the same search computed directly from `documents` by
  * DuckDB (unnest + filter + group) — cross-checking the whole
  * index-build + prune + serve path against an engine that never saw
  * the index. Exact integer counts, no fp contract needed.
  */
object InvertedIndex {

  /** Token-hash partition fan-out of the posting layout. 64 here; at
    * 100 TB this is the posting table's partition count knob — more
    * buckets = finer pruning, the usual small-files trade. */
  val Buckets = 64

  /** Search needle: corpus-vocabulary words (the t6 needle), so both
    * the match and no-match branches are exercised at every SF. */
  val Needle: Seq[String] = Seq("table", "value", "part", "hash")

  /** Minimum distinct needle terms a document must contain — exercises
    * the AND-ish semantics between ClickHouse `hasToken` conjunctions
    * (all terms) and plain OR (any term). */
  val MinMatch = 2

  /** `(token, doc_id, tf, tb)` postings of a document batch. One
    * explode + one partial-aggregable groupBy — no corpus-global
    * statistics, which is what makes the layout append-safe. */
  def postings(docs: DataFrame): DataFrame =
    graft.Spread.ifNarrow(docs)
      .select(col("doc_id"), explode(textops.tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb",
        pmod(textops.hash60(col("token")), lit(Buckets.toLong)).cast("int"))

  def indexPath(d: String): String =
    graft.sources.LocalIndex.path("token-index", d, s"_b$Buckets")

  /** Build (or incrementally append to) the posting index of a corpus
    * dir. Appends write only the NEW shard files' postings into the
    * existing partition dirs; any mutated/removed old file falls back
    * to the full rebuild. */
  def ensureIndex(s: SparkSession, d: String): String =
    graft.sources.LocalIndex.ensureIncremental("token-index", d, s"_b$Buckets",
      Seq(s"$d/documents.parquet"), s"b$Buckets") { path =>
      postings(Tables.documents(s, d))
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("tb").parquet(path)
    } { (newFiles, path) =>
      val shard = s.read.parquet(newFiles: _*)
      postings(shard)
        .write.mode("append").option("compression", "zstd")
        .partitionBy("tb").parquet(path)
    }

  /** Driver-side bucket set of a needle — the partition-prune key. */
  def needleBuckets(needle: Seq[String]): Seq[Int] =
    needle.map(w => (textops.hash60Local(w) % Buckets).toInt).distinct.sorted

  /** Search the persisted index: docs matching ≥ minMatch needle
    * terms, with term count and summed term frequency. */
  def searchIndexed(s: SparkSession, d: String,
      needle: Seq[String] = Needle, minMatch: Int = MinMatch): DataFrame = {
    val idx = s.read.parquet(ensureIndex(s, d))
    score(
      idx.filter(col("tb").isin(needleBuckets(needle).map(Int.box): _*) &&
        col("token").isin(needle: _*)),
      minMatch)
  }

  /** The same search computed straight off the corpus scan — the
    * index-free twin the spec pins [[searchIndexed]] against. */
  def searchScan(docs: DataFrame,
      needle: Seq[String] = Needle, minMatch: Int = MinMatch): DataFrame =
    score(
      graft.Spread.ifNarrow(docs)
        .select(col("doc_id"), explode(textops.tokens(col("text"))).as("token"))
        .filter(col("token").isin(needle: _*))
        .groupBy(col("token"), col("doc_id"))
        .agg(count(lit(1)).as("tf")),
      minMatch)

  private def score(hits: DataFrame, minMatch: Int): DataFrame =
    hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"))
      .filter(col("n_terms") >= minMatch)
      .orderBy(col("doc_id"))

  def t8Query(s: SparkSession, d: String): DataFrame = searchIndexed(s, d)

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  def oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${textops.tokensSql("text")}) AS tok
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id, tok, count(*)::BIGINT AS tf
       |  FROM toks WHERE tok IN ${sqlList(Needle)} GROUP BY 1, 2)
       |SELECT doc_id, count(*)::BIGINT AS n_terms,
       |       sum(tf)::BIGINT AS total_tf
       |FROM hits GROUP BY 1 HAVING count(*) >= $MinMatch
       |ORDER BY doc_id""".stripMargin
}
