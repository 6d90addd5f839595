package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.textops

/** c17: training-sequence packing — the LLM-pipeline step that turns
  * a curated document set into fixed-token-budget training sequences
  * (the concat-and-chunk packing GPT-style pipelines use: documents
  * are laid out in a deterministic order, the token stream is cut
  * every [[Budget]] tokens, and a document belongs to the sequence
  * where its first token lands).
  *
  * Spark-native shape, and the 100 TB story:
  *  - Documents are first routed to [[NumShards]] deterministic
  *    shards (`doc_id mod` shards — the c1 hash-split discipline);
  *    packing is defined WITHIN a shard, which is what makes it
  *    scale: the running token sum is a window partitioned by shard,
  *    so shards pack in parallel and no global sort/window exists
  *    anywhere. At 100 TB the shard count rises with the corpus
  *    (each shard's window is one task's sort — size shards so a
  *    shard's (doc_id, n_tokens) pairs fit an executor, the same
  *    bound every partitioned window in the repo documents).
  *  - Within a shard: one codegen'd token count per doc, one
  *    cumulative-sum window ordered by doc_id, then
  *    `seq_id = (cum − n_tokens) div Budget` — pure integer math,
  *    no joins, one exchange (the shard hash).
  *  - The output here is the per-sequence manifest (counts, token
  *    sums, first doc) rather than materialized token arrays — the
  *    real pipeline writes sequences `partitionBy(shard)` from
  *    exactly this assignment.
  *
  * Oracle: the identical window arithmetic in DuckDB SQL — integer
  * division on BIGINT both sides, no fp contract needed.
  */
object Packing {

  /** Token budget per packed training sequence. */
  val Budget = 512L

  /** Parallel packing domains. */
  val NumShards = 8

  /** Per-document (shard, n_tokens) substrate. */
  def docTokens(docs: DataFrame): DataFrame =
    graft.Spread.ifNarrow(docs).select(
      col("doc_id"),
      (col("doc_id") % NumShards).cast("int").as("shard"),
      size(textops.tokens(col("text"))).cast("long").as("nt"))

  /** Pack: per-shard running token sum → budget-grid sequence id →
    * per-sequence manifest. */
  def pack(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    docTokens(docs)
      .withColumn("cum", sum(col("nt")).over(w))
      .withColumn("seq_id", expr(s"(cum - nt) div $Budget"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        sum(col("nt")).as("sum_tokens"))
      .orderBy(col("shard"), col("seq_id"))
  }

  def c17Query(s: SparkSession, d: String): DataFrame =
    pack(Tables.documents(s, d))

  def oracle: String =
    s"""WITH m AS (
       |  SELECT doc_id, (doc_id % $NumShards)::INTEGER AS shard,
       |         len(${textops.tokensSql("text")})::BIGINT AS nt
       |  FROM documents),
       |c AS (
       |  SELECT *, sum(nt) OVER (
       |    PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM m)
       |SELECT shard, ((cum - nt) // $Budget)::BIGINT AS seq_id,
       |       count(*)::BIGINT AS n_docs,
       |       min(doc_id) AS first_doc,
       |       sum(nt)::BIGINT AS sum_tokens
       |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
