package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  *
  * All reads are plain `spark.read.parquet` so Catalyst owns predicate
  * pushdown / column pruning; callers `select`/`filter` declaratively and
  * the scan only materialises what the plan needs. At 100 TB the same code
  * reads a partitioned directory tree — nothing here assumes single-file.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS); Spark reads it as nano-count
    * LongType under `spark.sql.legacy.parquet.nanosAsLong` — convert to a
    * microsecond timestamp with exact integer division (`div`), matching
    * the ns→µs truncation the oracle engine applies when it reads the
    * same file. Double division would be lossy: epoch-ns (~1.7e18)
    * exceeds double's 2^53 exact-integer range. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** The ns→µs `ts` fix above, exposed for callers that read event
    * shard files directly (incremental rollup/index appends). */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
