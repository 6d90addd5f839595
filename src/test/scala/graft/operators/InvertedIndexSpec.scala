package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t8 inverted-index search: index↔scan equivalence, planning-time
  * bucket pruning, incremental append on corpus growth, and the
  * minMatch contract. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private val docs = Seq(
    1L -> "the table holds a value and a part",   // table+value+part = 3 terms
    2L -> "hash hash hash of the table",           // hash+table, tf(hash)=3
    3L -> "nothing relevant here at all",          // 0 terms
    4L -> "value",                                 // 1 term — below minMatch
    5L -> "part value part value part",            // 2 terms, tf 3+2
  )

  test("searchIndexed matches searchScan and the driver-side count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-").toString
    writeDocs(dir, docs)
    val got = InvertedIndex.searchIndexed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array((1L, 3L, 3L), (2L, 2L, 4L), (5L, 2L, 5L))
    val scan = InvertedIndex
      .searchScan(spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    scan shouldBe got
  }

  test("needle buckets prune the index partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-").toString
    writeDocs(dir, docs)
    val plan = InvertedIndex.searchIndexed(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan.split("PartitionFilters").exists(_.contains("tb")) shouldBe true
    // the driver-side bucket hash is the bit-exact twin of the column
    // hash: every needle posting must live in a computed bucket
    val tbs = InvertedIndex.needleBuckets(InvertedIndex.Needle)
    val stored = spark.read.parquet(InvertedIndex.indexPath(dir))
      .filter(col("token").isin(InvertedIndex.Needle: _*))
      .select(col("tb")).distinct().collect().map(_.getInt(0)).toSet
    stored.subsetOf(tbs.toSet) shouldBe true
  }

  test("grow-only corpus appends just the new shard's postings") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx-").toString
    writeDocs(dir, docs)
    InvertedIndex.ensureIndex(spark, dir)
    val before = spark.read.parquet(InvertedIndex.indexPath(dir)).count()
    // new shard lands BESIDE the old files (grow-only ingest)
    Seq(6L -> "table value extra shard doc")
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
      .write.mode("append").parquet(s"$dir/documents.parquet")
    InvertedIndex.ensureIndex(spark, dir)
    val after = spark.read.parquet(InvertedIndex.indexPath(dir))
    after.count() should be > before
    // the appended doc is searchable and scored like everything else
    val got = InvertedIndex.searchIndexed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got should contain((6L, 2L, 2L))
    // old docs' postings were not recomputed into duplicates
    after.groupBy(col("token"), col("doc_id")).count()
      .filter(col("count") > 1).count() shouldBe 0L
  }
}
