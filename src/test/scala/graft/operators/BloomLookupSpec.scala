package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c16 bloom-filter point lookup: layout↔raw equivalence, the pushed
  * In predicate, and — the part that IS the optimization — the
  * written row groups actually carrying user_id bloom filters. */
class BloomLookupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lookup over the bloom layout matches the raw-table lookup") {
    val got = BloomLookup.lookup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val raw = graft.Tables.events(spark, sf)
      .filter(col("user_id").isin(BloomLookup.LookupUsers.map(Long.box): _*))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got shouldBe raw
    got.length should be > 0
  }

  test("the In predicate reaches the scan as a pushed filter") {
    val plan = BloomLookup.lookup(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan.split("PushedFilters").exists(s =>
      s.contains("user_id") && (s.contains("In(") || s.contains("in("))) shouldBe true
  }

  /** Per-row-group user_id chunk probe: Right(bloom offset ≥ 0) or
    * Left(fully dictionary-encoded). Parquet-mr deliberately OMITS
    * the bloom when every data page of the chunk is dictionary-
    * encoded — the dictionary itself is an exact membership filter,
    * strictly better than a bloom — so low-NDV regimes (small SFs
    * here) must be accepted as covered, not failed. */
  private def userIdSkippable(dir: String): Seq[Boolean] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.length should be > 0
    val conf = new org.apache.hadoop.conf.Configuration()
    files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val rgs = reader.getFooter.getBlocks
        rgs.size() should be > 0
        (0 until rgs.size()).map { i =>
          val cols = rgs.get(i).getColumns
          (0 until cols.size()).exists { j =>
            val c = cols.get(j)
            c.getPath.toDotString == "user_id" &&
              (c.getBloomFilterOffset >= 0 ||
                !c.getEncodingStats.hasNonDictionaryEncodedPages)
          }
        }
      } finally reader.close()
    }
  }

  test("every written user_id chunk is skippable: bloom filter or full dictionary") {
    all(userIdSkippable(BloomLookup.ensureLayout(spark, sf))) shouldBe true
  }

  test("a high-NDV key through the same writer options carries a real bloom") {
    import org.apache.spark.sql.functions.col
    // enough distinct ids that dictionary encoding falls back to plain
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomhi-").toString
    spark.range(200000)
      .select(col("id").as("user_id"), (col("id") * 7).as("payload"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#user_id", "true")
      .option("parquet.block.size", BloomLookup.BlockSize.toString)
      .parquet(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val offsets = files.toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val rgs = reader.getFooter.getBlocks
        (0 until rgs.size()).flatMap { i =>
          val cols = rgs.get(i).getColumns
          (0 until cols.size())
            .filter(j => cols.get(j).getPath.toDotString == "user_id")
            .map(j => cols.get(j).getBloomFilterOffset)
        }
      } finally reader.close()
    }
    offsets.nonEmpty shouldBe true
    all(offsets) should be >= 0L
  }
}
