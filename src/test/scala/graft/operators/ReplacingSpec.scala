package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c10 upsert serving (ReplacingMergeTree + FINAL): the part-compacted
  * merge-on-read path must equal the latest-per-key window over raw
  * events, appends must land as new part files inside the existing
  * bucket dirs without touching old ones, FINAL must pick the NEWER
  * part's version when a key is updated across parts, and a point
  * lookup must partition-prune to the key's bucket. */
class ReplacingSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(ids: Range): Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    ids.map { i =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:0${i % 6}:11.$i%06d")
      (i.toLong, ts, (i % 53).toLong,
        Seq("view", "click", "purchase")(i % 3), i * 1.37 + 0.005)
    }

  private def writeShard(dir: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)], mode: String): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2)
      .write.mode(mode).parquet(s"$dir/events.parquet")

  /** Latest-per-key straight off raw events (window formulation — the
    * oracle's shape) for Spark-vs-Spark equivalence. */
  private def direct(dir: String) = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  private def served(dir: String) =
    Replacing.c10Query(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("users"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("last_ms")))

  private def dataFilesOf(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> (f.length, f.lastModified))
      .toMap
  }

  test("FINAL over one part equals latest-per-key over raw events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c10-").toString
    writeShard(dir, eventRows(0 until 500), "overwrite")
    served(dir) shouldBe direct(dir)
  }

  test("append compacts just the new shard; old part files untouched; FINAL prefers the newer part's version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c10app-").toString
    writeShard(dir, eventRows(0 until 300), "overwrite")
    val partsDir = Replacing.ensureReplacing(spark, dir)
    val before = dataFilesOf(partsDir)
    before should not be empty
    // shard 2 UPDATES users already present (ids overlap mod 53) with
    // strictly later event_ids and adds some later timestamps
    writeShard(dir, eventRows(1000 until 1300), "append")
    Replacing.ensureReplacing(spark, dir)
    val after = dataFilesOf(partsDir)
    before.foreach { case (p, meta) => after.get(p) shouldBe Some(meta) }
    after.size should be > before.size
    served(dir) shouldBe direct(dir)
    // split-invariance: one-shot build over the union produces the
    // identical report
    val oneShot = java.nio.file.Files.createTempDirectory("graft-c10one-").toString
    writeShard(oneShot, eventRows(0 until 300) ++ eventRows(1000 until 1300), "overwrite")
    served(oneShot) shouldBe served(dir)
    // a mutated shard (regenerated corpus) full-rebuilds, not appends
    writeShard(dir, eventRows(0 until 40), "overwrite")
    Replacing.ensureReplacing(spark, dir)
    served(dir) shouldBe direct(dir)
  }

  test("point lookup partition-prunes to the key's bucket and returns its current row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c10pt-").toString
    writeShard(dir, eventRows(0 until 500), "overwrite")
    val partsDir = Replacing.ensureReplacing(spark, dir)
    val q = Replacing.lookup(spark, partsDir, 7L)
    // plan: the parquet scan carries a partition filter on b
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    scan should include("PartitionFilters")
    scan should include("= 7)") // b = 7 mod 32
    val row = q.collect()
    row.length shouldBe 1
    // 7's latest event: largest (ts, event_id) among ids ≡ 7 (mod 53)
    val want = eventRows(0 until 500).filter(_._3 == 7L)
      .maxBy(r => (r._2.getTime, r._1))
    row.head.getAs[Long]("event_id") shouldBe want._1
  }
}
