package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c11 sign-collapsed upsert (CollapsingMergeTree): the sum(sign·x)
  * report must equal the latest-per-key window over raw events, every
  * superseded version must net to exactly zero, appends must land as
  * new part files with cross-part cancels (old files untouched), and
  * the whole build must be split-invariant. */
class CollapsingSpec extends SparkSpec {
  import spark.implicits._

  /** Collapsing's append contract is TIME-FORWARD per key (a cancel is
    * emitted by the event that supersedes it), so the second shard must
    * carry genuinely later timestamps — hence the month parameter. An
    * interleaved-time shard is the documented full-rebuild case, not an
    * append (ClickHouse ships VersionedCollapsingMergeTree for that). */
  private def eventRows(ids: Range, month: Int = 1): Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    ids.map { i =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-$month%02d-${1 + i % 28}%02d ${i % 24}%02d:0${i % 6}:11.$i%06d")
      (i.toLong, ts, (i % 53).toLong,
        Seq("view", "click", "purchase")(i % 3), i * 1.37 + 0.005)
    }

  private def writeShard(dir: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)], mode: String): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2)
      .write.mode(mode).parquet(s"$dir/events.parquet")

  /** The oracle's shape: latest-per-key off raw events, then the same
    * three linear stats. */
  private def direct(dir: String) = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("net_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("net_cents"),
        sum(unix_millis(col("ts"))).as("net_ms"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  private def served(dir: String) =
    Collapsing.c11Query(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("net_users"),
        r.getAs[Long]("net_cents"), r.getAs[Long]("net_ms")))

  private def dataFilesOf(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> (f.length, f.lastModified))
      .toMap
  }

  test("sign-collapsed report over one part equals latest-per-key over raw events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c11-").toString
    writeShard(dir, eventRows(0 until 500), "overwrite")
    served(dir) shouldBe direct(dir)
  }

  test("every superseded version nets to zero: per key sum(sign) == 1 and version multiset collapses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c11z-").toString
    writeShard(dir, eventRows(0 until 500), "overwrite")
    val parts = spark.read.parquet(Collapsing.ensureCollapsing(spark, dir))
    // net exactly one surviving row per key
    val perKey = parts.groupBy(col("user_id"))
      .agg(sum(col("sign")).as("net")).collect()
    perKey.length shouldBe 53
    perKey.foreach(_.getAs[Long]("net") shouldBe 1L)
    // and the survivors are exactly the latest versions: group on the
    // FULL version tuple — every non-current tuple appears +1 and -1
    val v = parts.groupBy(col("user_id"), col("event_id"))
      .agg(sum(col("sign")).as("net"))
      .filter(col("net") =!= 0).collect()
    v.length shouldBe 53
    val latestIds = eventRows(0 until 500).groupBy(_._3)
      .map { case (_, rs) => rs.maxBy(r => (r._2.getTime, r._1))._1 }.toSet
    v.map(_.getAs[Long]("event_id")).toSet shouldBe latestIds
  }

  test("append writes shard rows + cross-part cancels; old files untouched; split-invariant") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c11app-").toString
    writeShard(dir, eventRows(0 until 300), "overwrite")
    val partsDir = Collapsing.ensureCollapsing(spark, dir)
    val before = dataFilesOf(partsDir)
    before should not be empty
    // shard 2 updates users already present (ids overlap mod 53) with
    // strictly later timestamps (next month) — every affected key needs
    // a cross-part cancel of its part-1 current row
    writeShard(dir, eventRows(1000 until 1300, month = 2), "append")
    Collapsing.ensureCollapsing(spark, dir)
    val after = dataFilesOf(partsDir)
    before.foreach { case (p, meta) => after.get(p) shouldBe Some(meta) }
    after.size should be > before.size
    served(dir) shouldBe direct(dir)
    // one-shot build over the union produces the identical report
    val oneShot = java.nio.file.Files.createTempDirectory("graft-c11one-").toString
    writeShard(oneShot, eventRows(0 until 300) ++ eventRows(1000 until 1300, month = 2), "overwrite")
    served(oneShot) shouldBe served(dir)
    // and the appended parts still collapse perfectly per key
    val parts = spark.read.parquet(partsDir)
    parts.groupBy(col("user_id")).agg(sum(col("sign")).as("net"))
      .collect().foreach(_.getAs[Long]("net") shouldBe 1L)
    // a mutated shard (regenerated corpus) full-rebuilds, not appends
    writeShard(dir, eventRows(0 until 40), "overwrite")
    Collapsing.ensureCollapsing(spark, dir)
    served(dir) shouldBe direct(dir)
  }
}
