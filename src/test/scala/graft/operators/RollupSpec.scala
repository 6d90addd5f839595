package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c9 rollup serving: the served report must be indistinguishable from
  * recomputing over raw events (exact columns), appends must land as
  * additional part rows without touching existing rollup files, and the
  * serve-side merge must stay correct when one grain spans parts. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic events with µs timestamps (DateType pass-through in
    * [[graft.Tables.normalizeEventTs]]), spanning the serve window. */
  private def eventRows(ids: Range, dayOf: Int => Int): Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    ids.map { i =>
      val day = dayOf(i)
      val ts = java.sql.Timestamp.valueOf(
        f"2024-01-$day%02d ${i % 24}%02d:0${i % 6}:11.$i%06d")
      (i.toLong, ts, (i % 37).toLong,
        Seq("view", "click", "purchase")(i % 3), i * 1.37 + 0.005)
    }

  private def writeShard(dir: String, rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)], mode: String): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2)
      .write.mode(mode).parquet(s"$dir/events.parquet")

  /** The report recomputed straight from raw events — same semantics,
    * no rollup — for Spark-vs-Spark equivalence. */
  private def direct(dir: String) = {
    val e = graft.Tables.events(spark, dir)
      .filter(to_date(col("ts")) >= to_date(lit(Rollup.ServeFrom)) &&
        to_date(col("ts")) < to_date(lit(Rollup.ServeUntil)))
    e.groupBy(col("event_type"))
      .agg(countDistinct(to_date(col("ts"))).as("days"),
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  private def servedExact(dir: String) =
    Rollup.c9Query(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("days"),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents")))

  private def dataFilesOf(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> (f.length, f.lastModified))
      .toMap
  }

  test("served report equals raw recompute; sketch contract holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c9-").toString
    writeShard(dir, eventRows(0 until 400, i => 1 + i % 28), "overwrite")
    servedExact(dir) shouldBe direct(dir)
    all(Rollup.c9Query(spark, dir).collect()
      .map(_.getAs[Boolean]("users_ok"))) shouldBe true
  }

  test("append lands partials for just the new shard; old rollup files untouched; grains merge across parts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-c9app-").toString
    // shard 1: days 8..14 — entirely inside the serve window
    writeShard(dir, eventRows(0 until 300, i => 8 + i % 7), "overwrite")
    val rollupDir = Rollup.ensureRollup(spark, dir)
    val before = dataFilesOf(rollupDir)
    before should not be empty
    // shard 2 overlaps shard 1's days (same grains land as NEW part
    // rows) and adds fresh days
    writeShard(dir, eventRows(1000 until 1200, i => 10 + i % 10), "append")
    Rollup.ensureRollup(spark, dir)
    val after = dataFilesOf(rollupDir)
    before.foreach { case (p, meta) => after.get(p) shouldBe Some(meta) }
    after.size should be > before.size
    // the multi-part rollup serves the same report as a raw recompute
    // over the grown corpus
    servedExact(dir) shouldBe direct(dir)
    // a mutated shard (regenerated corpus) full-rebuilds, not appends
    writeShard(dir, eventRows(0 until 50, i => 8 + i % 3), "overwrite")
    Rollup.ensureRollup(spark, dir)
    servedExact(dir) shouldBe direct(dir)
  }
}
