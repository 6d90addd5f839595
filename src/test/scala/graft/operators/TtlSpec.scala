package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c15 TTL expiry: the part-lifecycle physics ClickHouse's TTL clause
  * promises — expiry drops whole expired partitions as a metadata
  * operation and leaves every surviving byte alone. */
class TtlSpec extends SparkSpec {
  private val d = SparkSpec.TinySf

  private def dataFiles(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
  }

  test("expiry drops exactly the pre-cutoff day dirs, untouched survivors") {
    val out = Files.createTempDirectory("graft-ttl-spec").toString
    val events = graft.Tables.events(spark, d)
    Ttl.buildDailyLayout(events, out)
    val cutoff = Ttl.cutoffFor(events)
    val dayDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=")).map(_.getName)
    val expectDrop = dayDirs.count(n =>
      java.time.LocalDate.parse(n.stripPrefix("day=")).isBefore(cutoff))
    val survivorsBefore = dataFiles(out).filter { case (p, _) =>
      val m = "day=([0-9-]+)".r.findFirstMatchIn(p)
      m.exists(x => !java.time.LocalDate.parse(x.group(1)).isBefore(cutoff))
    }
    val (kept, dropped) = Ttl.applyTtl(out, cutoff)
    dropped shouldBe expectDrop
    kept shouldBe dayDirs.length - expectDrop
    kept should be > 0
    // every surviving data file byte-identical (same path, size, mtime)
    dataFiles(out) shouldBe survivorsBefore
    // the expired dirs are gone from the listing entirely
    new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("day=")) shouldBe kept
  }

  test("served report equals the cutoff-filtered batch aggregate") {
    val got = Ttl.c15Query(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val cutoff = Ttl.cutoffFor(graft.Tables.events(spark, d))
    val exp = graft.Tables.events(spark, d)
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .filter(col("day") >= lit(java.sql.Date.valueOf(cutoff)))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    got shouldBe exp
    // the served days span exactly the TTL window that has data
    got.keys.map(_._1).toSeq.distinct.size should be <= Ttl.TtlDays
  }

  test("warm cache serves without re-running the write or expiry") {
    Ttl.c15Query(spark, d).collect() // ensure built
    val dir = graft.sources.LocalIndex.path("ttl", d, "")
    val before = dataFiles(dir)
    before should not be empty
    val p = Ttl.c15Query(spark, d) // fresh construction, warm cache
    p.collect()
    dataFiles(dir) shouldBe before
    p.queryExecution.executedPlan.toString should not include "InsertInto"
  }
}
