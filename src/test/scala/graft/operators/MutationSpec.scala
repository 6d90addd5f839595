package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c20/c21 mutations: the ClickHouse ALTER DELETE/UPDATE physics —
  * a mutation rewrites ONLY the parts holding matching keys; every
  * other part stays byte-identical, and the post-mutation table equals
  * the full-scan filter/redact definition. */
class MutationSpec extends SparkSpec {
  private val d = SparkSpec.TinySf

  private def dataFiles(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
  }

  private def bucketOf(path: String): Option[Int] =
    "b=([0-9]+)".r.findFirstMatchIn(path).map(_.group(1).toInt)

  test("delete rewrites exactly the forget buckets; others byte-identical") {
    val out = Files.createTempDirectory("graft-mut-spec").toString
    val events = graft.Tables.events(spark, d)
    Mutation.buildLayout(events, out)
    val keys = Mutation.forgetSet(events)
    keys.length shouldBe Mutation.ForgetKeys
    val hot = keys.map(k =>
      ((k % Mutation.NumBuckets + Mutation.NumBuckets) %
        Mutation.NumBuckets).toInt).toSet
    val before = dataFiles(out)
    val (affected, untouched) = Mutation.deleteKeys(spark, out, keys)
    affected shouldBe hot.size
    untouched shouldBe Mutation.NumBuckets - hot.size
    val after = dataFiles(out)
    // cold buckets: same files, same bytes, same mtimes
    before.filter { case (p, _) => bucketOf(p).exists(!hot.contains(_)) } shouldBe
      after.filter { case (p, _) => bucketOf(p).exists(!hot.contains(_)) }
    // hot buckets really were rewritten (old file paths gone)
    val hotBefore = before.keySet.filter(p => bucketOf(p).exists(hot.contains))
    hotBefore.intersect(after.keySet) shouldBe empty
    // post-mutation table == the full-scan delete definition
    val got = spark.read.parquet(out)
    got.filter(col("user_id").isin(keys.map(Long.box): _*)).count() shouldBe 0L
    val expectRows = events.filter(!col("user_id").isin(keys.map(Long.box): _*))
      .count()
    got.count() shouldBe expectRows
    expectRows should be > 0L // survivors exist — the gate is not vacuous
  }

  test("redact keeps every row, scrubs exactly the forget keys") {
    val out = Files.createTempDirectory("graft-mut-spec-upd").toString
    val events = graft.Tables.events(spark, d)
    Mutation.buildLayout(events, out)
    val keys = Mutation.forgetSet(events)
    val total = events.count()
    Mutation.redactKeys(spark, out, keys)
    val got = spark.read.parquet(out)
    got.count() shouldBe total // anonymize-not-drop: row counts survive
    val hit = got.filter(col("user_id").isin(keys.map(Long.box): _*))
    hit.count() should be > 0L
    hit.filter(col("event_type") =!= "redacted" || col("cents") =!= 0L)
      .count() shouldBe 0L
    // non-forget rows untouched: same per-type counts and cents
    val cold = got.filter(!col("user_id").isin(keys.map(Long.box): _*))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(col("cents")).as("c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = events
      .filter(!col("user_id").isin(keys.map(Long.box): _*))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    cold shouldBe expect
  }

  test("forget set is deterministic and bounded") {
    val events = graft.Tables.events(spark, d)
    val a = Mutation.forgetSet(events)
    val b = Mutation.forgetSet(events)
    a shouldBe b
    a.distinct.length shouldBe a.length
  }
}
