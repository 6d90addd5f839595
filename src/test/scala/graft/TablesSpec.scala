package graft

import org.apache.spark.sql.functions.col

/** Pins the [[Tables]] schema-memo invariants (r22): the memo may
  * never serve a stale schema — its key is (path, mtime, size), so a
  * corpus rewritten in place re-infers — and the memoized read must
  * be plan-identical to plain inference. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("load memo serves the inferred schema and re-infers after a rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("tables-spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val first = Tables.load(spark, dir, "t")
    first.schema.fieldNames.toSeq shouldBe Seq("id", "s")
    first.orderBy(col("id")).collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    // memoized second read: same schema, same rows
    Tables.load(spark, dir, "t").schema shouldBe first.schema

    // rewrite IN PLACE with a different schema: the (mtime, size) key
    // must invalidate — a stale memo would drop the new column
    Thread.sleep(1100) // parquet dir mtime granularity can be 1s
    Seq((3L, "c", 9.5)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val second = Tables.load(spark, dir, "t")
    second.schema.fieldNames.toSeq shouldBe Seq("id", "s", "extra")
    second.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq shouldBe
      Seq((3L, 9.5))
  }

  test("memoized events load keeps the ns->us ts conversion") {
    // the driver corpus's TIMESTAMP(NANOS) column reads as LongType
    // under nanosAsLong and normalizeEventTs converts — twice through
    // the memo must yield the identical schema and timestamps
    val a = Tables.events(spark, SparkSpec.TinySf)
    val b = Tables.events(spark, SparkSpec.TinySf)
    a.schema shouldBe b.schema
    a.schema("ts").dataType.typeName shouldBe "timestamp"
    a.select(col("ts")).limit(3).collect().toSeq shouldBe
      b.select(col("ts")).limit(3).collect().toSeq
  }
}
