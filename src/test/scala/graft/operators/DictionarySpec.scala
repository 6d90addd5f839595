package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** c14 dictGet: the map-literal lookup must agree row-for-row with the
  * reference join formulation it replaces (the no-join plan shape is
  * pinned in PlanAuditSpec). */
class DictionarySpec extends SparkSpec {
  private val d = SparkSpec.TinySf

  test("c14 dictGet equals the equivalent dimension joins") {
    val got = Dictionary.c14Query(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val exp = Tables.customer(spark, d)
      .join(Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(Tables.region(spark, d),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        coalesce(col("n_name"), lit("unknown")).as("nation_name"),
        coalesce(col("r_name"), lit("unknown")).as("region_name"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .groupBy(col("nation_name"), col("region_name"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("acctbal_cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    got shouldBe exp
    got.keys.map(_._2).toSet.size should be >= 2 // regions actually resolved
  }

  test("c19 hierarchy chains equal the equivalent dimension joins, with zero joins planned") {
    val q = Dictionary.c19Query(spark, d)
    // the ClickHouse-dictionary contract: scalar probes, never joins
    q.queryExecution.executedPlan.toString should not include "Join"
    val got = q.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val exp = Tables.customer(spark, d)
      .join(Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(Tables.region(spark, d),
        col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy(coalesce(col("r_name"), lit("unknown")).as("region_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(when(col("n_regionkey") === Dictionary.TargetRegionKey, 1L)
          .otherwise(0L)).as("n_in_region"),
        sum(when(col("c_nationkey") === Dictionary.TargetNationKey, 1L)
          .otherwise(0L)).as("n_in_nation"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got shouldBe exp
    // both probe levels really fire somewhere
    got.values.map(_._2).sum should be > 0L
    got.values.map(_._3).sum should be > 0L
  }

  test("dictGet returns the default for keys absent from the dictionary") {
    import spark.implicits._
    val df = Seq(1L, 99L).toDF("k")
      .select(col("k"),
        Dictionary.dictGet(Dictionary.mapLit(Seq(1L -> "one")),
          col("k"), "unknown").as("v"))
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(1L -> "one", 99L -> "unknown")
  }
}
