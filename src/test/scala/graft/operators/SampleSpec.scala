package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q66 deterministic sampling: the ClickHouse SAMPLE-clause contract —
  * user-granular membership, nested consistency across rates, and a
  * rate that actually lands near the nominal fraction. */
class SampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def sampledUsers(num: Long, den: Long): Set[Long] =
    graft.Tables.events(spark, sf)
      .filter(Analytics.samplePred(col("user_id"), num, den))
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet

  test("samples NEST: SAMPLE 1/20 is a subset of SAMPLE 1/5 of SAMPLE 1/2") {
    val s20 = sampledUsers(1, 20)
    val s5 = sampledUsers(1, 5)
    val s2 = sampledUsers(1, 2)
    s20.subsetOf(s5) shouldBe true
    s5.subsetOf(s2) shouldBe true
  }

  test("the sampling unit is the user: every event of a sampled user is in") {
    val rows = graft.Tables.events(spark, sf)
      .filter(Analytics.samplePred(col("user_id"),
        Analytics.SampleNum, Analytics.SampleDen))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_in"))
    val all = graft.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_all"))
    val joined = rows.join(all, Seq("user_id")).collect()
    joined.length should be > 0
    joined.foreach { r =>
      r.getAs[Long]("n_in") shouldBe r.getAs[Long]("n_all")
    }
  }

  test("the realized rate tracks the nominal fraction") {
    val total = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val sampled = sampledUsers(Analytics.SampleNum, Analytics.SampleDen).size
    val nominal = Analytics.SampleNum.toDouble / Analytics.SampleDen
    // binomial noise bound on 150 users at 10%: ±3σ ≈ ±0.075
    sampled.toDouble / total shouldBe nominal +- 0.08
  }
}
