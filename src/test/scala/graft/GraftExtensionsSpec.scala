package graft

/** The extensions registration path: a brand-new session state (no
  * imperative `register()` call ever made on it) must already resolve
  * every graft function, because `GraftSession.local` carries
  * `spark.sql.extensions=graft.GraftExtensions`. `newSession()` builds
  * a FRESH function registry (temp-function registrations from other
  * suites cannot leak into it), so resolution here proves the
  * extension injected the builders. */
class GraftExtensionsSpec extends SparkSpec {

  test("fresh session resolves graft functions without register()") {
    val fresh = spark.newSession()
    val row = fresh.sql(
      """SELECT l2_distance(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS d,
        |       simhash60(array(7L, 7L)) AS sh""".stripMargin).head()
    row.getDouble(0) shouldBe 5.0
    row.getLong(1) shouldBe 7L
  }

  test("fresh session resolves the mg_candidates aggregate") {
    val fresh = spark.newSession()
    fresh.sql("SELECT 1L AS k, 1L AS w").createOrReplaceTempView("ext_mg_in")
    val got = fresh.sql(
      "SELECT explode(mg_candidates(k, w, 4)) FROM ext_mg_in")
      .collect().map(_.getLong(0))
    got shouldBe Array(1L)
  }

  test("fresh session resolves the topk_sketch aggregate") {
    val fresh = spark.newSession()
    fresh.range(0, 10).selectExpr("id % 3 AS k")
      .createOrReplaceTempView("ext_tk_in")
    val got = fresh.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(topk_sketch(k, 8, 1)) AS e FROM ext_tk_in)""".stripMargin)
      .head()
    got.getLong(0) shouldBe 0L // 0 appears 4x, 1/2 appear 3x
    got.getLong(1) shouldBe 4L
  }

  test("every builder name is injected exactly once") {
    val names = GraftExtensions.allBuilders.map(_._1)
    names.distinct.size shouldBe names.size
    val reg = spark.newSession().sessionState.functionRegistry
    names.foreach { n =>
      withClue(n) {
        reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)) shouldBe true
      }
    }
  }
}
