package graft

/** End-to-end wiring check: every registered query runs against the
  * sf0.001 testdata and materialises through the noop sink (count()
  * would let Catalyst drop top-level sorts — same discipline as Bench).
  * Value correctness is the driver's DuckDB gate; these catch broken
  * plans, schema drift, and bad column references at test time. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry (flagship) returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every queries key has an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle shouldBe empty
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs end-to-end at sf0.001") {
      noException should be thrownBy
        fn(spark, SparkSpec.TinySf)
          .write.format("noop").mode("overwrite").save()
    }
  }
}
