package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("bandedPairs: inclusive band, same key only, bucket edges covered") {
    val left = Seq(
      (1L, ts(1000), "e1"),
      (2L, ts(1000), "e2"),
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(1000 - 30), "in-left"),    // inside band
      (1L, ts(1000 + 30), "in-right"),   // inside band
      (1L, ts(1000 + 31), "out-right"),  // 1s outside
      (1L, ts(1000 - 31), "out-left"),
      (2L, ts(1000 + 30), "other-key"),  // key 2, matches e2 only
    ).toDF("k", "rts", "rname")
    val out = RangeJoin.bandedPairs(left, right, "k", "lts", "rts",
        Seq("rname"), bandSec = 30L)
      .collect().map(r => (r.getAs[String]("lname"), r.getAs[String]("rname")))
      .toSet
    out shouldBe Set(("e1", "in-left"), ("e1", "in-right"), ("e2", "other-key"))
  }

  test("bandedPairs: partner in an adjacent bucket is still found") {
    // band 60s → buckets [0,60), [60,120); left at 61 and right at 59
    // sit in DIFFERENT buckets but only 2s apart — the ±1 bucket
    // explode must cover it
    val left = Seq((1L, ts(61), "l")).toDF("k", "lts", "lname")
    val right = Seq((1L, ts(59), "r")).toDF("k", "rts", "rname")
    val out = RangeJoin.bandedPairs(left, right, "k", "lts", "rts",
      Seq("rname"), bandSec = 60L).collect()
    out.length shouldBe 1
  }

  test("bandedPairs plans an equi-join on (key, bucket), not a cartesian") {
    val left = Seq((1L, ts(0), "l")).toDF("k", "lts", "lname")
    val right = Seq((1L, ts(0), "r")).toDF("k", "rts", "rname")
    val plan = RangeJoin.bandedPairs(left, right, "k", "lts", "rts",
      Seq("rname"), bandSec = 60L).queryExecution.executedPlan.toString
    plan.toLowerCase should not include "cartesian"
    plan.toLowerCase should not include "broadcastnestedloop"
  }
}
