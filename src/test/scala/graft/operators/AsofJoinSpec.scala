package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("asofJoin: most recent at-or-before match, per key") {
    val left = Seq(
      (1L, ts(10), "p1"),
      (1L, ts(20), "p2"),
      (2L, ts(10), "p3"),
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(5), "v1"),
      (1L, ts(15), "v2"),
      (2L, ts(11), "v3"), // AFTER the only left row of key 2
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
        Seq("rname", "rts"), tieBreak = "rname")
      .collect().map(r => r.getAs[String]("lname") -> r.getAs[String]("rname")).toMap
    out shouldBe Map("p1" -> "v1", "p2" -> "v2", "p3" -> null)
  }

  test("asofJoin: equal timestamps match (at-or-before) and tie-break to greatest") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(10), "a"),
      (1L, ts(10), "b"), // same ts: greatest tieBreak wins
      (1L, ts(3), "z"),
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
        Seq("rname"), tieBreak = "rname")
      .collect().map(_.getAs[String]("rname"))
    out shouldBe Array("b")
  }

  test("asofJoin: numeric tie-break orders numerically, not lexicographically") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(10), 9L),  // "9" > "10" as strings — numeric must pick 10
      (1L, ts(10), 10L),
    ).toDF("k", "rts", "rid")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
        Seq("rid"), tieBreak = "rid")
      .collect().map(_.getAs[Long]("rid"))
    out shouldBe Array(10L)
  }

  test("asofJoin: null timestamps never match (right dropped, left kept unmatched)") {
    val left = Seq(
      (1L, ts(10), "p1"),
      (1L, null.asInstanceOf[Timestamp], "pnull"), // null LEFT ts: kept, no match
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, null.asInstanceOf[Timestamp], "vnull"), // null RIGHT ts: never a match
      (1L, ts(5), "v1"),
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
        Seq("rname"), tieBreak = "rname")
      .collect().map(r => r.getAs[String]("lname") -> r.getAs[String]("rname")).toMap
    out shouldBe Map("p1" -> "v1", "pnull" -> null)
  }

  test("asofJoinChunked: carry crosses chunk boundaries; null timestamps behave like asofJoin") {
    val left = Seq(
      (1L, ts(100), "p1"), // match comes from an EARLIER chunk (carry)
      (2L, ts(100), "p2"), // no right at all
      (1L, null.asInstanceOf[Timestamp], "pnull"),
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(3), "v1"),
      (1L, null.asInstanceOf[Timestamp], "vnull"),
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoinChunked(left, right, "k", "lts", "rts",
        Seq("rname"), tieBreak = "rname", chunkSec = 600L) // 10-min chunks
      .collect().map(r => r.getAs[String]("lname") -> r.getAs[String]("rname")).toMap
    out shouldBe Map("p1" -> "v1", "p2" -> null, "pnull" -> null)
  }

  test("asofJoin plans one exchange on the key, no join operator") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "lts", "lname")
    val right = Seq((1L, ts(5), "v")).toDF("k", "rts", "rname")
    val plan = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
      Seq("rname"), tieBreak = "rname").queryExecution.executedPlan.toString
    // the scale contract: union + window, never a per-key-quadratic join
    plan.toLowerCase should not include "join"
    plan should include("Window")
  }
}
