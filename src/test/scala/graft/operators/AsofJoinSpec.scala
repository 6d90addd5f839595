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

  test("asofJoinForward: earliest strictly-after match, per key") {
    val left = Seq(
      (1L, ts(10), "p1"),
      (1L, ts(20), "p2"),
      (2L, ts(10), "p3"), // only right of key 2 is BEFORE it
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(15), "v1"),
      (1L, ts(25), "v2"),
      (2L, ts(5), "v3"),
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoinForward(left, right, "k", "lts", "rts",
        Seq("rname"), tieBreak = "rname")
      .collect().map(r => r.getAs[String]("lname") -> r.getAs[String]("rname")).toMap
    out shouldBe Map("p1" -> "v1", "p2" -> "v2", "p3" -> null)
  }

  test("asofJoinForward: equal timestamps do NOT match (strict); ties to least") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(10), "x"), // same ts: strictly-after excludes it
      (1L, ts(12), "b"),
      (1L, ts(12), "a"), // same later ts: LEAST tieBreak wins
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoinForward(left, right, "k", "lts", "rts",
        Seq("rname"), tieBreak = "rname")
      .collect().map(_.getAs[String]("rname"))
    out shouldBe Array("a")
  }

  test("asofJoinForward: null timestamps never match on either side") {
    val left = Seq(
      (1L, ts(10), "p1"),
      (1L, null.asInstanceOf[Timestamp], "pnull"), // null LEFT ts: kept, no match
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, null.asInstanceOf[Timestamp], "vnull"), // null RIGHT ts: never a match
      (1L, ts(15), "v1"),
    ).toDF("k", "rts", "rname")
    val out = AsofJoin.asofJoinForward(left, right, "k", "lts", "rts",
        Seq("rname"), tieBreak = "rname")
      .collect().map(r => r.getAs[String]("lname") -> r.getAs[String]("rname")).toMap
    out shouldBe Map("p1" -> "v1", "pnull" -> null)
  }

  test("asofJoinForward matches driver-side brute force on random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // few keys + tight time domain: forces equal timestamps (strict
    // boundary), equal-ts right ties, unmatched lefts, hot keys
    val rowGen = Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 20L))
    val caseGen = Gen.zip(Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen))
    val cases = (0 until 12).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(777L + i)))
    cases.foreach { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "lts", "lid")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "rts", "rid")
      val got = AsofJoin.asofJoinForward(left, right, "k", "lts", "rts",
          Seq("rid"), tieBreak = "rid")
        .collect()
        .map(r => r.getAs[Long]("lid") ->
          Option(r.get(r.fieldIndex("rid"))).map(_.asInstanceOf[Long]))
        .toMap
      val want = ls.zipWithIndex.map { case ((lk, lt), li) =>
        val after = rs.zipWithIndex
          .collect { case ((`lk`, rt), ri) if rt > lt => (rt, ri.toLong) }
        li.toLong -> after.sorted.headOption.map(_._2) // min ts, least tie
      }.toMap
      got shouldBe want
    }
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
