package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class textopsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference md5-prefix hash, computed driver-side. */
  private def hash60Ref(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  test("tokens lowercases, strips non-alnum, drops empties") {
    val out = Seq("Hello, World!  123", "", "...", "a-b_c")
      .toDF("text")
      .select(textops.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("hello", "world", "123")
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq.empty
    out(3) shouldBe Seq("a", "b", "c")
  }

  test("shingles emits distinct word 3-grams, empty below 3 tokens") {
    val out = Seq("a b c d", "a b", "x y z x y z")
      .toDF("text")
      .select(textops.shingles(textops.tokens(col("text"))).as("sh"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("a b c", "b c d")
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq("x y z", "y z x", "z x y") // distinct
  }

  test("normalizeText collapses whitespace and strips punctuation") {
    val out = Seq("  Hello,   WORLD! ")
      .toDF("text")
      .select(textops.normalizeText(col("text")))
      .as[String].head()
    out shouldBe "hello world"
  }

  test("hash60 is the md5 hex prefix, non-negative, < 2^60") {
    val inputs = Seq("", "a", "hello world", "héllo", "123:45", "\ttab")
    val got = inputs.toDF("s")
      .select(textops.hash60(col("s")).as("h"))
      .as[Long].collect()
    got.zip(inputs).foreach { case (h, s) =>
      h shouldBe hash60Ref(s)
      h should be >= 0L
      h should be < (1L << 60)
    }
  }

  test("hash60 property: Spark expression == driver md5 for random strings") {
    // one DataFrame pass over a generated batch (per-string Spark jobs
    // would dominate test time)
    val strs = Gen.listOfN(80,
      Gen.asciiPrintableStr.map(_.take(40))).sample.get.distinct
    val got = strs.toDF("s")
      .select(col("s"), textops.hash60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s => got(s) shouldBe hash60Ref(s) }
  }
}
