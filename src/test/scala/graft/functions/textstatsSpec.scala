package graft.functions

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{array, col, lit}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Cross-check of the native one-pass token statistics against the
  * declarative higher-order-function trees they replaced — the same
  * native-vs-declarative discipline the texthash spec applies to
  * WordShingles. The declarative forms also remain the DuckDB oracle
  * side, so the driver gate re-checks these semantics cross-engine. */
class textstatsSpec extends SparkSpec {
  import spark.implicits._

  private val lists = TextAnalysis.Stopwords.map(_._2)

  private def declarativeCount(t: org.apache.spark.sql.Column, ws: Seq[String]) =
    F.size(F.filter(t, x => x.isInCollection(ws)))

  private def declarativeCharSum(t: org.apache.spark.sql.Column) =
    F.aggregate(t, lit(0), (acc, x) => acc + F.length(x))

  /** Deterministic scalacheck sampling (OperatorPropertySpec pattern). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("StopwordCounts matches the declarative per-list filter counts") {
    textstats.register(spark)
    val texts = Seq(
      "the cat sat on the mat and the dog",   // en-heavy, repeats
      "der hund und die katze und der vogel", // de-heavy
      "le chat est dans la maison pour un chien",
      "el perro y los gatos con las aves",
      "no stopwords here xyzzy plugh",
      "", "the", "THE The tHe",               // case-folding via tokens
      "42 und the le el mixed languages",
    )
    val t = textops.tokens(col("text"))
    val rows = texts.toDF("text")
      .select(
        textstats.stopwordCounts(t, lists).as("native"),
        array(lists.map(ws => declarativeCount(t, ws)): _*).as("declarative"))
      .collect()
    rows.foreach { r =>
      r.getSeq[Int](0) shouldBe r.getSeq[Int](1)
    }
  }

  test("StopwordCounts counts occurrences, not distinct matches") {
    textstats.register(spark)
    val row = Seq("the the the a a of")
      .toDF("text")
      .select(textstats.stopwordCounts(
        textops.tokens(col("text")), Seq(Seq("the", "a"))).as("c"))
      .head()
    row.getSeq[Int](0) shouldBe Seq(5)
  }

  test("TokenCharSum matches the declarative aggregate-length fold") {
    textstats.register(spark)
    val texts = Seq(
      "short words", "", "a bb ccc dddd eeeee",
      "punctuation, stripped! by... tokens", "42 numbers 007 count too",
    )
    val t = textops.tokens(col("text"))
    val rows = texts.toDF("text")
      .select(
        textstats.tokenCharSum(t).as("native"),
        declarativeCharSum(t).as("declarative"))
      .collect()
    rows.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("property: native stats match declarative trees on random token soups") {
    textstats.register(spark)
    val word = Gen.oneOf(
      lists.flatten ++ Seq("xyz", "q7", "word", "lorem", "42", "zz"))
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val batch = samples(Gen.listOfN(20, textGen), 5).flatten
    val t = textops.tokens(col("text"))
    val rows = batch.toDF("text")
      .select(
        textstats.stopwordCounts(t, lists).as("nc"),
        array(lists.map(ws => declarativeCount(t, ws)): _*).as("dc"),
        textstats.tokenCharSum(t).as("ns"),
        declarativeCharSum(t).as("ds"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      r.getSeq[Int](0) shouldBe r.getSeq[Int](1)
      r.getInt(2) shouldBe r.getInt(3)
    }
  }

  test("null token array propagates null") {
    textstats.register(spark)
    val row = Seq[Option[String]](None).toDF("text")
      .select(
        textstats.stopwordCounts(textops.tokens(col("text")), lists).as("c"),
        textstats.tokenCharSum(textops.tokens(col("text"))).as("s"))
      .head()
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
  }

  test("expressions survive the SQL registry path") {
    textstats.register(spark)
    val got = spark.sql(
      """SELECT stopword_counts(array('the', 'a', 'x'),
        |         array(array('the'), array('a', 'x'))) AS c,
        |       token_char_sum(array('ab', 'cde')) AS s""".stripMargin)
      .head()
    got.getSeq[Int](0) shouldBe Seq(1, 2)
    got.getInt(1) shouldBe 5
  }
}
