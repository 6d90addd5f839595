package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class texthashSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    Seq(123456789L, 987654321L, (1L << 59) + 17L),
    Seq(42L),
    (1 to 100).map(i => (i * 2654435761L) & ((1L << 60) - 1)),
  )

  private def minhashRef(vs: Seq[Long]): Seq[Long] =
    (0 until TextHashes.MinHashFns).map { h =>
      vs.map(hv =>
        (TextHashes.A(h) * (hv >> 30) + TextHashes.B(h) * (hv & TextHashes.Lo30Mask)
          + TextHashes.C(h)) % TextHashes.MinHashP).min
    }

  private def simhashRef(vs: Seq[Long]): Long =
    (0 until TextHashes.SimHashBits).map { b =>
      val vote = vs.map(hv => if (((hv >> b) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << b else 0L
    }.sum

  test("MinHashSignature matches the driver-side reference; empty → null") {
    texthash.register(spark)
    val got = (samples :+ Seq.empty[Long]).toDF("hvs")
      .select(texthash.minhashSignature(col("hvs")).as("sig"))
      .collect()
    samples.zipWithIndex.foreach { case (vs, i) =>
      got(i).getSeq[Long](0) shouldBe minhashRef(vs)
    }
    got(samples.length).isNullAt(0) shouldBe true
  }

  test("SimHash60 matches the driver-side reference; empty → 0") {
    texthash.register(spark)
    val got = (samples :+ Seq.empty[Long]).toDF("hvs")
      .select(texthash.simhash60(col("hvs")).as("sh"))
      .collect().map(_.getLong(0))
    samples.zipWithIndex.foreach { case (vs, i) =>
      got(i) shouldBe simhashRef(vs)
    }
    got(samples.length) shouldBe 0L
  }

  test("WordShingles matches the declarative shingles tree on varied input") {
    texthash.register(spark)
    val texts = Seq(
      "a b c d e", "a b", "", "x y z x y z x", "one two three",
      "repeat repeat repeat repeat", "Tabs\tand,punct! mixed 42 tokens here",
    )
    val rows = texts.toDF("text")
      .select(
        texthash.wordShingles(textops.tokens(org.apache.spark.sql.functions.col("text"))).as("native"),
        textops.shingles(textops.tokens(org.apache.spark.sql.functions.col("text"))).as("declarative"))
      .collect()
    rows.foreach { r =>
      r.getSeq[String](0) shouldBe r.getSeq[String](1)
    }
  }

  test("ShingleHash60s == hash60 over WordShingles on varied input") {
    texthash.register(spark)
    val texts = Seq(
      "a b c d e", "a b", "", "x y z x y z x", "one two three four five",
      "Punct, mixed! 42 tokens: here now",
    )
    val rows = texts.toDF("text")
      .select(
        texthash.shingleHash60s(textops.tokens(org.apache.spark.sql.functions.col("text"))).as("fused"),
        org.apache.spark.sql.functions.transform(
          texthash.wordShingles(textops.tokens(org.apache.spark.sql.functions.col("text"))),
          g => textops.hash60(g)).as("composed"))
      .collect()
    rows.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
  }

  test("GramHash60s == hash60 over every substr-8 position, incl. short/empty/multibyte edges") {
    texthash.register(spark)
    import org.apache.spark.sql.functions.{col, greatest, lit, sequence, transform}
    import org.apache.spark.sql.functions.{length => strlen}
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short", "", "exactly8", "exactly9!",
      "répétition über naïve — multibyte ¢ödepoints här",
      "aaaaaaaaaaaaaaaaaaaa",
    )
    val rows = texts.toDF("text")
      .select(
        texthash.gramHash60s8(col("text")).as("native"),
        transform(
          sequence(lit(1), greatest(strlen(col("text")) - 7, lit(1))),
          i => textops.hash60(col("text").substr(i, lit(8)))).as("hof"))
      .collect()
    rows.foreach { r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1) }
    // driver-side twin agrees too (the empty-string gram included)
    val one = texts(1) // "short" → one gram = the whole string
    rows(1).getSeq[Long](0) shouldBe
      Seq(graft.functions.textops.hash60Local(one))
    rows(2).getSeq[Long](0) shouldBe
      Seq(graft.functions.textops.hash60Local(""))
  }

  test("textops twins are registered for SQL users") {
    texthash.register(spark)
    val row = spark.sql(
      "SELECT hash60('abc') AS h, tokenize('Hello, World! 42') AS t, " +
        "normalize_text('  A,,b  C ') AS nrm").head()
    val expectH = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    row.getLong(0) shouldBe expectH
    row.getSeq[String](1) shouldBe Seq("hello", "world", "42")
    row.getString(2) shouldBe "a b c"
  }

  test("NormalizeText matches the declarative regex tree on adversarial input") {
    texthash.register(spark)
    val texts = Seq(
      "", " ", "   ", "...", "a", "  A,,b  C ", "Hello, World! 42",
      "tab\tand\nnewline\r\nmix", "under_score-dash.dot",
      "ümlaut Émigré naïve", "日本語テキスト mixed ascii",
      "emoji 😀🎉 split", "KELVIN sign", // K lowers to ASCII k
      "İstanbul dotted I", "a" * 500 + "!" + "b" * 500,
      "0123456789", "!@#$%^&*()", "a!b@c#d$e", " leading and trailing ",
    )
    val rows = texts.toDF("text")
      .select(
        textops.normalizeText(col("text")).as("native"),
        textops.normalizeTextDeclarative(col("text")).as("declarative"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      withClue(s"input: '$t'") { r.getString(0) shouldBe r.getString(1) }
    }
  }

  test("expressions survive the SQL registry path") {
    texthash.register(spark)
    samples.take(1).toDF("hvs").createOrReplaceTempView("th_test")
    val row = spark.sql(
      "SELECT minhash_signature(hvs) AS sig, simhash60(hvs) AS sh FROM th_test")
      .head()
    row.getSeq[Long](0) shouldBe minhashRef(samples.head)
    row.getLong(1) shouldBe simhashRef(samples.head)
  }
}
