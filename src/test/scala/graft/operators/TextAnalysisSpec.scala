package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat of the mat and it is that for a reason", "en"),
    (1L, "der hund und die katze ist ein freund von dem haus", "de"),
    (2L, "xyzzy qwerty plugh", "zz"), // no stopwords at all
  ).toDF("doc_id", "text", "lang")

  test("langId predicts the language whose stopwords dominate") {
    val confusion = TextAnalysis.langId(docs).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("n")))
    confusion should contain(("en", "en", 1L))
    confusion should contain(("de", "de", 1L))
    // zero stopword hits everywhere → en wins the >= tie-break chain
    confusion should contain(("zz", "en", 1L))
  }

  test("quality: stopword-rich short text scores by the documented formula") {
    val row = TextAnalysis.quality(docs).collect()
      .find(_.getAs[Long]("doc_id") == 0L).get
    val nTokens = row.getAs[Int]("n_tokens")
    nTokens shouldBe 13
    // recompute the documented formula from the row's own ratio:
    // quality = min(1, 0.2 + 2*stop_ratio + min(n,100)/500)
    val expect = math.min(1.0,
      0.2 + 2.0 * row.getAs[Double]("stop_ratio") + math.min(nTokens, 100) / 500.0)
    row.getAs[Double]("quality") shouldBe (math.rint(expect * 10000) / 10000)
  }

  test("tokenCounts: bpe pre-tokens split punctuation, ws tokens do not") {
    val df = Seq((0L, "hello, world! a-b")).toDF("doc_id", "text")
    val row = TextAnalysis.tokenCounts(df).head()
    row.getAs[Int]("n_ws_tokens") shouldBe 4 // hello world a b
    row.getAs[Int]("n_bpe_tokens") shouldBe 7 // hello , world ! a - b
  }

  test("fingerprint: same normal form ⇒ same fingerprint and n_same") {
    val df = Seq(
      (0L, "Hello,   World!"),
      (1L, "hello world"),
      (2L, "different entirely"),
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("fingerprint"), r.getAs[Long]("n_same"))).toMap
    rows(0L)._1 shouldBe rows(1L)._1
    rows(0L)._2 shouldBe 2L
    rows(2L)._2 shouldBe 1L
    rows(2L)._1 should not be rows(0L)._1
  }

  test("fingerprint: NULL text rows are kept as one NULL peer group (oracle semantics)") {
    // The oracle's count(*) OVER (PARTITION BY fp) keeps NULL-fp rows
    // as a single peer group; a plain equi-join back would drop them.
    val df = Seq(
      (0L, Some("same text")),
      (1L, Some("same text")),
      (2L, None: Option[String]),
      (3L, None: Option[String]),
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("fingerprint"), r.getAs[Long]("n_same"))).toMap
    rows.keySet shouldBe Set(0L, 1L, 2L, 3L) // no dropped rows
    rows(2L)._1 shouldBe null
    rows(3L)._1 shouldBe null
    rows(2L)._2 shouldBe 2L // both NULL-text rows count as one group
    rows(0L)._2 shouldBe 2L
  }

  test("repetition: looping docs flagged, diverse docs not, short docs zeroed") {
    val df = Seq(
      (0L, "spam spam spam spam spam spam"), // 6 tokens, 4 shingles, 1 uniq
      (1L, "one two three four five six"),   // all distinct
      (2L, "hi"),                            // too short for shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("uniq_token_frac"), r.getAs[Double]("dup_shingle_frac"),
          r.getAs[Boolean]("repetitive")))).toMap
    out(0L) shouldBe ((1.0 / 6.0, 0.75, true))
    out(1L) shouldBe ((1.0, 0.0, false))
    out(2L) shouldBe ((1.0, 0.0, false))
  }

  test("ngramSearch: needle-identical doc scores 1/0, disjoint doc 0/1, short doc empty") {
    val df = Seq(
      (0L, TextAnalysis.NgramNeedle),   // exactly the needle
      (1L, "zzzz qqqq wwww xxxx yyyy"), // no 4-gram shared with needle
      (2L, "ab"),                       // shorter than one gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramSearch(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_gram_hay"), r.getAs[Double]("search_frac"),
          r.getAs[Double]("ngram_dist")))).toMap
    out(0L)._2 shouldBe 1.0
    out(0L)._3 shouldBe 0.0
    out(1L)._2 shouldBe 0.0
    out(1L)._3 shouldBe 1.0
    out(2L)._1 shouldBe 0
    out(2L)._2 shouldBe 0.0
  }

  test("editDistance: classic Levenshtein on the normalized prefix") {
    val needle = TextAnalysis.NgramNeedle // "table value part hash"
    val df = Seq(
      (0L, "Table, VALUE part hash"),    // normalizes to the needle → 0
      (1L, "cable value part hash"),     // one substitution → 1
      (2L, "value part hash"),           // 'table ' deleted → 6
    ).toDF("doc_id", "text")
    val out = TextAnalysis.editDistance(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("edit_dist")).toMap
    needle.length should be <= TextAnalysis.EditPrefixLen // prefix covers it
    out(0L) shouldBe 0
    out(1L) shouldBe 1
    out(2L) shouldBe 6
  }

  test("lmScore: brute-force add-one bigram LM on a handmade corpus") {
    // corpus: docs over a tiny vocab; expected score computed by a
    // direct driver-side simulation of the pinned definition
    val texts = Seq(
      0L -> "the cat sat on the mat",
      1L -> "the cat ate the cat",
      2L -> "dog",                    // 1 token → no bigrams → no row
      3L -> "",                       // 0 tokens → no row
      4L -> "zebra quark flux zebra quark",
    )
    val df = texts.toDF("doc_id", "text")

    def toks(t: String): Seq[String] =
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
    val bigrams = texts.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq
    }.toMap
    val allBg = bigrams.values.flatten.toSeq
    // hashed-bucket model (the r19 B-bounded form): joint counts per
    // (bigram-bucket, prefix-bucket), folded to per-bucket totals
    val B = TextAnalysis.LmBuckets
    def hb(b: (String, String)): Long =
      graft.functions.textops.hash60Local(b._1 + " " + b._2) % B
    def hu(b: (String, String)): Long =
      graft.functions.textops.hash60Local(b._1) % B
    val cb = allBg.groupBy(hb).view.mapValues(_.size.toLong).toMap
    val cu = allBg.groupBy(hu).view.mapValues(_.size.toLong).toMap
    def expectScore(id: Long): Option[(Long, Double)] = {
      val bs = bigrams(id)
      if (bs.isEmpty) None
      else {
        val s = bs.map(b => math.log((cb(hb(b)) + 1.0) / (cu(hu(b)) + B)) /
          math.log(2.0)).sum / bs.length
        Some((bs.length.toLong,
          BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }

    val out = TextAnalysis.lmScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_ll"))).toMap
    out.keySet shouldBe Set(0L, 1L, 4L) // <2-token docs emit no row
    Seq(0L, 1L, 4L).foreach { id =>
      val (en, es) = expectScore(id).get
      out(id)._1 shouldBe en
      out(id)._2 shouldBe es +- 1e-9
    }
    // repeated-bigram doc (4: "zebra quark" twice) scores HIGHER than
    // the equally-sized all-distinct doc under its own LM — the
    // predictability signal the filter exists for
    out(4L)._2 should be > out(0L)._2
  }
}
