package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c22 DSIR importance selection: brute-force equivalence of the
  * hashed-n-gram importance weight, and the behavioral contract — the
  * selection prefers documents from the target distribution. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importance weight equals the driver-side simulation of the pinned formula") {
    val texts = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "der hund lief im park heute", "de"),
      (2L, "the dog sat on the cat", "en"),
      (3L, "le chat est sur le tapis", "fr"),
      (4L, "the the the cat cat", "en"),
      (5L, "hund park der im heute lief", "de"),
    )
    val df = texts.toDF("doc_id", "text", "lang")

    def toks(t: String): Seq[String] =
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
    def grams(t: String): Seq[String] = {
      val w = toks(t)
      w ++ (if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq
            else Seq())
    }
    val B = Dsir.NumBuckets
    def bkt(g: String): Long = graft.functions.textops.hash60Local(g) % B
    val all = texts.flatMap { case (id, t, l) =>
      grams(t).map(g => (id, l, bkt(g)))
    }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum
    val tt = ct.values.sum
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val want = texts.map { case (id, t, _) =>
      val bs = grams(t).map(bkt)
      val s = bs.map(b => lg2((ct.getOrElse(b, 0L) + 1.0) / (tt + B)) -
        lg2((cr(b) + 1.0) / (tr + B))).sum
      id -> (bs.length.toLong,
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap

    val got = Dsir.importanceSelect(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("logw"))).toMap
    got.size shouldBe texts.length // SelectN > corpus: everything ranks
    texts.foreach { case (id, _, _) =>
      got(id)._1 shouldBe want(id)._1
      got(id)._2 shouldBe want(id)._2 +- 1e-9
    }
    // every target-language doc outranks every off-target doc on this
    // cleanly separated corpus — the importance signal itself
    val minEn = texts.filter(_._3 == "en").map(t => got(t._1)._2).min
    val maxOther = texts.filter(_._3 != "en").map(t => got(t._1)._2).max
    minEn should be > maxOther
  }

  test("scoring an arriving shard: train-unseen grams score the smoothed ratio, never drop") {
    // train on a tiny corpus, then score a shard whose grams are
    // (almost surely) all train-unseen — the s12 frozen-model ingest
    // case. The smoothed multinomial defines p for every bucket, so
    // the doc must emit a score row with FULL n_grams, logw = n_grams
    // × the unseen-bucket ratio (within rounding).
    val train = Seq(
      (0L, "the cat sat", "en"),
      (1L, "der hund lief", "de")).toDF("doc_id", "text", "lang")
    val model = Dsir.ratioTable(train).localCheckpoint()
    model.count() shouldBe Dsir.NumBuckets // total over the bucket domain
    val shard = Seq((7L, "zzq9 xkcd7 vvbb3", "fr")).toDF("doc_id", "text", "lang")
    val got = Dsir.scoreAgainst(shard, model).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("n_grams") shouldBe 5L // 3 unigrams + 2 bigrams
    // expected = the model's ratio at each gram's bucket (totality of
    // the bucket domain means every lookup hits)
    val B = Dsir.NumBuckets
    val rMap = model.collect()
      .map(r => r.getAs[Long]("bkt") -> r.getAs[Double]("r")).toMap
    val grams = Seq("zzq9", "xkcd7", "vvbb3", "zzq9 xkcd7", "xkcd7 vvbb3")
    val want = grams.map(g =>
      rMap(graft.functions.textops.hash60Local(g) % B)).sum
    got.head.getAs[Double]("logw") shouldBe want +- 1e-3
  }

  test("selection on the corpus prefers the target distribution") {
    val docs = graft.Tables.documents(spark, SparkSpec.TinySf)
    val sel = Dsir.importanceSelect(docs)
    val joined = sel.join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val n = joined.count()
    n should be > 0L
    val en = joined.filter(col("lang") === "en").count()
    // the target slice must dominate the selection (not just plurality)
    en.toDouble / n should be > 0.5
  }
}
