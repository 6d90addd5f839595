package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkSpec

/** The t10+c22 shared gram substrate ([[Grams]], r20): fold equality
  * with each operator's standalone count pass, and the composite's
  * one-corpus-pass contract. */
class GramsSpec extends SparkSpec {

  test("bucket constants agree — the substrate is foldable") {
    // both models fold from the same (big, bkt, pfx) table only
    // because all three bucket spaces are the same modulus
    Grams.Buckets shouldBe TextAnalysis.LmBuckets
    Grams.Buckets shouldBe Dsir.NumBuckets
  }

  /** File bytes read by jobs run inside `f` (listener-drained with a
    * bounded wait). */
  private def fileBytesDuring(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          acc.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(500) } // let the listener bus drain
    finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  test("native gram_buckets/bigram_buckets are bit-identical to the declarative md5 tree they replaced") {
    import org.apache.spark.sql.functions._
    import graft.functions.textops
    val docs = graft.Tables.documents(spark, SparkSpec.TinySf)
    graft.functions.texthash.register(spark)
    val toks = docs.select(col("doc_id"), textops.tokens(col("text")).as("w"))
    // the r20 declarative reference: unigrams then bigrams, hash60 =
    // md5-hex-prefix parse, mod 1024 — the tree Grams.stream/Dsir/t10
    // built before the fused native pass
    val ref = toks.select(col("doc_id"), explode(expr(
        "concat(" +
          "transform(w, x -> named_struct('g', x, 'p', x, 'big', false)), " +
          "CASE WHEN size(w) >= 2 THEN " +
          "transform(sequence(1, size(w) - 1), i -> named_struct(" +
          "'g', concat_ws(' ', element_at(w, i), element_at(w, i + 1)), " +
          "'p', element_at(w, i), 'big', true)) " +
          "ELSE CAST(array() AS ARRAY<STRUCT<g: STRING, p: STRING, big: BOOLEAN>>) END)"))
        .as("e"))
      .select(col("doc_id"), col("e.big").as("big"),
        pmod(textops.hash60(col("e.g")), lit(1024L)).as("bkt"),
        pmod(textops.hash60(col("e.p")), lit(1024L)).as("pfx"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val native = toks.select(col("doc_id"),
        explode(graft.functions.texthash.gramBuckets1024(col("w"))).as("e"))
      .select(col("doc_id"), col("e.big"), col("e.bkt"), col("e.pfx"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    native shouldBe ref
    // the bigramsOnly arm is exactly the big=true slice
    val bigRef = ref.filter(_._2)
    val bigNative = toks.select(col("doc_id"),
        explode(graft.functions.texthash.bigramBuckets1024(col("w"))).as("e"))
      .select(col("doc_id"), col("e.big"), col("e.bkt"), col("e.pfx"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    bigNative shouldBe bigRef
    // edge shapes: empty and single-token arrays
    import spark.implicits._
    val edges = Seq(Seq.empty[String], Seq("one"), Seq("a", "b")).toDF("w")
    edges.select(org.apache.spark.sql.functions.size(
        graft.functions.texthash.gramBuckets1024(col("w"))))
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(0, 1, 3)
    edges.select(org.apache.spark.sql.functions.size(
        graft.functions.texthash.bigramBuckets1024(col("w"))))
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(0, 0, 1)
  }

  test("composite t10+c22: both models fold from ONE materialized count table, outputs byte-equal to standalone") {
    val docs = graft.Tables.documents(spark, SparkSpec.TinySf)
    graft.functions.texthash.register(spark)

    // standalone gates (each runs its own corpus count pass)
    val t10Alone = TextAnalysis.lmScore(docs).collect().toSeq
    val c22Alone = Dsir.importanceSelect(docs).collect().toSeq

    // the shared substrate: ONE corpus tokenize+count, materialized
    val shared = Grams.counts(docs)

    // building both models from it re-reads ZERO corpus bytes — the
    // folds run over the checkpointed table (standalone model builds
    // read the parquet corpus here instead: that is the saved pass)
    var t10c: org.apache.spark.sql.DataFrame = null
    var c22c: org.apache.spark.sql.DataFrame = null
    val foldBytes = fileBytesDuring {
      t10c = TextAnalysis.lmScore(docs, Some(shared))
      c22c = Dsir.importanceSelect(docs, "en", Some(shared))
    }
    foldBytes shouldBe 0L

    // and the results are exactly the standalone gates' — the fold is
    // integer-identical to each operator's own count pass
    t10c.collect().toSeq shouldBe t10Alone
    c22c.collect().toSeq shouldBe c22Alone
  }
}
