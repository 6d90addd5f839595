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
