package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.textops

/** Shared hashed-gram substrate for the two corpus-LM operators — t10
  * ([[TextAnalysis.lmScore]], the CCNet-shaped bigram LM) and c22
  * ([[Dsir]], hashed-n-gram importance resampling). Both train their
  * B-bounded models from the SAME expensive corpus pass (tokenize →
  * gram explode → hash → count), differing only in how they fold the
  * counts:
  *
  *  - t10's joint table = the bigram slice keyed (bkt, pfx);
  *  - c22's per-bucket raw/target counts = the sum over (big, pfx).
  *
  * [[counts]] materializes that pass ONCE (localCheckpoint — ≤ 2B²
  * rows whatever the corpus), so a curation pipeline that runs both
  * operators tokenizes the corpus once for both models instead of
  * once per model; each operator still streams the corpus once for its
  * per-doc scoring join, which no shared table can absorb (scores are
  * per-document). Fold equality with each operator's standalone count
  * pass is integer-exact (same tokens, same grams, same hash, same
  * bucket arithmetic) and spec-pinned, so the gates stay byte-stable
  * whichever path built the model.
  */
object Grams {

  /** One fixed bucket count shared by both models —
    * [[TextAnalysis.LmBuckets]] and [[Dsir.NumBuckets]] both equal it
    * (spec-pinned), which is what makes the substrate foldable. */
  val Buckets = 1024

  /** Every unigram and bigram OCCURRENCE of the corpus:
    * (doc_id, lang, big, bkt, pfx) where `bkt` hashes the gram
    * ("w1 w2" for bigrams), `pfx` hashes the first word (the LM's
    * conditioning feature; = bkt for unigrams), both mod [[Buckets]].
    * One tokenize pass, explode in place — no shuffle. The gram build
    * + hash is the fused native
    * [[graft.functions.GramBuckets]] (r21): one thread-local digest
    * per gram instead of the interpreted HOF tree that paid the
    * md5-hex-string hash60 chain twice per bigram (bit-equality with
    * that tree is spec-pinned in GramsSpec). */
  def stream(docs: DataFrame): DataFrame = {
    // the registered native expression is fixed at B=1024; a drifted
    // Buckets constant would silently mis-bucket every model
    require(Buckets == 1024,
      "Grams.Buckets moved off 1024 — re-register gram_buckets/" +
        "bigram_buckets with the new width before using the substrate")
    graft.functions.texthash.register(docs.sparkSession)
    graft.Spread.ifNarrow(docs)
      .select(col("doc_id"), col("lang"), textops.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.texthash.gramBuckets1024(col("w"))).as("e"))
      .select(col("doc_id"), col("lang"), col("e.big").as("big"),
        col("e.bkt").as("bkt"), col("e.pfx").as("pfx"))
  }

  /** The ONE materialized corpus aggregate both models fold from:
    * occurrence counts per (big, bkt, pfx) with the target-language
    * split carried. Bounded at 2·B² rows at ANY corpus size (realized
    * rows are far fewer), partial-aggregable (map-side combine eats
    * the Zipf skew), localCheckpoint-materialized so every downstream
    * fold reads the tiny table instead of re-running the corpus
    * pass. */
  def counts(docs: DataFrame, targetLang: String = "en"): DataFrame =
    stream(docs)
      .groupBy(col("big"), col("bkt"), col("pfx"))
      .agg(count(lit(1)).as("c"),
        count(when(col("lang") === lit(targetLang), lit(1))).as("ct"))
      .transform(Lineage.cut(_))
}
