package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.textops

/** Training-data text analysis (SURVEY §2, t1–t5).
  *
  * Everything is built from codegen'd builtin functions — split /
  * regexp / size / md5 / array lambdas — no UDFs, so each per-doc
  * computation stays inside WholeStageCodegen and scales as a pure map
  * over the corpus (zero shuffles except the final presentation
  * aggregate/sort). Stopword lists and formulas are shared verbatim
  * with the DuckDB oracle twins in [[TextAnalysis.oracles]].
  */
object TextAnalysis {

  /** Per-language stopword lists (tiny, public common-word sets). One
    * Scala constant feeds both the Spark plan and the generated oracle
    * SQL so they cannot drift. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "du", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "para", "por", "con", "como"),
  )

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Spread the corpus across cores before the per-doc token work —
    * conditional: a no-op when the scan is already wide (100 TB), a
    * round-robin exchange on the sandbox's few-split corpus (see
    * [[graft.Spread.ifNarrow]]). */
  private def spread(docs: DataFrame): DataFrame = graft.Spread.ifNarrow(docs)

  // ---------------------------------------------------------------- t1

  /** t1: stopword-vote language ID. Scores = stopword hit counts per
    * language; argmax with a fixed en≥de≥fr≥es tie-break (expressed as
    * the same CASE chain in both engines). Output is the
    * truth-vs-predicted confusion matrix.
    *
    * All four language scores come from ONE native pass over the token
    * array ([[graft.functions.StopwordCounts]]); the declarative
    * per-list `size(filter(t, x IN list))` walked the array once per
    * language through an interpreted lambda. The oracle keeps the
    * declarative SQL form, so the two implementations cross-check. */
  def langId(docs: DataFrame): DataFrame = {
    graft.functions.textstats.register(docs.sparkSession)
    val t = textops.tokens(col("text"))
    val scored = spread(docs)
      .select(col("doc_id"), col("lang"),
        graft.functions.textstats.stopwordCounts(t, Stopwords.map(_._2)).as("sw"))
      .select(
        col("doc_id"), col("lang"),
        element_at(col("sw"), 1).as("s_en"),
        element_at(col("sw"), 2).as("s_de"),
        element_at(col("sw"), 3).as("s_fr"),
        element_at(col("sw"), 4).as("s_es"))
    scored.withColumn("pred_lang",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  def t1Query(s: SparkSession, d: String): DataFrame =
    langId(Tables.documents(s, d))

  /** t1's stopword-vote winner as a reusable column (same one-pass
    * native scoring, same en≥de≥fr≥es tie-break) — c8's pipeline gate
    * composes it without re-deriving the vote. */
  private[operators] def predLangCol(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val sw = graft.functions.textstats.stopwordCounts(t, Stopwords.map(_._2))
    val (se, sd, sf, ss) = (element_at(sw, 1), element_at(sw, 2),
      element_at(sw, 3), element_at(sw, 4))
    when(se >= sd && se >= sf && se >= ss, "en")
      .when(sd >= sf && sd >= ss, "de")
      .when(sf >= ss, "fr")
      .otherwise("es")
  }

  /** t2's clipped linear quality score as a reusable column (identical
    * arithmetic — any drift from t2 fails both oracles). */
  private[operators] def qualityScoreCol(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val nTok = size(t)
    val nStop = element_at(
      graft.functions.textstats.stopwordCounts(t, Seq(Stopwords(0)._2)), 1)
    round(least(lit(1.0),
      lit(0.2) + lit(2.0) * when(nTok === 0, 0.0)
        .otherwise(nStop.cast("double") / nTok) +
        least(nTok.cast("double"), lit(100.0)) / lit(500.0)), 4)
  }

  // ---------------------------------------------------------------- t2

  /** t2: per-doc quality scoring from length / whitespace / stopword
    * ratios, combined by a clipped linear formula (deliberately no
    * exp/log — libm rounding differs across engines; +,-,*,/ are IEEE
    * correctly-rounded everywhere). */
  def quality(docs: DataFrame): DataFrame = {
    graft.functions.textstats.register(docs.sparkSession)
    val t = textops.tokens(col("text"))
    spread(docs).select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        size(t).as("n_tokens"),
        graft.functions.textstats.tokenCharSum(t).as("tok_chars"),
        element_at(graft.functions.textstats.stopwordCounts(
          t, Seq(Stopwords(0)._2)), 1).as("n_stop"))
      .withColumn("avg_token_len",
        when(col("n_tokens") === 0, 0.0).otherwise(
          round(col("tok_chars").cast("double") / col("n_tokens"), 4)))
      .withColumn("stop_ratio",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(round(col("n_stop").cast("double") / col("n_tokens"), 4)))
      .withColumn("quality",
        round(least(lit(1.0),
          lit(0.2) + lit(2.0) * when(col("n_tokens") === 0, 0.0)
            .otherwise(col("n_stop").cast("double") / col("n_tokens")) +
            least(col("n_tokens").cast("double"), lit(100.0)) / lit(500.0)), 4))
      .select(col("doc_id"), col("len_chars"), col("n_tokens"),
        col("avg_token_len"), col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))
  }

  def t2Query(s: SparkSession, d: String): DataFrame =
    quality(Tables.documents(s, d))

  // ---------------------------------------------------------------- t3

  /** BPE-ish pre-tokenizer: runs of alnum, or single non-alnum
    * non-space chars — the standard byte-pair pre-split shape. */
  val BpePattern = "[a-z0-9]+|[^a-z0-9\\s]"

  /** t3: token counting — whitespace tokens vs regex pre-tokens, plus
    * chars-per-token (the quick LLM-cost estimator). */
  def tokenCounts(docs: DataFrame): DataFrame =
    spread(docs).select(
        col("doc_id"),
        size(textops.tokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)))
          .as("n_bpe_tokens"),
        length(col("text")).as("len_chars"))
      .withColumn("chars_per_token",
        when(col("n_bpe_tokens") === 0, 0.0).otherwise(
          round(col("len_chars").cast("double") / col("n_bpe_tokens"), 4)))
      .orderBy(col("doc_id"))

  def t3Query(s: SparkSession, d: String): DataFrame =
    tokenCounts(Tables.documents(s, d))

  // ---------------------------------------------------------------- t4

  /** t4: content fingerprint — md5 of the whitespace-collapsed,
    * punctuation-stripped lowercase normal form, with the per-
    * fingerprint group size alongside (the dedup-ready key).
    *
    * Group size via `groupBy(fingerprint).count()` + an equi-join back,
    * not `count(*) OVER (PARTITION BY fingerprint)`: the window would
    * shuffle AND sort every row, while the aggregate is map-side
    * combinable and the join back shuffles only (fingerprint, count)
    * rows on one side — the same window→aggregate swap d3/d5 use for
    * their skew caps. */
  def fingerprint(docs: DataFrame): DataFrame = {
    // normalize_text resolves via the function registry: register for
    // sessions not built through GraftSession (library embedders)
    graft.functions.texthash.register(docs.sparkSession)
    val fp = md5(textops.normalizeText(col("text")))
    val keyed = spread(docs).select(col("doc_id"), fp.as("fingerprint"))
    val sizes = keyed.groupBy(col("fingerprint")).agg(count(lit(1)).as("n_same"))
      .withColumnRenamed("fingerprint", "fp_grp")
    // NULL-SAFE key (<=>): a NULL text row has a NULL fingerprint; a
    // plain equi-join would silently DROP those rows, while the
    // oracle's `count(*) OVER (PARTITION BY fp)` keeps them as one
    // NULL peer group (and Spark's groupBy groups NULL keys the same
    // way). <=> makes both engines agree on nullable text instead of
    // relying on the current corpus being non-null.
    keyed.join(sizes, keyed("fingerprint") <=> sizes("fp_grp"))
      .select(col("doc_id"), col("fingerprint"), col("n_same"))
      .orderBy(col("doc_id"))
  }

  def t4Query(s: SparkSession, d: String): DataFrame =
    fingerprint(Tables.documents(s, d))

  // ---------------------------------------------------------------- t5

  /** Repetition flag threshold: docs whose duplicate-shingle fraction
    * exceeds this are marked repetitive (the published corpus-quality
    * filters — Gopher's repetition rules, RefinedWeb — cut on exactly
    * this family of ratios; real corpora use cuts around 0.1–0.35).
    * 0.01 here: the synthetic word-soup corpus has near-zero natural
    * repetition, and a higher cut would flag NOTHING — an all-false
    * column the oracle can't discriminate (the q12/q17 vacuous-check
    * lesson). At 0.01 ~5% of test docs flag, so both branches of the
    * predicate are exercised cross-engine. */
  val DupShingleFlag = 0.01

  /** t5: within-document repetition ratios — the quality signal t2's
    * surface ratios can't see: a doc that loops the same phrases has
    * fine length/punctuation stats but a high duplicate-n-gram
    * fraction. Two ratios, both pure codegen'd expressions (no
    * explode, no shuffle — array sizes only):
    *  - `uniq_token_frac` = distinct tokens / tokens;
    *  - `dup_shingle_frac` = 1 − distinct 3-shingles / total 3-shingles.
    * Single integer divisions — bit-identical across engines, no
    * rounding. */
  def repetition(docs: DataFrame): DataFrame = {
    // native single-pass shingle build (the declarative
    // [[textops.shingles]] transform-lambda is interpreted per element;
    // same set/order — cross-checked in the texthash spec)
    graft.functions.texthash.register(docs.sparkSession)
    val t = textops.tokens(col("text"))
    spread(docs)
      .select(col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).cast("long").as("n_uniq_tokens"),
        greatest(size(t) - 2, lit(0)).cast("long").as("n_shingles_total"),
        size(graft.functions.texthash.wordShingles(t)).cast("long")
          .as("n_shingles_uniq"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          col("n_uniq_tokens").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("uniq_token_frac"),
        col("n_shingles_total"),
        when(col("n_shingles_total") > 0,
          lit(1.0) - col("n_shingles_uniq").cast("double") /
            col("n_shingles_total"))
          .otherwise(lit(0.0)).as("dup_shingle_frac"))
      .withColumn("repetitive", col("dup_shingle_frac") > DupShingleFlag)
      .orderBy(col("doc_id"))
  }

  def t5Query(s: SparkSession, d: String): DataFrame =
    repetition(Tables.documents(s, d))

  // ---------------------------------------------------------------- t6

  /** Needle for t6/t7 — vocabulary words from the synthetic corpus, so
    * gram overlap is dense and both match branches are exercised. One
    * Scala constant feeds the Spark plan AND the oracle SQL. */
  val NgramNeedle = "table value part hash"
  /** t7's comparison prefix length (chars of the normal form). */
  val EditPrefixLen = 24

  /** Distinct character 4-grams of a (normalized) string column —
    * ClickHouse's ngram tokenizer, as the NATIVE
    * [[graft.functions.CharGrams]] expression. The HOF form
    * (`transform(sequence(1, len-3), i -> substr(c, i, 4))`) inlines
    * the child into the lambda, so a COMPUTED child (t6 normalizes
    * with two regex passes) re-evaluates per gram index — O(len)
    * regex passes per row; measured 178s → <2s at sf0.1 when this
    * switched to the native expression (child evaluated once). */
  private[operators] def charGrams(c: Column): Column =
    graft.functions.texthash.charGrams4(c)

  private def charGramsSql(t: String): String =
    s"CASE WHEN length($t) >= 4 THEN list_distinct([substr($t, i, 4) for i in range(1, length($t) - 2)]) ELSE []::VARCHAR[] END"

  /** t6: n-gram similarity search — ClickHouse `ngramSearch` /
    * `ngramDistance(haystack, needle)` — every document scored against
    * the constant needle by distinct-char-4-gram overlap:
    *  - `search_frac` = |hay ∩ needle| / |needle| (asymmetric: how much
    *    of the needle the document covers — ngramSearch);
    *  - `ngram_dist` = 1 − 2·|∩| / (|hay| + |needle|) (symmetric —
    *    ngramDistance).
    * The needle's gram set is the SAME expression over a literal, so
    * Catalyst constant-folds it; the per-doc work is one codegen'd
    * array pass, no shuffle. Single integer divisions — bit-identical
    * across engines, no rounding. */
  def ngramSearch(docs: DataFrame): DataFrame = {
    graft.functions.texthash.register(docs.sparkSession)
    val hay = charGrams(textops.normalizeText(col("text")))
    val needle = charGrams(textops.normalizeText(lit(NgramNeedle)))
    spread(docs)
      .select(col("doc_id"), hay.as("hg"), needle.as("ng"))
      .select(col("doc_id"),
        size(col("hg")).as("n_gram_hay"),
        size(array_intersect(col("hg"), col("ng"))).as("n_hit"))
      .select(col("doc_id"), col("n_gram_hay"), col("n_hit"),
        (col("n_hit").cast("double") /
          size(charGrams(textops.normalizeText(lit(NgramNeedle)))))
          .as("search_frac"),
        (lit(1.0) - lit(2.0) * col("n_hit") /
          (col("n_gram_hay") +
            size(charGrams(textops.normalizeText(lit(NgramNeedle))))))
          .as("ngram_dist"))
      .orderBy(col("doc_id"))
  }

  def t6Query(s: SparkSession, d: String): DataFrame =
    ngramSearch(Tables.documents(s, d))

  // ---------------------------------------------------------------- t7

  /** t7: edit distance — ClickHouse `editDistance(a, b)` — Levenshtein
    * between each document's normalized [[EditPrefixLen]]-char prefix
    * and the constant needle. Bounded-prefix comparison is the shape
    * that survives scale: Levenshtein is O(|a|·|b|) per row, so an
    * unbounded doc-length distance would be quadratic in document
    * size; clamping one side caps per-row cost at prefix×needle.
    * Exact integer result — both engines implement classic
    * Wagner-Fischer, no fp contract needed. */
  def editDistance(docs: DataFrame): DataFrame = {
    graft.functions.texthash.register(docs.sparkSession)
    spread(docs)
      .select(col("doc_id"),
        textops.normalizeText(col("text")).substr(1, EditPrefixLen)
          .as("prefix"))
      .select(col("doc_id"), col("prefix"),
        levenshtein(col("prefix"), lit(NgramNeedle)).as("edit_dist"))
      .orderBy(col("doc_id"))
  }

  def t7Query(s: SparkSession, d: String): DataFrame =
    editDistance(Tables.documents(s, d))

  // --------------------------------------------------------------- t10

  /** t10 model size: bigrams and prefixes hash into this many fixed
    * buckets ([[graft.operators.Dsir.NumBuckets]]'s discipline), so
    * BOTH model tables are B-bounded at any corpus size. */
  val LmBuckets = 1024

  /** t10: bigram language-model quality scoring — the CCNet
    * perplexity-filter shape (Wenzek et al. 2020, public method:
    * score each document under a smoothed n-gram LM, drop the tail).
    * The LM is an add-one-smoothed HASHED bigram model trained on the
    * corpus itself (feature hashing — the DSIR/c22 discipline: grams
    * land in [[LmBuckets]] fixed buckets, so the model is B-bounded
    * by construction); each doc's score is its mean bigram
    * log2-likelihood (higher = more language-like; gibberish and
    * boilerplate land in the tails — the filter signal).
    *
    * Scale shape (r19 — replaces the raw-vocabulary model): the
    * pre-r19 model grew with the vocabulary (not broadcastable at
    * scale) and its score join shuffled the full corpus bigram stream
    * on NATURAL-LANGUAGE keys — the hottest bigram is a constant
    * fraction of any corpus (Zipf), so one task owned ~1 % of the
    * stream. Hashing removes both failure modes: tokenize+explode is
    * one corpus map; the JOINT (bigram-bucket, prefix-bucket) counts
    * are ONE partial-aggregable corpus aggregate, checkpoint-
    * materialized at ≤ B² rows; bigram-bucket and prefix-bucket
    * totals FOLD from the joint table (never a second corpus pass);
    * scoring is two ≤ B-row BROADCAST joins onto the bigram stream —
    * no shuffle keyed on grams exists anywhere, so Zipf skew lands
    * harmlessly inside map-side partials. Smoothing denominator is
    * the fixed bucket count (add-one over B possible continuations —
    * the hashed model's event space). The per-doc mean of a double
    * sum is order-dependent → round(4) on both engines (the
    * contract's discipline). Docs with < 2 tokens have no bigrams and
    * no score row (pinned on both engines). */
  def lmScore(docs: DataFrame,
      sharedCounts: Option[DataFrame] = None): DataFrame = {
    require(LmBuckets == 1024, // the registered expression's fixed width
      "LmBuckets moved off 1024 — re-register bigram_buckets first")
    graft.functions.texthash.register(docs.sparkSession)
    val toks = spread(docs)
      .select(col("doc_id"), textops.tokens(col("text")).as("w"))
    // fused native bigram pass ([[graft.functions.GramBuckets]],
    // bigramsOnly — r21): each bigram's (hb, hu) from one thread-local
    // digest walk instead of the interpreted HOF tree that paid the
    // md5-hex-string hash60 chain twice per bigram. < 2-token docs
    // yield an empty array and explode to nothing — the same no-score
    // contract the size filter pinned (kept as a cheap prefilter).
    val bg = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.texthash.bigramBuckets1024(col("w"))).as("b"))
      .select(col("doc_id"),
        col("b.bkt").as("hb"), col("b.pfx").as("hu"))
    // localCheckpoint: the ≤ B²-row joint count table feeds both model
    // folds — materialize it ONCE instead of re-running the corpus
    // aggregate per reference (the r14 double-broadcast lesson). A
    // pipeline that also runs c22 hands in the SHARED substrate
    // ([[Grams.counts]], r20) instead — its bigram slice is the same
    // table integer-for-integer (spec-pinned), and the corpus
    // tokenize+count pass runs once for both models.
    val joint = sharedCounts match {
      case Some(sc) => sc.filter(col("big"))
        .select(col("bkt").as("hb"), col("pfx").as("hu"), col("c"))
      case None =>
        bg.groupBy(col("hb"), col("hu")).agg(count(lit(1)).as("c"))
          .transform(Lineage.cut(_))
    }
    val cbs = joint.groupBy(col("hb")).agg(sum(col("c")).as("cb"))
    val cus = joint.groupBy(col("hu")).agg(sum(col("c")).as("cu"))
    bg.join(broadcast(cbs), Seq("hb"))
      .join(broadcast(cus), Seq("hu"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log2((col("cb") + lit(1.0)) /
            (col("cu") + lit(LmBuckets)))) /
          count(lit(1)), 4).as("avg_ll"))
      .orderBy(col("doc_id"))
  }

  def t10Query(s: SparkSession, d: String): DataFrame =
    lmScore(Tables.documents(s, d))

  // ------------------------------------------------------------ oracles

  private val toksSql = textops.tokensSql("text")
  private[operators] def countInSql(ws: Seq[String]): String =
    s"len(list_filter(t, x -> list_contains(${sqlList(ws)}, x)))"

  val oracles: Map[String, String] = Map(
    "t10_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents),
         |bg AS (
         |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
         |  FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
         |  WHERE len(w) >= 2),
         |b AS (
         |  SELECT doc_id,
         |    ${textops.hash60Sql("w1 || ' ' || w2")} % $LmBuckets AS hb,
         |    ${textops.hash60Sql("w1")} % $LmBuckets AS hu
         |  FROM bg),
         |jc AS (SELECT hb, hu, count(*) AS c FROM b GROUP BY 1, 2),
         |cbs AS (SELECT hb, CAST(sum(c) AS BIGINT) AS cb FROM jc GROUP BY 1),
         |cus AS (SELECT hu, CAST(sum(c) AS BIGINT) AS cu FROM jc GROUP BY 1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(sum(log2((cb + 1.0) / (cu + $LmBuckets))) / count(*), 4)
         |    AS avg_ll
         |FROM b JOIN cbs USING (hb) JOIN cus USING (hu)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t1_langid" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    ${countInSql(Stopwords(0)._2)} AS s_en,
         |    ${countInSql(Stopwords(1)._2)} AS s_de,
         |    ${countInSql(Stopwords(2)._2)} AS s_fr,
         |    ${countInSql(Stopwords(3)._2)} AS s_es
         |  FROM (SELECT doc_id, lang, $toksSql AS t FROM documents))
         |SELECT lang,
         |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS pred_lang,
         |  count(*) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t2_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id, length(text)::INTEGER AS len_chars,
         |         len(t)::INTEGER AS n_tokens,
         |         list_sum(list_transform(t, x -> length(x))) AS tok_chars,
         |         ${countInSql(Stopwords(0)._2)} AS n_stop
         |  FROM (SELECT doc_id, text, $toksSql AS t FROM documents))
         |SELECT doc_id, len_chars, n_tokens,
         |  CASE WHEN n_tokens = 0 THEN 0.0
         |       ELSE round(tok_chars * 1.0 / n_tokens, 4) END
         |    AS avg_token_len,
         |  CASE WHEN n_tokens = 0 THEN 0.0
         |       ELSE round(n_stop * 1.0 / n_tokens, 4) END AS stop_ratio,
         |  round(least(1.0,
         |    0.2 + 2.0 * (CASE WHEN n_tokens = 0 THEN 0.0
         |                      ELSE n_stop * 1.0 / n_tokens END) +
         |    least(n_tokens * 1.0, 100.0) / 500.0), 4) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "t3_tokens" ->
      s"""SELECT doc_id,
         |  len($toksSql)::INTEGER AS n_ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))::INTEGER AS n_bpe_tokens,
         |  length(text)::INTEGER AS len_chars,
         |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) = 0
         |       THEN 0.0
         |       ELSE round(length(text) * 1.0 /
         |         len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')), 4)
         |  END AS chars_per_token
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      s"""SELECT doc_id, md5(${textops.normalizeSql("text")}) AS fingerprint,
         |  count(*) OVER (PARTITION BY md5(${textops.normalizeSql("text")})) AS n_same
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t5_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |m AS (SELECT doc_id, len(t)::BIGINT AS n_tokens,
         |             len(list_distinct(t))::BIGINT AS n_uniq,
         |             greatest(len(t) - 2, 0)::BIGINT AS n_shingles_total,
         |             len(${textops.shinglesSql("t")})::BIGINT AS n_shingles_uniq
         |      FROM toks)
         |SELECT doc_id, n_tokens,
         |  CASE WHEN n_tokens > 0 THEN n_uniq::DOUBLE / n_tokens
         |       ELSE 0.0 END AS uniq_token_frac,
         |  n_shingles_total,
         |  CASE WHEN n_shingles_total > 0
         |       THEN 1.0 - n_shingles_uniq::DOUBLE / n_shingles_total
         |       ELSE 0.0 END AS dup_shingle_frac,
         |  (CASE WHEN n_shingles_total > 0
         |        THEN 1.0 - n_shingles_uniq::DOUBLE / n_shingles_total
         |        ELSE 0.0 END) > $DupShingleFlag AS repetitive
         |FROM m ORDER BY doc_id""".stripMargin,
    "t6_ngram_search" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, ${textops.normalizeSql("text")} AS t FROM documents),
         |g AS (
         |  SELECT doc_id, ${charGramsSql("t")} AS hg,
         |    ${charGramsSql(s"'$NgramNeedle'")} AS ng
         |  FROM nrm),
         |m AS (
         |  SELECT doc_id, len(hg)::INTEGER AS n_gram_hay, len(ng) AS n_ng,
         |    len(list_filter(hg, x -> list_contains(ng, x)))::INTEGER AS n_hit
         |  FROM g)
         |SELECT doc_id, n_gram_hay, n_hit,
         |  n_hit::DOUBLE / n_ng AS search_frac,
         |  1.0 - 2.0 * n_hit / (n_gram_hay + n_ng) AS ngram_dist
         |FROM m ORDER BY doc_id""".stripMargin,
    "t7_edit_distance" ->
      s"""SELECT doc_id,
         |  substr(${textops.normalizeSql("text")}, 1, $EditPrefixLen) AS prefix,
         |  levenshtein(substr(${textops.normalizeSql("text")}, 1, $EditPrefixLen),
         |    '$NgramNeedle')::INTEGER AS edit_dist
         |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
