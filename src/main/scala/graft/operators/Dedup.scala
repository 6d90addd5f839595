package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{textops, vectors}

/** Training-data deduplication (SURVEY §2, d1–d5).
  *
  * The capability block a large-scale LLM-data pipeline needs on top of
  * the reference's query surface. Every operator is shuffle-conscious:
  * candidate generation is always `explode → groupBy/join on a bucket
  * key` (content hash, shingle, LSH band, simhash chunk, sign block) —
  * never an all-pairs cross join — so the 100 TB cost is one shuffle of
  * the exploded keys, and pair verification only happens inside buckets.
  *
  * Core functions take DataFrames (unit-testable on in-memory data);
  * the `*Query` wrappers bind them to the driver's parquet testdata.
  * Hashing is md5-derived ([[textops.hash60]]) so every operator —
  * including MinHash and SimHash, usually "trust me" territory — has an
  * exact DuckDB oracle twin in [[Dedup.oracles]].
  */
object Dedup {

  /** Frequent-shingle cap: shingles appearing in more docs than this are
    * dropped before pair generation (both engines). A shingle shared by
    * 10^6 docs at 100 TB would otherwise emit 10^12 candidate pairs —
    * classic hot-key skew; dropping it loses no near-dup signal. */
  val MaxShingleDf = 1000

  /** LSH bucket cap for MinHash banding, same skew rationale. */
  val MaxBandBucket = 200

  // ---------------------------------------------------------------- d1

  /** d1: exact dedup via content hash. Input is the corpus plus a
    * simulated re-crawl of every 10th doc (offset ids), because the
    * synthetic corpus itself is duplicate-free — the operator's job is
    * to find and collapse the copies. One groupBy on md5(text): at
    * 100 TB this is a single shuffle of (16-byte hash, id) pairs, with
    * map-side partial aggregation. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val recrawl = base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    base.union(recrawl)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      .filter(col("n_copies") > 1)
      .orderBy(col("content_hash"))
  }

  def d1Query(s: SparkSession, d: String): DataFrame =
    exactDedup(Tables.documents(s, d))

  // ---------------------------------------------------------------- d2

  /** Distinct 3-word shingles per doc, dropping shingle-less docs. */
  private def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), textops.shingles(textops.tokens(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)

  /** d2: n-gram Jaccard near-dup pairs. Explode shingles, drop hot
    * shingles (df > [[MaxShingleDf]]), self-join on the shingle key to
    * count common shingles per pair, then Jaccard over the original
    * distinct-shingle set sizes. The join key is the shingle — pairs
    * only materialise for docs that actually share one. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = docShingles(docs)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val hot = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxShingleDf).select(col("g"))
    val pruned = ex.join(hot, Seq("g"), "left_anti")
    val common = pruned.as("a")
      .join(pruned.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("sa.n") + col("sb.n") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def d2Query(s: SparkSession, d: String): DataFrame =
    ngramJaccard(Tables.documents(s, d))

  // ---------------------------------------------------------------- d3

  val MinHashFns = 32
  val BandRows = 4 // → 8 bands of 4 signature rows

  /** d3: MinHash + LSH banding. Signature h of a doc = min over its
    * shingles of hash60(shingle:h); band key = xor of the band's 4
    * signature rows (order-independent, so no collect_list ordering
    * hazard). Docs sharing any (band, key) bucket become candidates —
    * the self-join is on the bucket key, so cost scales with bucket
    * occupancy, not corpus². Oversized buckets (skew) are dropped by
    * [[MaxBandBucket]]. */
  def minhashLsh(docs: DataFrame): DataFrame = {
    val ex = docShingles(docs).select(col("doc_id"), explode(col("sh")).as("g"))
    val sig = ex
      .select(col("doc_id"), col("g"),
        explode(sequence(lit(0), lit(MinHashFns - 1))).as("h"))
      .withColumn("hv",
        textops.hash60(concat(col("g"), lit(":"), col("h").cast("string"))))
      .groupBy(col("doc_id"), col("h"))
      .agg(min(col("hv")).as("mh"))
    val bands = sig
      .withColumn("band", expr(s"h div $BandRows"))
      .groupBy(col("doc_id"), col("band"))
      .agg(expr("bit_xor(mh)").as("bkey"))
    val bucketed = bands.withColumn("bn",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bkey"))))
      .filter(col("bn") <= MaxBandBucket)
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def d3Query(s: SparkSession, d: String): DataFrame =
    minhashLsh(Tables.documents(s, d))

  // ---------------------------------------------------------------- d4

  val SimHashBits = 60 // hash60 width

  /** Per-doc 60-bit SimHash over distinct 3-word shingles: bit b is set
    * when more shingle hashes have bit b set than unset. Shingles, not
    * unigrams: on a small-vocabulary corpus every doc has nearly the
    * same distinct-token SET, which collapses unigram SimHash to ~0
    * hamming everywhere; shingle sets are distinctive. Two explodes
    * (shingles × bit positions) feed partial-aggregated groupBys — all
    * map-side combinable, no all-pairs work. */
  def simhash(docs: DataFrame): DataFrame = {
    val ex = docShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("w"))
      .withColumn("th", textops.hash60(col("w")))
    ex.select(col("doc_id"), col("th"),
        explode(sequence(lit(0), lit(SimHashBits - 1))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(expr("shiftright(th, b) & 1") === 1, 1L).otherwise(-1L)).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("simhash"))
  }

  /** d4: SimHash near-dup pairs. Candidate generation splits the 60-bit
    * hash into 4 chunks of 15 bits and joins on (chunk index, chunk
    * value) — by pigeonhole, any pair within hamming distance 3 shares
    * at least one exact chunk, so the bucket join finds every such pair
    * without comparing all pairs. Verification = bit_count(xor) on the
    * survivors. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    val sh = simhash(docs)
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("ck", expr("shiftright(simhash, c * 15) & 32767"))
    val cand = chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def d4Query(s: SparkSession, d: String): DataFrame =
    simhashPairs(Tables.documents(s, d))

  // ---------------------------------------------------------------- d5

  /** d5: embedding-cosine near-dup pairs with sign-block candidate
    * generation: vectors are bucketed by the sign bits of their first
    * two components (an axis-aligned 2-plane LSH), exact cosine runs
    * only within a bucket. The block join key keeps the self-join
    * linear in bucket occupancy; recall is traded explicitly (pairs
    * straddling a sign boundary are missed — more planes/tables tighten
    * this, see [[Ann]] for the general LSH machinery). */
  def embeddingNearDup(embs: DataFrame, maxDistance: Double = 0.55): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"),
      ((element_at(col("embedding"), 1) >= 0).cast("int") * 2 +
        (element_at(col("embedding"), 2) >= 0).cast("int")).as("blk"))
    e.as("a")
      .join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("score",
        vectors.cosineDistance(col("a.embedding"), col("b.embedding")))
      .filter(col("score") <= maxDistance)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("score"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def d5Query(s: SparkSession, d: String): DataFrame = {
    vectors.register(s)
    embeddingNearDup(Tables.embeddings(s, d))
  }

  // ------------------------------------------------------------ oracles

  private val toksSql = textops.tokensSql("text")
  private val shSql = textops.shinglesSql("t")

  /** DuckDB twins, exact to the bit (see [[textops]] for the shared
    * primitives). */
  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |       min(doc_id) AS keeper
        |FROM all_docs GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, $shSql AS s FROM toks),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh2),
         |hot AS (SELECT g FROM ex GROUP BY g HAVING count(*) > $MaxShingleDf),
         |pruned AS (SELECT * FROM ex WHERE g NOT IN (SELECT g FROM hot)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |  FROM pruned a JOIN pruned b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh2)
         |SELECT doc_a, doc_b, common,
         |       round(common * 1.0 / (sa.n + sb.n - common), 4) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
         |ORDER BY 1, 2""".stripMargin,
    "d3_minhash_lsh" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, $shSql AS s FROM toks),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh2),
         |hx AS (SELECT doc_id, g, h,
         |         ${graft.functions.textops.hash60Sql("g || ':' || h::VARCHAR")} AS hv
         |       FROM ex CROSS JOIN (SELECT unnest(range(0, $MinHashFns)) AS h)),
         |sig AS (SELECT doc_id, h, min(hv) AS mh FROM hx GROUP BY 1, 2),
         |bk AS (SELECT doc_id, h // $BandRows AS band, bit_xor(mh) AS bkey
         |       FROM sig GROUP BY 1, 2),
         |sized AS (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bn FROM bk),
         |keep AS (SELECT * FROM sized WHERE bn <= $MaxBandBucket)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
         |FROM keep a JOIN keep b
         |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d4_simhash" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |shl AS (SELECT doc_id, $shSql AS s FROM toks),
         |ex AS (SELECT doc_id, unnest(s) AS w FROM shl WHERE len(s) > 0),
         |hx AS (SELECT doc_id, ${graft.functions.textops.hash60Sql("w")} AS th FROM ex),
         |bits AS (SELECT doc_id, b,
         |           sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |         FROM hx CROSS JOIN (SELECT unnest(range(0, $SimHashBits)) AS b)
         |         GROUP BY 1, 2),
         |sh AS (SELECT doc_id,
         |         sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
         |       FROM bits GROUP BY 1),
         |chunks AS (SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS ck
         |           FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                a.simhash AS sa, b.simhash AS sb
         |         FROM chunks a JOIN chunks b
         |           ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INTEGER AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 12
         |ORDER BY 1, 2""".stripMargin,
    "d5_embedding_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) * 2 +
        |         (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END) AS blk
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       1.0 - list_cosine_similarity(a.emb, b.emb) AS score
        |FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
        |WHERE 1.0 - list_cosine_similarity(a.emb, b.emb) <= 0.55
        |ORDER BY 1, 2""".stripMargin,
  )
}
