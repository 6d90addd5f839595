package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vectors

/** LAION vector-search surface (SURVEY §2, v1–v8).
  *
  * Re-expresses `search.py:20-33` — `SELECT url, caption,
  * L2Distance(column, features) AS score FROM table [WHERE f]
  * ORDER BY score ASC LIMIT k` — as Spark plans. The distance is a
  * native codegen'd Catalyst expression (graft.functions), and the
  * ORDER BY score LIMIT k becomes TakeOrderedAndProject: every
  * partition keeps a k-heap while scanning at codegen speed, the driver
  * merges P×k candidates. That is the correct distributed brute-force
  * knn at 100 TB — no global sort, no shuffle of the corpus.
  *
  * Query vectors are driver-side literals, exactly like the reference
  * (CLIP runs client-side; the engine sees a constant array). Values
  * are n/64 binary fractions so float/double round-trips are exact.
  */
object VectorSearch {
  val Dim = 64

  /** Deterministic unit-free query vector; components are exact binary
    * fractions (k/64, |k| ≤ 50) so SQL-literal round-trips are lossless. */
  def qvec(seed: Int): Seq[Double] =
    (0 until Dim).map(i => (((i + seed * 7) * 37) % 101 - 50) / 64.0)

  /** SQL literal for a query vector (same text for Spark SQL and DuckDB). */
  def sqlArray(v: Seq[Double]): String =
    v.map(_.toString).mkString("[", ", ", "]")

  private def embeddings(s: SparkSession, d: String): DataFrame = {
    vectors.register(s)
    Tables.embeddings(s, d)
  }

  private def qcol(v: Seq[Double]): Column =
    typedlit(v)

  /** v1: L2 top-k — the reference's flagship query shape. */
  def knnL2(s: SparkSession, d: String, k: Int = 10): DataFrame =
    embeddings(s, d)
      .withColumn("score", vectors.l2Distance(col("embedding"), qcol(qvec(0))))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score"), col("vec_id"))
      .limit(k)

  /** v2: cosine-distance top-k. */
  def knnCosine(s: SparkSession, d: String, k: Int = 10): DataFrame =
    embeddings(s, d)
      .withColumn("score", vectors.cosineDistance(col("embedding"), qcol(qvec(1))))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score"), col("vec_id"))
      .limit(k)

  /** v3: max-inner-product top-k (descending dot). */
  def knnDot(s: SparkSession, d: String, k: Int = 10): DataFrame =
    embeddings(s, d)
      .withColumn("score", vectors.dotProduct(col("embedding"), qcol(qvec(2))))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)

  /** v4: metadata-filtered knn (`search.py` `--filter`): the predicate
    * pushes to the parquet scan; distance is only computed on survivors. */
  def filteredKnn(s: SparkSession, d: String, k: Int = 10): DataFrame =
    embeddings(s, d)
      .filter(col("label").isin(1, 3, 5))
      .withColumn("score", vectors.l2Distance(col("embedding"), qcol(qvec(3))))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score"), col("vec_id"))
      .limit(k)

  /** v5 helper: driver-side concept algebra — the reference evaluates
    * `'cat' + 'fluffy' - 'dog'` client-side into one query vector
    * (`search.py:70-105`, `udfs/embed_concept.py`); combining literal
    * vectors on the driver is the Spark-idiomatic equivalent (constant
    * folding, not a per-row arrayMap). */
  def conceptCombine(a: Seq[Double], op: String, b: Seq[Double]): Seq[Double] = op match {
    case "+" => a.zip(b).map { case (x, y) => x + y }
    case "-" => a.zip(b).map { case (x, y) => x - y }
    case "*" => a.zip(b).map { case (x, y) => x * y }
    case "/" => a.zip(b).map { case (x, y) => x / y }
    case o => throw new IllegalArgumentException(s"unknown operator $o")
  }

  def conceptScale(k: Double, a: Seq[Double]): Seq[Double] = a.map(_ * k)

  /** v5: concept-math knn: (q0 + 0.5·q1) − q2, then cosine search. */
  def conceptVector: Seq[Double] =
    conceptCombine(conceptCombine(qvec(0), "+", conceptScale(0.5, qvec(1))), "-", qvec(2))

  def conceptMathKnn(s: SparkSession, d: String, k: Int = 10): DataFrame =
    embeddings(s, d)
      .withColumn("score", vectors.cosineDistance(col("embedding"), qcol(conceptVector)))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score"), col("vec_id"))
      .limit(k)

  /** v6: process.py equivalent — align metadata with embeddings by id,
    * clean text (curly quotes → space, `process.py:78`), carry typed
    * metadata + the vector into one wide row. At 100 TB both sides are
    * bucketed/partitioned on the id so this is a co-located join. */
  def ingestCombine(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val embs = embeddings(s, d)
    docs.join(embs, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text"), "’", " "), "‘", " ")
          .as("caption"),
        col("lang"), col("source"), col("n_chars"), col("label"),
        vectors.l2Norm(col("embedding")).as("emb_norm"))
      .orderBy(col("doc_id"))
  }

  /** v7: vector norms as first-class expressions (L1/L2/Linf vs zero). */
  def norms(s: SparkSession, d: String): DataFrame = {
    val zero = qcol(Seq.fill(Dim)(0.0))
    embeddings(s, d)
      .select(
        col("vec_id"),
        vectors.l2Norm(col("embedding")).as("l2"),
        vectors.l1Distance(col("embedding"), zero).as("l1"),
        vectors.linfDistance(col("embedding"), zero).as("linf"))
      .orderBy(col("vec_id"))
  }

  /** v8: embed-UDF plumbing (`udfs/embed_text.py` + XML): a String
    * column in, Array(Float32)-shaped vector out. The model call is
    * STUBBED with a deterministic hash-derived vector (no ML libs in
    * this environment); the engine-side contract — columnar in/out,
    * codegen-able expression tree, knn over the result — is real. */
  def embedText(c: Column): Column = {
    val comps = (0 until Dim).map { i =>
      ((xxhash64(c, lit(i)) % lit(1000L)).cast("double") / lit(500.0))
    }
    array(comps: _*)
  }

  def embedUdfKnn(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("doc_vec", embedText(col("text")))
    vectors.register(s)
    docs
      .withColumn("score", vectors.cosineDistance(col("doc_vec"), qcol(qvec(4))))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score"), col("doc_id"))
      .limit(k)
  }
}
