package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vectors

/** a4: tree-based ANN — the reference's Annoy experiment
  * (`images/results_ridgeback_annoy_100m.png` comes from an Annoy
  * index over 100M LAION vectors) re-expressed as a median-split
  * random-projection tree (Dasgupta & Freund 2008, the algorithm
  * family Annoy instantiates: recursive hyperplane splits, spill
  * probing near planes).
  *
  * Spark-native shape — the tree is SMALL and the corpus is BIG:
  *  - The tree is `2^Depth - 1` internal nodes; each node holds a
  *    deterministic projection direction (same exact-binary-fraction
  *    discipline as the LSH planes) and a TRAINED threshold: the
  *    median projection of the vectors that reach that node. Training
  *    is one aggregate pass per level (`Depth` corpus scans, each
  *    producing ≤ 2^level (node, median) rows — a bounded driver
  *    collect, like a3's k-centroid codebook). At 100 TB the exact
  *    `percentile` swaps for `approx_percentile` per level; the plan
  *    shape is unchanged.
  *  - Leaf ASSIGNMENT is a pure codegen'd map: `Depth` staged
  *    (CASE-over-node → dot → compare) columns, no shuffle, no join —
  *    a vector's leaf is its root-to-leaf descent folded into an int.
  *  - QUERIES descend driver-side (bounded: Depth dots per query) and
  *    probe their own leaf plus the [[MaxFlips]] alternative leaves
  *    whose split margins |proj − thr| are smallest — Annoy's
  *    priority-queue spill descent as a deterministic driver-side
  *    probe-set computation. The search is then one broadcast
  *    equi-join on the leaf key + exact cosine + per-query top-k:
  *    identical distributed shape to a2/a3, probing
  *    (MaxFlips+1)/2^Depth of the corpus.
  *  - a4_indexed persists the assignment `partitionBy("leaf")`
  *    ([[graft.sources.LocalIndex]]): probes prune to their leaf
  *    directories at PLANNING time. Rebuild-on-corpus-change, like
  *    Annoy's static index: a median tree retrained on changed data
  *    moves its thresholds, so old assignments would not commute —
  *    unlike the constant-plane LSH index, append is NOT sound here.
  *
  * Oracle: thresholds are data-trained but enter BOTH engines as the
  * same driver-held literals (the a3 trained-codebook discipline), so
  * DuckDB replays assignment, probe set, and scoring exactly.
  */
object RpTree {

  val Depth = 5            // 32 leaves
  val MaxFlips = 3         // probe = own leaf + 3 tightest-margin spills
  val K = Ann.K

  /** Node projection directions, heap-indexed 1..2^Depth-1. Exact
    * binary fractions (see [[VectorSearch.qvec]]) keep projections
    * representable and decision boundaries parity-safe. */
  def dir(node: Int): Seq[Double] = VectorSearch.qvec(40 + node)

  private def nodesAt(level: Int): Seq[Int] =
    (1 << level) until (1 << (level + 1))

  private def caseOver(node: Column, nodes: Seq[Int])(f: Int => Column): Column =
    nodes.tail.foldLeft(when(node === nodes.head, f(nodes.head))) {
      (acc, n) => acc.when(node === n, f(n))
    }

  // ------------------------------------------------------------ train

  /** Per-corpus trained thresholds (internal node → median projection).
    * Keyed by dir, like a3's codebooks: one JVM touching two corpora
    * must not mix their trees. Deterministic: exact `percentile` is
    * a sort-based multiset statistic, so retraining on the same
    * corpus reproduces the same doubles in any JVM. */
  private val trees =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Double]]()

  def treeFor(s: SparkSession, d: String): Map[Int, Double] =
    trees.computeIfAbsent(d, _ => train(Tables.embeddings(s, d)))

  def train(embs: DataFrame): Map[Int, Double] = {
    vectors.register(embs.sparkSession)
    var thr = Map.empty[Int, Double]
    var df = embs.select(col("embedding").as("e")).withColumn("node", lit(1))
    for (level <- 0 until Depth) {
      val nodes = nodesAt(level)
      val proj = caseOver(col("node"), nodes)(n =>
        vectors.dotProduct(col("e"), typedlit(dir(n))))
      // ≤ 2^level rows: a bounded collect, the a3-codebook contract
      val meds = df.withColumn("proj", proj)
        .groupBy("node").agg(expr("percentile(proj, 0.5)").as("t"))
        .collect()
      thr ++= meds.collect {
        case r if !r.isNullAt(1) => r.getInt(0) -> r.getDouble(1)
      }
      val tcol = caseOver(col("node"), nodes)(n => lit(thr.getOrElse(n, 0.0)))
      df = df.withColumn("node",
        col("node") * 2 + when(proj >= tcol, 1).otherwise(0))
    }
    thr
  }

  // ----------------------------------------------------- assignment

  /** Staged leaf assignment — `Depth` narrow projections over the
    * scan, all inside whole-stage codegen (each level's CASE
    * evaluates exactly one dot product per row). */
  def assignLeaf(embs: DataFrame, thr: Map[Int, Double]): DataFrame = {
    var df = embs.withColumn("leaf", lit(1))
    for (level <- 0 until Depth) {
      val nodes = nodesAt(level)
      val proj = caseOver(col("leaf"), nodes)(n =>
        vectors.dotProduct(col("embedding"), typedlit(dir(n))))
      val tcol = caseOver(col("leaf"), nodes)(n => lit(thr.getOrElse(n, 0.0)))
      df = df.withColumn("leaf",
        col("leaf") * 2 + when(proj >= tcol, 1).otherwise(0))
    }
    df
  }

  /** Driver-side descent (same arithmetic order as the column form). */
  def leafOf(thr: Map[Int, Double], v: Seq[Double], flipLevel: Int = -1): Int = {
    var node = 1
    for (level <- 0 until Depth) {
      val p = dir(node).zip(v).map { case (a, b) => a * b }.sum
      var bit = if (p >= thr.getOrElse(node, 0.0)) 1 else 0
      if (level == flipLevel) bit = 1 - bit
      node = node * 2 + bit
    }
    node
  }

  /** Probe set: own leaf + the [[MaxFlips]] single-decision spills
    * with the smallest |proj − thr| margin along the query's OWN path
    * (margins are path-local, so they are computed on the unflipped
    * descent; ties break on level). Distinct leaves only. */
  def probeLeaves(thr: Map[Int, Double], v: Seq[Double]): Seq[Int] = {
    var node = 1
    val margins = (0 until Depth).map { level =>
      val p = dir(node).zip(v).map { case (a, b) => a * b }.sum
      val t = thr.getOrElse(node, 0.0)
      val m = math.abs(p - t)
      node = node * 2 + (if (p >= t) 1 else 0)
      (m, level)
    }
    val flips = margins.sorted.take(MaxFlips).map(_._2)
    (leafOf(thr, v) +: flips.map(l => leafOf(thr, v, flipLevel = l))).distinct
  }

  // ---------------------------------------------------------- search

  private def probesDf(s: SparkSession, thr: Map[Int, Double]): DataFrame = {
    import s.implicits._
    Ann.querySet.flatMap { case (i, v) =>
      probeLeaves(thr, v).map(pl => (i, pl, v))
    }.toDF("query_id", "pleaf", "qv")
  }

  private def topkPerQuery(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score"), col("vec_id"))
    cand
      .withColumn("score", vectors.cosineDistance(col("embedding"), col("qv")))
      .select(col("query_id"), col("vec_id"), col("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
      .orderBy(col("query_id"), col("score"), col("vec_id"))
  }

  /** a4: scan-side RP-tree search — assign leaves on the fly (pure
    * map), broadcast-join the probe pairs, exact cosine inside probed
    * leaves. */
  def a4Query(s: SparkSession, d: String, k: Int = K): DataFrame = {
    vectors.register(s)
    val thr = treeFor(s, d)
    val assigned = assignLeaf(Tables.embeddings(s, d), thr)
    topkPerQuery(
      assigned.join(broadcast(probesDf(s, thr)), col("leaf") === col("pleaf")), k)
  }

  // ----------------------------------------------------------- index

  def indexPath(d: String): String =
    graft.sources.LocalIndex.path("rptree-index", d, "_d" + Depth)

  /** Build/refresh the leaf-partitioned index. Full rebuild on ANY
    * corpus change (see scaladoc: median thresholds move with the
    * data, so shard append is unsound here — Annoy's static-index
    * contract). */
  def ensureIndex(s: SparkSession, d: String): String =
    graft.sources.LocalIndex.ensure("rptree-index", d, "_d" + Depth,
      graft.sources.LocalIndex.fingerprint(Seq(s"$d/embeddings.parquet"))) { path =>
      val thr = treeFor(s, d)
      assignLeaf(Tables.embeddings(s, d), thr)
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("leaf").parquet(path)
    }

  /** a4_indexed: same result contract served from the persisted
    * layout — the probe-leaf set is a driver constant, so the `isin`
    * lands in PartitionFilters and only probed leaf dirs are read. */
  def indexedQuery(s: SparkSession, d: String, k: Int = K): DataFrame = {
    vectors.register(s)
    val thr = treeFor(s, d)
    val idx = s.read.parquet(ensureIndex(s, d))
    val allProbes = Ann.querySet.flatMap { case (_, v) => probeLeaves(thr, v) }.distinct
    topkPerQuery(
      idx.filter(col("leaf").isin(allProbes: _*))
        .join(broadcast(probesDf(s, thr)), col("leaf") === col("pleaf")), k)
  }

  // ---------------------------------------------------------- oracle

  /** DuckDB replay: staged CTE per level mirrors [[assignLeaf]]'s
    * staged columns; trained thresholds embed as shortest-round-trip
    * double literals (a3's discipline — `def`, per-dir, dumped AFTER
    * the queries ran, so the cache is populated). Fallback with no
    * cached tree: the zero-threshold tree; formal only — a dir whose
    * a4 queries never ran has no result to compare. */
  def oracles(d: String): Map[String, String] = {
    val thr = Option(trees.get(d)).getOrElse(Map.empty[Int, Double])
    def t(n: Int): String = thr.getOrElse(n, 0.0).toString
    val stages = (0 until Depth).map { level =>
      val cases = nodesAt(level).map { n =>
        s"WHEN $n THEN (CASE WHEN list_inner_product(e, ${
          VectorSearch.sqlArray(dir(n))}::DOUBLE[]) >= ${t(n)} THEN 1 ELSE 0 END)"
      }.mkString(" ")
      s"a${level + 1} AS (SELECT vec_id, e, node * 2 + (CASE node $cases END) AS node FROM a$level)"
    }
    val probes = Ann.querySet.flatMap { case (i, v) =>
      probeLeaves(thr, v).map(pl =>
        s"($i, $pl, ${VectorSearch.sqlArray(v)}::DOUBLE[])")
    }.mkString(", ")
    val sql =
      s"""WITH a0 AS (SELECT vec_id, embedding::DOUBLE[] AS e, 1 AS node FROM embeddings),
         |${stages.mkString(",\n")},
         |probes(query_id, pleaf, qv) AS (VALUES $probes)
         |SELECT query_id, vec_id,
         |       1.0 - list_cosine_similarity(e, qv) AS score
         |FROM a$Depth JOIN probes ON node = pleaf
         |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score, vec_id) <= $K
         |ORDER BY query_id, score, vec_id""".stripMargin
    Map("a4_rptree" -> sql, "a4_indexed" -> sql)
  }
}
