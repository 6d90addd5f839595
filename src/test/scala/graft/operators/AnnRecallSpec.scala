package graft.operators

import graft.{Recall, SparkSpec, Tables}

/** Recall floors for the ANN tier — the contract the determinism/plan
  * gates can't see: how much of the EXACT top-10 the approximate
  * variants recover at their GATED probe settings. Floors sit just
  * under the frozen sf0.01 measurements (BASELINE.md recall table) so
  * a probe-routing or training regression trips them while run-to-run
  * noise (the pipeline is deterministic — any drift is a code change)
  * does not. The corpus embeddings are hash-synthetic ≈ uniform — the
  * WORST case for space-partitioned ANN — so these floors are
  * conservative lower bounds for clustered real-world vectors. */
class AnnRecallSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  private lazy val embs = Tables.embeddings(spark, d)
  private lazy val exactCos = top(Ann.a1Query(spark, d))
  private lazy val cb = Ann.codebookFor(spark, d)
  private lazy val exactL2 = top(Ann.ivfKnn(embs, cb, Ann.K,
    Ann.NumCentroids)(spark))

  private def top(df: org.apache.spark.sql.DataFrame): Map[Int, Set[Long]] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("a4 rp-tree recall floor at the gated MaxFlips, and spills monotone") {
    graft.functions.vectors.register(spark)
    val r0 = Recall.recallOf(top(RpTree.a4Query(spark, d, Ann.K, 0)), exactCos)
    val r3 = Recall.recallOf(top(RpTree.a4Query(spark, d, Ann.K,
      RpTree.MaxFlips)), exactCos)
    r3._1 should be >= 0.65 // frozen sf0.01 measurement: 0.70
    r3._1 should be >= r0._1 // spill probes only ever add candidates
  }

  test("a2 lsh full multi-probe recall floor") {
    implicit val s = spark
    graft.functions.vectors.register(spark)
    val r = Recall.recallOf(top(Ann.lshKnn(embs, Ann.K)), exactCos)
    r._1 should be >= 0.55 // frozen sf0.01 measurement: 0.64
    // single-bucket probing must not beat the multi-probe ring
    val r1 = Recall.recallOf(top(Ann.lshKnn(embs, Ann.K, 1)), exactCos)
    r._1 should be >= r1._1
  }

  test("a3 ivf: gated nprobe floor; probing every cell IS the exact answer") {
    implicit val s = spark
    graft.functions.vectors.register(spark)
    val gated = Recall.recallOf(top(Ann.ivfKnn(embs, cb, Ann.K)), exactL2)
    // gated nprobe scales with the codebook (⌈√32⌉ = 6 since r15);
    // frozen sf0.01 measurement at the gated setting: 0.78 mean
    gated._1 should be >= 0.7
    // self-check: nprobe = NumCentroids degenerates to brute force
    Recall.recallOf(exactL2, exactL2)._1 shouldBe 1.0
  }

  test("vq3 int8+refine serving recalls the float exact answer at full probe") {
    val full = Recall.recallOf(
      top(Ann.quantizedIvfKnn(spark, d, Ann.K, Ann.NumCentroids)), exactL2)
    // the float refine stage re-scores the int8 top-RerankDepth, so
    // full probe is exact BY CONSTRUCTION whenever the true top-10
    // survive the candidate cut (they do at 50× headroom here) — the
    // property quantization alone could not give on near-tie bands
    full._1 shouldBe 1.0
    val gated = Recall.recallOf(top(Ann.quantizedIvfKnn(spark, d)), exactL2)
    gated._1 should be >= 0.7 // tracks a3's gated floor exactly
  }

  /** The planted-cluster corpus is the regime ANN indexes exist for
    * (real embedding corpora cluster; real queries land near dense
    * regions) — the uniform floors above are the structureless worst
    * case. Here every gated serving setting must recover (nearly) the
    * whole exact top-10, at an sf0.1-scale AND an sf1-scale corpus:
    * the probe fraction, not the corpus size, sets recall. */
  for (n <- Seq(5000L, 50000L))
    test(s"clustered corpus ($n vectors): gated settings recall >= 0.9") {
      implicit val s = spark
      graft.functions.vectors.register(spark)
      val dir = graft.GenSf.ensureClusteredEmbeddings(spark, n)
      val cembs = Tables.embeddings(spark, dir)
      val ccb = Ann.codebookFor(spark, dir)
      val cExactCos = top(Ann.a1Query(spark, dir))
      val cExactL2 = top(Ann.ivfKnn(cembs, ccb, Ann.K, Ann.NumCentroids))
      // measured r16 (recall_r16.json): 1.00 mean / 1.00 min for all
      // four variants at both sizes; floor at 0.9 so a training or
      // probe-routing regression trips while a deliberate retune of
      // the deterministic pipeline has headroom to re-freeze
      Recall.recallOf(top(Ann.lshKnn(cembs, Ann.K)), cExactCos)
        ._1 should be >= 0.9
      Recall.recallOf(top(Ann.ivfKnn(cembs, ccb, Ann.K)), cExactL2)
        ._1 should be >= 0.9
      Recall.recallOf(top(RpTree.a4Query(spark, dir, Ann.K,
        RpTree.MaxFlips)), cExactCos)._1 should be >= 0.9
      Recall.recallOf(top(Ann.quantizedIvfKnn(spark, dir)), cExactL2)
        ._1 should be >= 0.9
      // vq4's 8-byte PQ codes carry far more quantization error than
      // int8, which is exactly what the shared refine stage absorbs:
      // the gated floor holds on tight clusters at 32× compression
      Recall.recallOf(top(Ann.ivfPqKnn(spark, dir)), cExactL2)
        ._1 should be >= 0.9
    }
}
