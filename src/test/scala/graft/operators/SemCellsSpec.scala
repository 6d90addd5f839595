package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-level (coarse→fine) cell assignment: equivalence with a
  * driver-side reference, the flat/two-level split point, the frozen-
  * assigner empty-region fallback, and semDedup equality under a
  * forced two-level assigner. */
class SemCellsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def randCorpus(n: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val base = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // half the corpus jittered copies of earlier rows → real near-dups
    for (i <- n / 2 until n) {
      val src = rnd.nextInt(n / 2)
      base(i) = base(src).map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    }
    base
  }

  private def d2(v: Array[Float], c: Seq[Double]): Double =
    v.zip(c).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum

  /** Driver-side replay of the two-level assignment semantics. */
  private def refCell(asg: SemCells.TwoLevel)(v: Array[Float]): Long = {
    val c0 = asg.coarse.map { case (cid, cv) => (d2(v, cv), cid) }.min._2
    val fid = asg.fine.get(c0) match {
      case Some(book) =>
        book.zipWithIndex.map { case (cv, f) => (d2(v, cv), f.toLong) }.min._2
      case None => 0L
    }
    c0 * SemCells.FineStride + fid
  }

  test("train returns Flat below maxK (the historical single-level path)") {
    graft.functions.vectors.register(spark)
    val base = randCorpus(60, 7)
    val embs = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    def seed(e: org.apache.spark.sql.DataFrame, n: Long, k: Int) =
      (0 until k).map(i => (i.toLong, base(i).map(_.toDouble).toSeq))
    val asg = SemCells.train(embs, 60, 8, maxK = 16, seed)
    asg shouldBe a[SemCells.Flat]
    asg.k shouldBe 8
  }

  test("two-level withCell equals the driver-side coarse→fine argmin on every vector") {
    graft.functions.vectors.register(spark)
    val n = 120
    val base = randCorpus(n, 42)
    val embs = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    def seed(e: org.apache.spark.sql.DataFrame, nn: Long, k: Int) =
      (0 until k).map(i => (i.toLong * 3, base(i * 3).map(_.toDouble).toSeq))
    // kTotal 12 > maxK 4 → forced two-level (kc = 4, kf = 3)
    val asg = SemCells.train(embs, n, 12, maxK = 4, seed)
      .asInstanceOf[SemCells.TwoLevel]
    asg.coarse.size shouldBe 4
    asg.coarse.map(_._1) shouldBe (0L until 4L) // dense ranks
    asg.fine.keySet.foreach(c0 => c0 should (be >= 0L and be < 4L))
    asg.fine.values.foreach(_.size should be <= 3)
    val got = asg.withCell(embs, "cell").select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.size shouldBe n
    base.zipWithIndex.foreach { case (v, i) =>
      withClue(s"vec $i: ") { got(i.toLong) shouldBe refCell(asg)(v) }
    }
  }

  test("frozen assigner routes a vector from a train-empty region to the region's implicit cell, never drops it") {
    graft.functions.vectors.register(spark)
    def unit(axis: Int) = (0 until dim).map(i => if (i == axis) 1.0 else 0.0)
    // region 1 has NO fine book (empty at train time)
    val asg = SemCells.TwoLevel(
      coarse = Seq((0L, unit(0)), (1L, unit(4))),
      fine = Map(0L -> IndexedSeq(unit(0), unit(1))))
    val shard = Seq(
      (10L, unit(0).map(_.toFloat)),  // region 0, fid 0
      (11L, unit(1).map(_.toFloat)),  // region 0, fid 1
      (12L, unit(4).map(_.toFloat)))  // region 1 — bookless
      .toDF("vec_id", "embedding")
    val got = asg.withCell(shard, "cell").select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      10L -> 0L, 11L -> 1L, 12L -> 1L * SemCells.FineStride)
  }

  test("semDedup under a forced two-level assigner matches driver-side brute force") {
    graft.functions.vectors.register(spark)
    val n = 150
    val base = randCorpus(n, 99)
    val embs = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    def seed(e: org.apache.spark.sql.DataFrame, nn: Long, k: Int) =
      (0 until k).map(i => (i.toLong * 2, base(i * 2).map(_.toDouble).toSeq))
    val asg = SemCells.train(embs, n, 20, maxK = 5, seed)
      .asInstanceOf[SemCells.TwoLevel]
    val tau = 0.4
    val cell = base.map(refCell(asg))
    val occ = cell.groupBy(identity).view.mapValues(_.length).toMap
    def cos(a: Array[Float], b: Array[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      1.0 - dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expect = (0 until n).flatMap { b =>
      if (occ(cell(b)) > Dedup.MaxNearDupBucket) None
      else (0 until b)
        .filter(a => cell(a) == cell(b) && cos(base(a), base(b)) <= tau)
        .minOption
        .map(a => (b.toLong, a.toLong))
    }.sorted
    val got = Dedup.semDedup(embs, asg, tau).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("kept_by"))).toSeq
    got shouldBe expect
  }
}
