package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The t-digest tier: the bounded-state and rank-envelope arguments
  * q50b rests on, exercised directly on the digest class.
  *
  * Unlike [[KmvSketch]], a t-digest's centroid SET is not bit-stable
  * across merge orders (compression is history-dependent), so the
  * merge property pinned here is the published one: for ANY
  * partition/merge tree, every quantile estimate's true rank stays
  * inside the k1 envelope ±(16·n·q(1−q)/δ + 4) — the same band the
  * q50b gate checks in exact integers on both engines. */
class TDigestSpec extends AnyFunSuite with Matchers {

  private val Delta = 100.0

  private def digestOf(xs: Seq[Double]): TDigest = {
    val td = new TDigest(Delta)
    xs.foreach(td.add(_))
    td
  }

  /** True rank window of value v in xs: (#strictly-below, #at-or-below). */
  private def rankWindow(sorted: Array[Double], v: Double): (Int, Int) = {
    var lo = 0; var hi = 0
    var i = 0
    while (i < sorted.length && sorted(i) <= v) {
      if (sorted(i) < v) lo += 1
      hi += 1; i += 1
    }
    (lo, hi)
  }

  private def band(n: Int, q: Double): Double =
    16.0 * n * q * (1 - q) / Delta + 4

  private def assertEnvelope(td: TDigest, sorted: Array[Double]): Unit = {
    val n = sorted.length
    def okAt(v: Double, target: Double, b: Double): Boolean = {
      val (lo, hi) = rankWindow(sorted, v)
      hi >= target - b && lo <= target + b
    }
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = td.quantile(q)
      val target = q * n
      val b = band(n, q)
      // an interpolated estimate inside the value-gap beside a tie
      // block carries a NEIGHBOR's rank window (the gate mirrors this
      // by snapping to the integer cent domain)
      val idx = {
        val i = java.util.Arrays.binarySearch(sorted, est)
        if (i >= 0) i else -(i + 1)
      }
      val cands = Seq(est) ++
        (if (idx < n) Seq(sorted(idx)) else Nil) ++
        (if (idx > 0) Seq(sorted(idx - 1)) else Nil)
      withClue(s"q=$q est=$est target=$target band=$b: ") {
        assert(cands.exists(okAt(_, target, b)))
      }
    }
  }

  test("state is bounded: centroids <= 2·δ and serialization O(δ) at any input size") {
    val rnd = new scala.util.Random(3)
    val td = new TDigest(Delta)
    (1 to 200000).foreach(_ => td.add(rnd.nextDouble() * 1e6))
    td.centroidCount should be <= (2 * Delta).toInt
  }

  test("same insertion order is deterministic") {
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(50000)(rnd.nextGaussian() * 100)
    val a = digestOf(xs); val b = digestOf(xs)
    for (q <- Seq(0.01, 0.5, 0.99))
      a.quantile(q) shouldBe b.quantile(q)
  }

  test("q=0 and q=1 hit the exact min and max") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(10000)(rnd.nextDouble() * 1e5 - 5e4)
    val td = digestOf(xs)
    td.quantile(0.0) shouldBe xs.min
    td.quantile(1.0) shouldBe xs.max
  }

  test("serial digest respects the rank envelope on varied distributions") {
    val rnd = new scala.util.Random(11)
    val dists: Seq[(String, Int => Double)] = Seq(
      "uniform" -> (_ => rnd.nextDouble() * 1e6),
      "lognormal" -> (_ => math.exp(rnd.nextGaussian() * 2 + 5)),
      // heavy ties: cents-like discrete values, zipf-ish head
      "discrete" -> (_ => (rnd.nextInt(100) * rnd.nextInt(100)).toDouble))
    for ((name, gen) <- dists) {
      val xs = Array.tabulate(20000)(gen)
      withClue(s"dist=$name: ") {
        assertEnvelope(digestOf(xs.toSeq), xs.sorted)
      }
    }
  }

  test("envelope holds for ANY partition split and merge order") {
    val rnd = new scala.util.Random(13)
    val xs = Array.fill(30000)(math.exp(rnd.nextGaussian() * 1.5 + 3))
    val sorted = xs.sorted
    for (trial <- 1 to 8) {
      val parts = 1 + rnd.nextInt(32)
      // random assignment, not contiguous chunks: adversarial vs any
      // assumption about partition value ranges
      val chunks = xs.groupBy(_ => rnd.nextInt(parts)).values.toSeq
      val digests = rnd.shuffle(chunks.map(c => digestOf(c.toSeq)))
      // fold in shuffled order (linear merge tree)
      val linear = digests.reduceLeft { (a, b) => a.mergeIn(b); a }
      withClue(s"trial=$trial parts=$parts linear: ") {
        assertEnvelope(linear, sorted)
      }
      // balanced binary merge tree
      val digests2 = rnd.shuffle(chunks.map(c => digestOf(c.toSeq)))
      def tree(ds: Seq[TDigest]): TDigest = ds match {
        case Seq(one) => one
        case _ =>
          val (l, r) = ds.splitAt(ds.size / 2)
          val a = tree(l); val b = tree(r); a.mergeIn(b); a
      }
      withClue(s"trial=$trial parts=$parts tree: ") {
        assertEnvelope(tree(digests2), sorted)
      }
    }
  }

  test("weighted adds match repeated adds") {
    val td1 = new TDigest(Delta)
    val td2 = new TDigest(Delta)
    val rnd = new scala.util.Random(17)
    (1 to 2000).foreach { _ =>
      val v = rnd.nextInt(1000).toDouble
      val w = 1 + rnd.nextInt(5)
      td1.add(v, w)
      (1 to w).foreach(_ => td2.add(v))
    }
    for (q <- Seq(0.1, 0.5, 0.9))
      math.abs(td1.quantile(q) - td2.quantile(q)) should be <= 25.0
  }
}
