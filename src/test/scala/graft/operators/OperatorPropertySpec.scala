package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized cross-checks of the custom relational operators against
  * driver-side brute-force references. The distributed implementations
  * (union+window asof, bucketed range join, large/small-star connected
  * components) take structurally different paths from the obvious
  * quadratic/sequential forms — these properties pin them to the same
  * semantics on inputs no hand-written case covers: dense timestamp
  * collisions, multi-parent graphs, singleton keys, empty sides. */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** Deterministic scalacheck sampling: fixed seed, n samples. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("asofJoin matches driver-side brute force on random inputs") {
    // small key/time domains force collisions: equal timestamps across
    // sides, duplicate right timestamps, keys with empty right side
    val rowGen = Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L))
    val caseGen = Gen.zip(
      Gen.listOfN(12, rowGen), // left (key, ts)
      Gen.listOfN(12, Gen.zip(rowGen, Gen.choose(0L, 100L)))) // right + id
    samples(caseGen, 25).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "lts", "lid")
      val right = rs.map { case ((k, t), rid) => (k, ts(t), rid) }
        .toDF("k", "rts", "rid")
      val got = AsofJoin.asofJoin(left, right, "k", "lts", "rts",
          Seq("rid"), tieBreak = "rid")
        .collect()
        .map(r => r.getAs[Long]("lid") ->
          Option(r.get(r.fieldIndex("rid"))).map(_.asInstanceOf[Long]))
        .toMap
      // brute force: max (rts, rid) among same-key rights at-or-before
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val cand = rs.collect {
          case ((rk, rt), rid) if rk == k && rt <= t => (rt, rid)
        }
        i.toLong -> (if (cand.isEmpty) None else Some(cand.max._2))
      }.toMap
      got shouldBe want
    }
  }

  test("asofJoinChunked is equivalent to asofJoin on random inputs (boundary carries forced)") {
    // ts domain 0..300 s with a 60 s chunk: ~6 chunks per key, so most
    // matches cross a chunk boundary and exercise the carry path;
    // right-free chunks and right-free keys occur too
    val rowGen = Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 300L))
    val caseGen = Gen.zip(
      Gen.listOfN(14, rowGen),
      Gen.listOfN(14, Gen.zip(rowGen, Gen.choose(0L, 100L))))
    samples(caseGen, 25).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "lts", "lid")
      val right = rs.map { case ((k, t), rid) => (k, ts(t), rid) }
        .toDF("k", "rts", "rid")
      def resultOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("lid") ->
          Option(r.get(r.fieldIndex("rid"))).map(_.asInstanceOf[Long]))
        .toMap
      val base = resultOf(AsofJoin.asofJoin(
        left, right, "k", "lts", "rts", Seq("rid"), tieBreak = "rid"))
      val chunked = resultOf(AsofJoin.asofJoinChunked(
        left, right, "k", "lts", "rts", Seq("rid"), tieBreak = "rid",
        chunkSec = 60L))
      chunked shouldBe base
    }
  }

  test("funnelLevels matches brute-force chain search on random inputs") {
    // tight time domain (0..2W) and few users force in-window and
    // out-of-window chains, equal timestamps, and hot single users
    val W = Analytics.FunnelWindowSec
    val evGen = Gen.zip(
      Gen.choose(0L, 2L),
      Gen.oneOf("view", "click", "purchase", "error"),
      Gen.choose(0L, 2L * W))
    samples(Gen.listOfN(24, evGen), 25).foreach { evs =>
      val df = evs.map { case (u, t, sec) => (u, t, ts(sec)) }
        .toDF("user_id", "event_type", "ts")
      val got = Analytics.funnelLevels(df)
        .collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level"))
        .toMap
      // brute force: deepest strict chain tv < tc < tp <= tv + W
      val want = evs.map(_._1).distinct.map { u =>
        def of(t: String) = evs.collect { case (`u`, `t`, s) => s }
        val (vs, cs, ps) = (of("view"), of("click"), of("purchase"))
        val l3 = vs.exists(tv => cs.exists(tc => tc > tv && ps.exists(
          tp => tp > tc && tp <= tv + W)))
        val l2 = vs.exists(tv => cs.exists(tc => tc > tv && tc <= tv + W))
        val lvl = if (l3) 3 else if (l2) 2 else if (vs.nonEmpty) 1 else 0
        u -> lvl
      }.toMap
      got shouldBe want
    }
  }

  test("sequenceMatchCounts equals brute-force chain existence on random logs") {
    // tiny time domain (0..6) and few users force ties ACROSS types —
    // the strict-order edge the greedy chain must respect — plus
    // users missing whole stages and decoy event types
    val evGen = Gen.zip(
      Gen.choose(0L, 3L),
      Gen.oneOf("view", "click", "purchase", "error"),
      Gen.choose(0L, 6L))
    samples(Gen.listOfN(18, evGen), 30).foreach { evs =>
      val df = evs.map { case (u, t, ms) => (u, ms, t) }
        .toDF("user_id", "tms", "event_type")
      val row = Analytics.sequenceMatchCounts(df).head
      val users = evs.filter(e => Set("view", "click", "purchase")(e._2))
        .map(_._1).distinct
      val matched = users.count { u =>
        def of(t: String) = evs.collect { case (`u`, `t`, ms) => ms }
        of("view").exists(tv => of("click").exists(tc => tc > tv &&
          of("purchase").exists(tp => tp > tc)))
      }
      (row.getAs[Long]("matched_users"), row.getAs[Long]("total_users")) shouldBe
        ((matched.toLong, users.length.toLong))
    }
  }

  test("bandedPairs matches driver-side brute force on random inputs") {
    val rowGen = Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 300L))
    val caseGen = Gen.zip(Gen.listOfN(10, rowGen), Gen.listOfN(10, rowGen))
    samples(caseGen, 25).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "lts", "lid")
      val right = rs.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t), i.toLong + 1000L) }
        .toDF("k", "rts", "rid")
      val band = 60L
      val got = RangeJoin.bandedPairs(left, right, "k", "lts", "rts",
          Seq("rid"), bandSec = band)
        .collect()
        .map(r => (r.getAs[Long]("lid"), r.getAs[Long]("rid")))
        .sorted
      val want = (for {
        ((lk, lt), li) <- ls.zipWithIndex
        ((rk, rt), ri) <- rs.zipWithIndex
        if lk == rk && math.abs(rt - lt) <= band
      } yield (li.toLong, ri.toLong + 1000L)).sorted
      got shouldBe want
    }
  }

  test("dupClustersStar matches driver-side union-find on random graphs") {
    val edgeGen = Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L))
    val caseGen = Gen.listOfN(20, edgeGen)
    samples(caseGen, 15).foreach { es =>
      val pairs = es.toDF("doc_a", "doc_b")
      val got = Dedup.dupClustersStar(pairs)._1.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
        .toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      // component label = min member id
      val label = nodes.groupBy(find).flatMap { case (_, members) =>
        val m = members.min; members.map(_ -> m)
      }
      got shouldBe label
    }
  }

  test("sequenceCountPerUser equals a greedy non-overlap simulator on random streams") {
    // tiny tms range forces equal-timestamp ties (incl. cross-type);
    // 'other' rows must be ignored entirely
    val evGen = Gen.zip(Gen.choose(0L, 6L),
      Gen.oneOf("view", "purchase", "other"))
    val caseGen = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, evGen))
    def greedy(evs: Seq[(Long, String)]): Long = {
      var avail = 0L; var m = 0L
      // purchase sorts before view on tms ties — the strict-order rule
      evs.filter(e => e._2 == "view" || e._2 == "purchase")
        .sortBy(e => (e._1, e._2)).foreach {
          case (_, "view") => avail += 1
          case _ => if (avail > 0) { avail -= 1; m += 1 }
        }
      m
    }
    samples(caseGen, 40).zipWithIndex.foreach { case (evs, u) =>
      val df = evs.map { case (t, ty) => (u.toLong, t, ty) }
        .toDF("user_id", "tms", "event_type")
      val got = Analytics.sequenceCountPerUser(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = greedy(evs)
      // users with zero view/purchase rows are absent from the output
      got.getOrElse(u.toLong, 0L) shouldBe want
    }
  }

  test("maxIntersections equals a driver-side sweep on random interval sets") {
    // small time range forces shared endpoints: start==start, end==start
    // (must NOT intersect under half-open), zero-length intervals
    val ivGen = Gen.zip(Gen.choose(0L, 10L), Gen.choose(0L, 5L))
      .map { case (s, len) => (s, s + len) }
    val caseGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, ivGen))
    samples(caseGen, 30).foreach { ivs =>
      val df = ivs.map { case (s, e) => ("x", s, e) }
        .toDF("series", "start", "end")
      val got = Analytics.maxIntersections(df).collect()
        .map(r => (r.getLong(1), r.getLong(2))).head
      // brute force: same sweep, -1 before +1 at equal t
      val evs = ivs.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
        .sortBy(identity)
      var live = 0L; var best = Long.MinValue; var at = 0L
      evs.foreach { case (t, d) =>
        live += d
        if (live > best) { best = live; at = t }
      }
      got shouldBe (best, at)
    }
  }

  test("intervalLengthSum equals a driver-side segment union on random interval sets") {
    // small range forces overlaps, touching intervals (must merge:
    // segment-union semantics), containment, duplicates, zero-length
    val ivGen = Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 5L))
      .map { case (s, len) => (s, s + len) }
    val caseGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, ivGen))
    samples(caseGen, 30).foreach { ivs =>
      val df = ivs.map { case (s, e) => ("x", s, e) }
        .toDF("series", "start", "end")
      val got = Analytics.intervalLengthSum(df).collect()
        .map(r => (r.getLong(1), r.getLong(2))).head
      // brute force: merge sorted intervals into islands
      var islands = List.empty[(Long, Long)]
      ivs.sorted.foreach { case (s, e) =>
        islands match {
          case (is, ie) :: rest if s <= ie =>
            islands = (is, math.max(ie, e)) :: rest
          case _ => islands = (s, e) :: islands
        }
      }
      got shouldBe ((islands.size.toLong,
        islands.map { case (s, e) => e - s }.sum))
    }
  }

  test("chunked sweeps equal the single-window forms on adversarial interval sets") {
    // tiny chunk spans force live runs and islands to STRADDLE chunk
    // boundaries; the generator keeps the flat tests' adversarial
    // cases (shared endpoints, zero-length, duplicates, containment)
    val ivGen = Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 6L))
      .map { case (s, len) => (s, s + len) }
    val caseGen = for {
      n <- Gen.choose(1, 16)
      ivs <- Gen.listOfN(n, ivGen)
      chunk <- Gen.oneOf(1L, 2L, 3L, 5L, 7L, 1000L)
    } yield (ivs, chunk)
    samples(caseGen, 25).foreach { case (ivs, chunk) =>
      val df = ivs.zipWithIndex.map { case ((s, e), i) =>
        (if (i % 2 == 0) "x" else "y", s, e) }
        .toDF("series", "start", "end")
      withClue(s"chunkMs=$chunk ivs=$ivs: ") {
        Analytics.maxIntersectionsChunked(df, chunk).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet shouldBe
          Analytics.maxIntersections(df).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        Analytics.intervalLengthSumChunked(df, chunk).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet shouldBe
          Analytics.intervalLengthSum(df).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      }
    }
  }

  test("mixtureTake equals the global take-while rule on random corpora") {
    // the distributed bucket-cutoff + boundary-window plan must equal
    // the SEMANTIC definition: per source, scan docs in
    // (bkt, h, doc_id) order and keep while running tokens <= budget.
    // Random token masses force boundary buckets everywhere; pct
    // extremes (0-token keeps nothing at pct still >= floor; tiny
    // sources fit entirely) come from the generator ranges.
    val docGen = Gen.zip(Gen.chooseNum(0, 1), Gen.chooseNum(1L, 40L))
    val caseGen = Gen.choose(5, 60).flatMap(n => Gen.listOfN(n, docGen))
    samples(caseGen, 12).zipWithIndex.foreach { case (docs, ci) =>
      val rows = docs.zipWithIndex.map { case ((srcI, tok), i) =>
        (s"src$srcI", (ci * 1000 + i).toLong, tok, 15 + (srcI * 37) % 71)
      }
      val df = rows.toDF("source", "doc_id", "n_tok", "pct")
      val got = Mixture.mixtureTake(df).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // driver-side brute force of the semantic rule
      def h60(id: Long): BigInt = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        BigInt(md.map("%02x".format(_)).mkString.take(15), 16)
      }
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        val budget = rs.map(_._3.toLong).sum * rs.head._4 / 100
        var run = 0L
        rs.map(r => (h60(r._2) % Mixture.NumBuckets, h60(r._2), r._2, r._3))
          .sortBy { case (b, h, id, _) => (b, h, id) }
          .takeWhile { case (_, _, _, tok) => { run += tok; run <= budget } }
          .map(_._3)
      }.toSet
      got shouldBe want
    }
  }

  test("mapAgg matches driver-side key-wise brute force on random map rows") {
    // multi-entry maps with overlapping/disjoint key sets, negative
    // values, and EMPTY maps (which must contribute nothing)
    val entryGen = Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(-50L, 50L))
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2"),
      Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, entryGen).map(_.toMap)))
    val caseGen = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, rowGen))
    samples(caseGen, 30).foreach { rows =>
      val got = Analytics.mapAgg(rows.toDF("g", "m"), col("g"), col("m"))
        .collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val want = rows
        .flatMap { case (g, m) => m.toSeq.map { case (k, v) => ((g, k), v) } }
        .groupBy(_._1).map { case (gk, vs0) =>
          val vs = vs0.map(_._2)
          gk -> (vs.sum, vs.min, vs.max, vs.size.toLong) }
      got shouldBe want
    }
  }

  test("fillInterpolate matches driver-side brute force on random gappy series") {
    // adversarial shapes: all-null series, single known cell, leading/
    // trailing gaps, adjacent known cells (gap width 1)
    val cellGen = Gen.option(Gen.choose(-500L, 500L))
    val caseGen = for {
      n <- Gen.choose(1, 12)
      a <- Gen.listOfN(n, cellGen)
      b <- Gen.listOfN(n, cellGen)
    } yield Seq("a" -> a, "b" -> b)
    samples(caseGen, 25).foreach { series =>
      val rows = series.flatMap { case (t, cells) =>
        cells.zipWithIndex.map { case (c, i) => (t, i.toLong, c) } }
      val got = Analytics.fillInterpolate(
          rows.toDF("event_type", "idx", "cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
      val want = rows.sortBy(r => (r._2, r._1)).map { case (t, i, c) =>
        val known = series.toMap.apply(t).zipWithIndex
          .collect { case (Some(v), j) => (j.toLong, v) }
        val filled = c match {
          case Some(v) => Some(v.toDouble)
          case None => (known.filter(_._1 < i).lastOption, known.find(_._1 > i)) match {
            case (None, None) => None
            case (None, Some((_, nv))) => Some(nv.toDouble)
            case (Some((_, pv)), None) => Some(pv.toDouble)
            case (Some((ph, pv)), Some((nh, nv))) =>
              Some(pv + ((nv - pv) * (i - ph)).toDouble / (nh - ph))
          }
        }
        (t, i, c.isDefined, filled)
      }
      got shouldBe want
    }
  }

  test("histogramCents matches driver-side brute force on random inputs") {
    // adversarial domains: all-equal values (hi == lo), spans smaller
    // than the bin count (empty bins), negative cents, single row
    val caseGen = Gen.zip(
      Gen.choose(1, 20), // rows
      Gen.oneOf(Gen.const(0L -> 0L), Gen.const(-3L -> 3L),
        Gen.const(0L -> 1000L), Gen.const(-50L -> 50L)))
      .flatMap { case (n, (lo, hi)) =>
        Gen.listOfN(n, Gen.choose(lo, hi)) }
    val bins = 8
    samples(caseGen, 30).foreach { cs =>
      val got = Analytics.histogramCents(cs.toDF("cents"), bins)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val (lo, hi) = (cs.min, cs.max)
      val w = hi - lo + 1
      val want = cs.groupBy(c => (c - lo) * bins / w).toSeq
        .map { case (b, vs) =>
          (b, lo + w * b / bins, lo + w * (b + 1) / bins - 1,
            vs.size.toLong, vs.sum) }
        .sortBy(_._1)
      got shouldBe want
    }
  }

  test("q32/q49 two-pass heavy hitters equal driver brute force on skewed corpora") {
    // end-to-end over the REAL operator (pass-1 MG candidates at fixed
    // capacity + broadcast exact recount), on adversarial shapes the
    // gated corpus can't produce: near-threshold counts, single-type,
    // all-heavy and heavy-tail mixes. The summary itself is hammered in
    // MgCandidatesSpec; this pins the recount/threshold/rank plumbing.
    val caseGen = for {
      types <- Gen.choose(1, 3)
      headReps <- Gen.listOfN(4, Gen.choose(1, 400))
      // tails up to 2500 unique pages per type: above 2·HhCapacity, so
      // some cases run pass 1 through real MG prunes end-to-end
      tailN <- Gen.choose(0, 2500)
    } yield (types, headReps, tailN)
    samples(caseGen, 6).zipWithIndex.foreach { case ((types, headReps, tailN), ci) =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-hh$ci-").toString
      var even = 0L
      var odd = 1L
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Timestamp, Long, String, Double, String)]
      for (t <- 0 until types; (reps, h) <- headReps.zipWithIndex;
           r <- 0 until reps) {
        rows += ((even, ts(r % 900), even, s"t$t", (r % 9) * 0.25,
          s"""{"k": $h}"""))
        even += 2 // even event_id → head page h
      }
      for (t <- 0 until types; _ <- 0 until tailN) {
        rows += ((odd, ts(odd % 900), odd, s"t$t", 0.75, """{"k": 0}"""))
        odd += 2 // odd event_id → unique tail page 100+event_id
      }
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(7) // nondeterministic partial-merge order
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      // driver-side truth from the constructed rows
      val byPage = rows.groupBy(r => (r._4,
        if (r._1 % 2 == 0)
          r._6.replaceAll("[^0-9]", "").toLong
        else 100 + r._1))
      val totals = rows.groupBy(_._4).view.mapValues(_.size.toLong).toMap
      val wantCnt = byPage.view.mapValues(_.size.toLong).toMap
        .filter { case ((t, _), c) => c * 256 > totals(t) }
      val gotCnt = Analytics.q32ApproxTopK(spark, dir).collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
      gotCnt shouldBe wantCnt

      val wTotals = rows.groupBy(_._4).view
        .mapValues(_.map(r => math.round(r._5 * 100)).sum).toMap
      val wantW = byPage.view
        .mapValues(_.map(r => math.round(r._5 * 100)).sum).toMap
        .filter { case ((t, _), w) => w * 256 > wTotals(t) }
      val gotW = Analytics.q49TopKWeighted(spark, dir).collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
      gotW shouldBe wantW

      // rank contract: per type, dense 1..k ordered (measure desc, page asc)
      val ranks = Analytics.q32ApproxTopK(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(4)))
      ranks.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._4)
        sorted.map(_._4) shouldBe (1 to rs.length)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
          case _ =>
        }
      }
    }
  }
}
