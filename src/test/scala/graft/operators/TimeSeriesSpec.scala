package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q59–q61 time-series family: each pinned re-expression (banded EMA,
  * centroid-anchor LTTB, closed-form least squares) is re-derived
  * brute-force on the driver, including q60's exact-integer area
  * argmax — a drift in the integer clearing (the kind of bug a green
  * compile can't catch) fails here before the cross-engine gate. */
class TimeSeriesSpec extends SparkSpec {
  private val d = SparkSpec.TinySf

  private def dailyDriver(): Map[(String, String), Long] =
    graft.Tables.events(spark, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap

  test("q59 EMA equals the driver-side 28-day weighted fold") {
    val daily = dailyDriver()
    val got = TimeSeries.q59Ema(spark, d).collect()
    got.length shouldBe daily.size
    got.foreach { r =>
      val (t, day) = (r.getString(0), r.getDate(1).toLocalDate)
      val terms = (0 to 27).flatMap { back =>
        daily.get((t, day.minusDays(back).toString)).map { c =>
          (math.pow(0.5, back / 7.0), c)
        }
      }
      r.getLong(3) shouldBe terms.length.toLong
      val ema = terms.map { case (w, c) => w * c }.sum /
        terms.map(_._1).sum / 100.0
      r.getDouble(4) shouldBe (ema +- 1e-3)
    }
  }

  test("q60 LTTB picks the exact-integer max-area point per bucket") {
    val B = 20
    val ev = graft.Tables.events(spark, d).select(col("event_type"),
      col("ts").cast("long"),
      expr("CAST(round(value * 100) AS BIGINT)"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val binned = ev.map { case (t, es, y, id) =>
      val rx = es - lo
      (t, rx * B / (hi - lo + 1), rx, y, id)
    }
    val stats = binned.groupBy(b => (b._1, b._2)).view.mapValues { bs =>
      (bs.length.toLong, bs.map(b => BigInt(b._3)).sum, bs.map(b => BigInt(b._4)).sum)
    }.toMap
    val got = TimeSeries.q60Lttb(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    got.keySet shouldBe stats.keySet
    binned.groupBy(b => (b._1, b._2)).foreach { case ((t, bk), bs) =>
      val buckets = stats.keys.filter(_._1 == t).map(_._2).toSeq.sorted
      val prev = buckets.filter(_ < bk).lastOption.map(p => stats((t, p)))
      val next = buckets.filter(_ > bk).headOption.map(n => stats((t, n)))
      val pick = (prev, next) match {
        case (None, _) => bs.minBy(b => (b._3, b._5))
        case (_, None) => bs.maxBy(b => (b._3, b._5))
        case (Some((np, sxp, syp)), Some((nn, sxn, syn))) =>
          bs.maxBy { b =>
            val p = sxp * nn - sxn * np
            val q = BigInt(b._4) * np - syp
            val r = sxp - BigInt(b._3) * np
            val sS = syn * np - syp * nn
            ((p * q - r * sS).abs, -b._3, -b._5)
          }
      }
      val (_, x, y, id) = got((t, bk))
      (x - lo, y, id) shouldBe ((pick._3, pick._4, pick._5))
    }
  }

  test("q60 endpoint buckets pin to the series endpoints") {
    val got = TimeSeries.q60Lttb(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // first bucket holds the type's earliest sampled x, last its latest
      sorted.head._3 should be <= sorted.map(_._3).min
      sorted.last._3 shouldBe sorted.map(_._3).max
    }
  }

  test("q61 linreg matches driver-side least squares on the pinned origin") {
    val rows = graft.Tables.events(spark, d).select(col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"),
      expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = TimeSeries.q61LinReg(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val n = rs.length.toDouble
      val sx = rs.map(_._2).sum.toDouble; val sy = rs.map(_._3).sum.toDouble
      val sxy = rs.map(r => r._2 * r._3).sum.toDouble
      val sxx = rs.map(r => r._2 * r._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      got(t)._1 shouldBe rs.length.toLong
      got(t)._2 shouldBe (slope +- 1e-4)
      got(t)._3 shouldBe (icept +- 1e-2)
    }
  }
}
