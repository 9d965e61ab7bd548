package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-30 semantics (queries/StatsR9zd.scala): brute-force folds
  * over the collected sf0.001 events.
  */
class R9zdOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (type, day, centi, micros, event_id, milli) per event. */
  private lazy val ev: Array[(String, String, Long, Long, Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value"), unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getString(0), r.getString(1),
        rndL(r.getDouble(2) * 100), r.getLong(3), r.getLong(4),
        math.floor(r.getDouble(2) * 1e3).toLong))

  /** Per type: day-sorted (day, h, l, c, vol). */
  private lazy val ohlc: Map[String, Array[(String, Long, Long, Long, Long)]] =
    ev.groupBy(_._1).map { case (t, g) =>
      (t, g.groupBy(_._2).toArray.sortBy(_._1).map { case (d, rows) =>
        val close = rows.maxBy(r => (r._4, r._5))._3
        (d, rows.map(_._3).max, rows.map(_._3).min, close,
          rows.length.toLong)
      })
    }

  test("q_roll_spread matches the autocovariance fold") {
    val want = ohlc.toArray.sortBy(_._1).map { case (t, rows) =>
      val dc = rows.map(_._4).sliding(2).map(a => a(1) - a(0)).toArray
      val pairs = dc.sliding(2).map(a => (a(1), a(0))).toArray
      val m = pairs.length.toLong
      val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
      val sab = pairs.map(p => p._1 * p._2).sum
      val num = m * sab - sa * sb
      (t, m, rnd(num.toDouble / (m.toDouble * m * 1e4), 6),
        if (num < 0)
          Some(rnd(2.0 * math.sqrt(-num.toDouble / (m.toDouble * m))
            / 100.0, 6))
        else None)
    }
    val got = q("q_roll_spread").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == want.toSeq)
  }

  test("q_kyle_lambda matches the signed-flow slope fold") {
    val want = ohlc.toArray.sortBy(_._1).flatMap { case (t, rows) =>
      val f = rows.sliding(2).map { a =>
        val dcv = a(1)._4 - a(0)._4
        (a(1)._5 * (if (dcv > 0) 1L else if (dcv < 0) -1L else 0L), dcv)
      }.toArray
      val n = f.length.toLong
      val sx = f.map(_._1).sum; val sy = f.map(_._2).sum
      val sxy = f.map(p => p._1 * p._2).sum
      val sxx = f.map(p => p._1 * p._1).sum
      val cxx = n * sxx - sx * sx
      if (cxx <= 0) None
      else Some((t, n, rnd((n * sxy - sx * sy).toDouble / cxx, 6)))
    }
    val got = q("q_kyle_lambda").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_jensen_alpha matches the CAPM moment fold") {
    def rets(series: Array[Long]): Array[Long] =
      series.sliding(2)
        .map(a => rndL(math.log(a(1).toDouble / a(0)) * 1e6)).toArray
    val byTypeDay = ev.groupBy(_._1).map { case (t, g) =>
      (t, g.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (d, rows) => (d, rows.map(_._6).sum / rows.length) })
    }
    val market = ev.groupBy(_._2).toArray.sortBy(_._1)
      .map { case (d, rows) => (d, rows.map(_._6).sum / rows.length) }
    val mRet = market.drop(1).map(_._1).zip(rets(market.map(_._2))).toMap
    val want = byTypeDay.toArray.sortBy(_._1).flatMap { case (t, days) =>
      val tr = days.drop(1).map(_._1).zip(rets(days.map(_._2)))
      val j = tr.flatMap { case (d, r) => mRet.get(d).map(m => (m, r)) }
      val n = j.length.toLong
      val sx = j.map(_._1).sum; val sy = j.map(_._2).sum
      val sxy = j.map(p => p._1 * p._2).sum
      val sxx = j.map(p => p._1 * p._1).sum
      val cxx = n * sxx - sx * sx
      if (cxx <= 0) None
      else {
        val cxy = n * sxy - sx * sy
        Some((t, n, rnd(cxy.toDouble / cxx, 6),
          rnd((sy - cxy.toDouble / cxx * sx) / n / 1e6, 6)))
      }
    }
    val got = q("q_jensen_alpha").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_ichimoku matches the window-extrema fold") {
    val want = ohlc.toArray.sortBy(_._1).flatMap { case (t, rows) =>
      rows.indices.filter(_ >= 25).map { i =>
        val w9 = rows.slice(i - 8, i + 1); val w26 = rows.slice(i - 25, i + 1)
        val t2 = w9.map(_._2).max + w9.map(_._3).min
        val k2 = w26.map(_._2).max + w26.map(_._3).min
        (t, rows(i)._1, rnd(t2 / 200.0, 6), rnd(k2 / 200.0, 6),
          rnd((t2 + k2) / 400.0, 6))
      }
    }
    val got = q("q_ichimoku").collect().map(r => (r.getString(0),
      r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_vortex matches the VM/TR window fold") {
    val want = ohlc.toArray.sortBy(_._1).flatMap { case (t, rows) =>
      val lg = rows.sliding(2).map { a =>
        val (ph, pl, pc) = (a(0)._2, a(0)._3, a(0)._4)
        val (d, h, l) = (a(1)._1, a(1)._2, a(1)._3)
        (d, math.abs(h - pl), math.abs(l - ph),
          math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc))))
      }.toArray
      lg.indices.filter(_ >= 13).flatMap { i =>
        val w = lg.slice(i - 13, i + 1)
        val str = w.map(_._4).sum
        if (str <= 0) None
        else Some((t, lg(i)._1,
          rnd(w.map(_._2).sum.toDouble / str, 6),
          rnd(w.map(_._3).sum.toDouble / str, 6)))
      }
    }
    val got = q("q_vortex").collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_force_index matches the SMA-13 fold") {
    val want = ohlc.toArray.sortBy(_._1).flatMap { case (t, rows) =>
      val fi = rows.sliding(2)
        .map(a => (a(1)._1, (a(1)._4 - a(0)._4) * a(1)._5)).toArray
      fi.indices.filter(_ >= 12).map { i =>
        (t, fi(i)._1,
          rnd(fi.slice(i - 12, i + 1).map(_._2).sum.toDouble / 1300.0, 6))
      }
    }
    val got = q("q_force_index").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
