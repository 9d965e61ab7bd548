package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-1 semantics (queries/StatsR9.scala), beyond what the
  * DuckDB oracles prove: every technical indicator and portfolio
  * statistic re-derived by a brute-force fold over the collected
  * sf0.001 events and compared row-for-row.
  */
class R9OpsSpec extends AnyFunSuite with SparkFixture {

  private case class Ev(typ: String, day: String, vC: Long, vM: Long,
    tsUs: Long, id: Long)

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      round(col("value") * 100).cast("long").as("v_c"),
      floor(col("value") * 1e3).cast("long").as("v_m"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))

  /** Daily OHLC per type (day, h, l, c, vol), day-sorted. */
  private lazy val ohlc: Map[String, Array[(String, Long, Long, Long, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1).map { case (d, g) =>
        val last = g.maxBy(e => (e.tsUs, e.id))
        (d, g.map(_.vC).max, g.map(_.vC).min, last.vC, g.length.toLong)
      }
    }

  /** µ-snapped daily log returns of milli means per type, day-sorted. */
  private lazy val rets: Map[String, Array[Long]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      val ys = rows.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (_, g) => g.map(_.vM).sum / g.length }
      t -> (1 until ys.length).map(i =>
        rnd(math.log(ys(i).toDouble / ys(i - 1)) * 1e6)).toArray
    }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_williams_r matches the brute-force %R fold") {
    val got = q("q_williams_r").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2)))
      .toMap
    var checked = 0
    for ((t, days) <- ohlc; i <- 13 until days.length) {
      val w = days.slice(i - 13, i + 1)
      val h14 = w.map(_._2).max; val l14 = w.map(_._3).min
      if (h14 > l14) {
        val rU = rnd((h14 - days(i)._4).toDouble * 1e8 / (h14 - l14))
        assert(math.abs(got((t, days(i)._1)) - rU / -1e6) <= 1e-4)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_donchian matches channel extremes and prior-window breakouts") {
    val got = q("q_donchian").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3), r.getLong(5), r.getLong(6))))
      .toMap
    var checked = 0
    for ((t, days) <- ohlc; i <- 14 until days.length) {
      val cur = days.slice(i - 13, i + 1)
      val prev = days.slice(i - 14, i)
      val (gu, gl, gbu, gbd) = got((t, days(i)._1))
      assert(gu === cur.map(_._2).max / 100.0)
      assert(gl === cur.map(_._3).min / 100.0)
      assert(gbu === (if (days(i)._2 > prev.map(_._2).max) 1L else 0L))
      assert(gbd === (if (days(i)._3 < prev.map(_._3).min) 1L else 0L))
      checked += 1
    }
    assert(checked === got.size)
  }

  test("q_macd matches the closed-form EMA unroll") {
    val got = q("q_macd").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3)))).toMap
    var checked = 0
    for ((t, days) <- ohlc) {
      def emaU(alpha: Double, beta: Double): Array[Long] =
        days.indices.toArray.map { i0 =>
          val i = i0 + 1
          (1 to i).map { j =>
            val w = if (j == 1) math.pow(beta, i - 1)
              else alpha * math.pow(beta, i - j)
            rnd(w * days(j - 1)._4 * 1e4)
          }.sum
        }
      val e12 = emaU(2.0 / 13.0, 11.0 / 13.0)
      val e26 = emaU(2.0 / 27.0, 25.0 / 27.0)
      val macdU = e12.zip(e26).map { case (a, b) => a - b }
      for (i <- days.indices if i + 1 >= 26 && i >= 8) {
        val (gm, gs) = got((t, days(i)._1))
        assert(math.abs(gm - macdU(i) / 1e6) <= 1e-4)
        val sig = macdU.slice(i - 8, i + 1).sum / 9.0
        assert(math.abs(gs - sig / 1e6) <= 1e-4)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_cmf matches the snapped money-flow-volume fold") {
    val got = q("q_cmf").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2)))
      .toMap
    var checked = 0
    for ((t, days) <- ohlc) {
      val mfv = days.map { case (_, h, l, c, vol) =>
        if (h > l) rnd(((2 * c - h - l) * 1000000L * vol).toDouble / (h - l))
        else 0L
      }
      for (i <- 6 until days.length) {
        val sm = mfv.slice(i - 6, i + 1).sum
        val sv = days.slice(i - 6, i + 1).map(_._5).sum
        assert(math.abs(got((t, days(i)._1)) - sm.toDouble / sv / 1e6)
          <= 1e-6)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_mfi matches the exact triple-price leg fold") {
    val got = q("q_mfi").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2)))
      .toMap
    var checked = 0
    for ((t, days) <- ohlc) {
      // rows after the lag drop: index 1.. with (tp3, ptp3, mf)
      val rows = (1 until days.length).map { i =>
        val tp3 = days(i)._2 + days(i)._3 + days(i)._4
        val p3 = days(i - 1)._2 + days(i - 1)._3 + days(i - 1)._4
        (days(i)._1, tp3, p3, tp3 * days(i)._5)
      }
      for (i <- 13 until rows.length) {
        val w = rows.slice(i - 13, i + 1)
        val pos = w.filter(r => r._2 > r._3).map(_._4).sum
        val neg = w.filter(r => r._2 < r._3).map(_._4).sum
        if (pos + neg > 0) {
          val mfiU = rnd(pos.toDouble * 1e8 / (pos + neg))
          assert(math.abs(got((t, rows(i)._1)) - mfiU / 1e6) <= 1e-4)
          checked += 1
        }
      }
    }
    assert(checked === got.size)
  }

  test("q_sortino matches the downside-deviation fold") {
    val got = q("q_sortino").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    for ((t, rs) <- rets) {
      val sdd = rs.filter(_ < 0).map(r => r * r).sum
      if (sdd > 0) {
        val n = rs.length
        val mean = rs.sum.toDouble / n / 1e6
        val dd = math.sqrt(sdd.toDouble / n) / 1e6
        val (gn, gm, gd, gs) = got(t)
        assert(gn === n.toLong)
        assert(math.abs(gm - mean) <= 1e-6)
        assert(math.abs(gd - dd) <= 1e-6)
        assert(math.abs(gs - mean / dd * math.sqrt(252.0)) <= 1e-4)
      } else assert(!got.contains(t))
    }
  }

  test("q_ulcer_index / q_calmar match the drawdown folds") {
    val ui = q("q_ulcer_index").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val cal = q("q_calmar").collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, days) <- ohlc) {
      var peak = Long.MinValue
      val dds = days.map { case (_, _, _, c, _) =>
        peak = math.max(peak, c)
        rnd((peak - c).toDouble * 1e8 / peak)
      }
      val n = days.length
      val (gn, gmax, gui) = ui(t)
      assert(gn === n.toLong)
      assert(math.abs(gmax - dds.max / 1e6) <= 1e-4)
      assert(math.abs(gui
        - math.sqrt(dds.map(x => x * x).sum.toDouble / n) / 1e6) <= 1e-4)
      if (dds.max > 0) {
        val rs = rets(t)
        val ann = rs.sum.toDouble / rs.length / 1e6 * 252.0
        val (ga, gd, gc) = cal(t)
        assert(math.abs(ga - ann) <= 1e-6)
        assert(math.abs(gd - dds.max / 1e8) <= 1e-6)
        assert(math.abs(gc - ann * 1e8 / dds.max) <= 1e-4)
      } else assert(!cal.contains(t))
    }
  }

  test("q_beta_market matches the exact-moment regression fold") {
    val mkt: Array[Long] = {
      val ys = evs.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (_, g) => g.map(_.vM).sum / g.length }
      (1 until ys.length).map(i =>
        rnd(math.log(ys(i).toDouble / ys(i - 1)) * 1e6)).toArray
    }
    val mDays = evs.map(_.day).distinct.sorted.drop(1)
    val got = q("q_beta_market").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, rows) <- evs.groupBy(_.typ)) {
      val tDays = rows.map(_.day).distinct.sorted.drop(1)
      val tr = rets(t)
      val byDay = tDays.zip(tr).toMap
      val mm = mDays.zip(mkt).toMap
      val joined = tDays.filter(mm.contains).map(d => (byDay(d), mm(d)))
      val n = joined.length.toLong
      val sr = joined.map(_._1).sum; val sm = joined.map(_._2).sum
      val srm = joined.map(p => p._1 * p._2).sum
      val smm = joined.map(p => p._2 * p._2).sum
      val srr = joined.map(p => p._1 * p._1).sum
      val covN = n.toDouble * srm - sr.toDouble * sm
      val varM = n.toDouble * smm - sm.toDouble * sm
      val varR = n.toDouble * srr - sr.toDouble * sr
      val (gn, gb, ga, gr2) = got(t)
      assert(gn === n)
      assert(math.abs(gb - covN / varM) <= 1e-6)
      assert(math.abs(ga - (sr - covN / varM * sm) / n / 1e6) <= 1e-6)
      assert(math.abs(gr2 - covN * covN / (varM * varR)) <= 1e-6)
    }
  }

  test("q_keltner matches the triple-price SMA + ATR band fold") {
    val got = q("q_keltner").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    var checked = 0
    for ((t, days) <- ohlc) {
      val tr = days.indices.map { i =>
        val (_, h, l, _, _) = days(i)
        if (i == 0) h - l
        else {
          val pc = days(i - 1)._4
          math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
        }
      }
      for (i <- 6 until days.length) {
        val w = days.slice(i - 6, i + 1)
        val mid = w.map(d => d._2 + d._3 + d._4).sum / 21.0
        val band = tr.slice(i - 6, i + 1).sum * 2 / 7.0
        val (gm, gu, gl, gp) = got((t, days(i)._1))
        assert(math.abs(gm - mid / 100.0) <= 1e-4)
        assert(math.abs(gu - (mid + band) / 100.0) <= 1e-4)
        assert(math.abs(gl - (mid - band) / 100.0) <= 1e-4)
        val c = days(i)._4
        val expP = if (c > mid + band) 1L
          else if (c < mid - band) -1L else 0L
        assert(gp === expP)
        checked += 1
      }
    }
    assert(checked === got.size)
  }
}
