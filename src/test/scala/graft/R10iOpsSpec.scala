package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-10 key-level pins (queries/StatsR10i.scala): the four
  * range-based volatility estimators and the two market-beta splits
  * re-derived by brute-force folds over the collected sf0.001 events.
  */
class R10iOpsSpec extends AnyFunSuite with SparkFixture {

  private case class Ev(typ: String, day: String, vC: Long, vM: Long,
    tsUs: Long, id: Long)

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def rnd6(x: Double): Double =
    new JBD(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      round(col("value") * 100).cast("long").as("v_c"),
      floor(col("value") * 1e3).cast("long").as("v_m"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))

  /** (day, o, h, l, c) per type, day-sorted, l > 0 gated. */
  private lazy val ohlco: Map[String, Array[(String, Long, Long, Long, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1).map { case (d, g) =>
        val first = g.minBy(e => (e.tsUs, e.id))
        val last = g.maxBy(e => (e.tsUs, e.id))
        (d, first.vC, g.map(_.vC).max, g.map(_.vC).min, last.vC)
      }.filter(_._4 > 0)
    }

  private def lnU(num: Long, den: Long): Long =
    rnd(math.log(num.toDouble / den) * 1e6)

  /** Per-type u-snapped (hl, co, hc, ho, lc, lo) range rows. */
  private lazy val rng: Map[String, Array[(Long, Long, Long, Long, Long, Long)]] =
    ohlco.map { case (t, days) =>
      t -> days.map { case (_, o, h, l, c) =>
        (lnU(h, l), lnU(c, o), lnU(h, c), lnU(h, o), lnU(l, c), lnU(l, o))
      }
    }

  /** Per-type µ-snapped daily returns keyed by day (the dailyRet grain). */
  private lazy val rets: Map[String, Array[(String, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      val ys = rows.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_.vM).sum / g.length) }
      t -> (1 until ys.length).map(i =>
        (ys(i)._1, rnd(math.log(ys(i)._2.toDouble / ys(i - 1)._2) * 1e6)))
        .toArray
    }

  /** Market µ-snapped day returns keyed by day. */
  private lazy val mkt: Map[String, Long] = {
    val ys = evs.groupBy(_.day).toArray.sortBy(_._1)
      .map { case (d, g) => (d, g.map(_.vM).sum / g.length) }
    (1 until ys.length).map(i =>
      (ys(i)._1, rnd(math.log(ys(i)._2.toDouble / ys(i - 1)._2) * 1e6)))
      .toMap
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_parkinson_vol matches the exact-sum fold") {
    val want = rng.filter(_._2.length >= 2).toArray.sortBy(_._1)
      .map { case (t, rs) =>
        val s = rs.map(r => r._1 * r._1).sum
        (t, rs.length.toLong,
          rnd6(math.sqrt(s.toDouble / (4.0 * math.log(2.0) * rs.length)
            / 1e12)))
      }
    val got = q("q_parkinson_vol").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_garman_klass matches the exact-sum fold") {
    val want = rng.filter(_._2.length >= 2).toArray.sortBy(_._1)
      .map { case (t, rs) =>
        val sHl2 = rs.map(r => r._1 * r._1).sum
        val sCo2 = rs.map(r => r._2 * r._2).sum
        val v = (0.5 * sHl2 - (2.0 * math.log(2.0) - 1.0) * sCo2) /
          rs.length / 1e12
        (t, rs.length.toLong, rnd6(math.sqrt(math.max(v, 0.0))))
      }
    val got = q("q_garman_klass").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_rogers_satchell matches the exact-sum fold") {
    val want = rng.filter(_._2.length >= 2).toArray.sortBy(_._1)
      .map { case (t, rs) =>
        val s = rs.map(r => r._3 * r._4 + r._5 * r._6).sum
        (t, rs.length.toLong,
          rnd6(math.sqrt(math.max(s.toDouble / rs.length / 1e12, 0.0))))
      }
    val got = q("q_rogers_satchell").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_yang_zhang matches the component-variance fold") {
    val want = ohlco.toArray.sortBy(_._1).flatMap { case (t, days) =>
      val rows = (1 until days.length).flatMap { i =>
        val (_, o, h, l, c) = days(i)
        val pc = days(i - 1)._5
        if (pc > 0)
          Some((lnU(o, pc), lnU(c, o),
            lnU(h, c) * lnU(h, o) + lnU(l, c) * lnU(l, o)))
        else None
      }
      val n = rows.length
      if (n >= 3) {
        def svar(xs: Seq[Long]) = {
          val s = xs.sum; val s2 = xs.map(x => x * x).sum
          (n.toDouble * s2 - s.toDouble * s) / n / (n - 1) / 1e12
        }
        val vOn = svar(rows.map(_._1))
        val vOc = svar(rows.map(_._2))
        val vRs = rows.map(_._3).sum.toDouble / n / 1e12
        val k = 0.34 / (1.34 + (n + 1).toDouble / (n - 1))
        Some((t, n.toLong,
          rnd6(math.sqrt(math.max(vOn, 0.0))),
          rnd6(math.sqrt(math.max(vOc, 0.0))),
          rnd6(math.sqrt(math.max(vRs, 0.0))),
          rnd6(math.sqrt(math.max(vOn + k * vOc + (1.0 - k) * vRs, 0.0)))))
      } else None
    }
    val got = q("q_yang_zhang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  private def beta(pairs: Seq[(Long, Long)]): Double = {
    val n = pairs.length
    val sr = pairs.map(_._1).sum; val sm = pairs.map(_._2).sum
    val srm = pairs.map(p => p._1 * p._2).sum
    val smm = pairs.map(p => p._2 * p._2).sum
    (n.toDouble * srm - sr.toDouble * sm) /
      (n.toDouble * smm - sm.toDouble * sm)
  }

  test("q_treynor matches the regression fold") {
    val want = rets.toArray.sortBy(_._1).map { case (t, rs) =>
      val pairs = rs.flatMap(r => mkt.get(r._1).map(m => (r._2, m))).toSeq
      val b = beta(pairs)
      val mean = pairs.map(_._1).sum.toDouble / pairs.length / 1e6
      (t, pairs.length.toLong, rnd6(b), rnd6(mean), rnd6(mean / b))
    }
    val got = q("q_treynor").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_downside_beta matches the conditional regression fold") {
    val want = rets.toArray.sortBy(_._1).flatMap { case (t, rs) =>
      val pairs = rs.flatMap(r => mkt.get(r._1).map(m => (r._2, m))).toSeq
      val dn = pairs.filter(_._2 < 0); val up = pairs.filter(_._2 > 0)
      if (dn.length >= 2 && up.length >= 2) {
        val bd = beta(dn); val bu = beta(up)
        Some((t, dn.length.toLong, up.length.toLong,
          rnd6(bd), rnd6(bu), rnd6(bd / bu)))
      } else None
    }
    val got = q("q_downside_beta").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }
}
