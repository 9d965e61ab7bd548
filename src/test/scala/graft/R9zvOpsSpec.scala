package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-49 semantics (queries/StatsR9zv.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zvOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per-type day-sorted (day, h, l, close, vol) centi OHLC. */
  private lazy val ohlc: Map[String, Array[(String, Long, Long, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value"), unix_micros(col("ts")), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        rndL(r.getDouble(2) * 100), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1).map { case (d, rows) =>
          (d, rows.map(_._3).max, rows.map(_._3).min,
            rows.maxBy(r => (r._4, r._5))._3)
        })
      }

  /** weekend×high-value 2×2 per type. */
  private lazy val strata: Map[String, (Long, Long, Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), dayofweek(col("ts")), col("value"))
      .collect()
      .map(r => (r.getString(0), Set(1, 7)(r.getInt(1)),
        r.getDouble(2) > 100))
      .groupBy(_._1).map { case (t, g) =>
        (t, (g.count(x => x._2 && x._3).toLong,
          g.count(x => x._2 && !x._3).toLong,
          g.count(x => !x._2 && x._3).toLong,
          g.count(x => !x._2 && !x._3).toLong))
      }

  test("q_sma_crossover matches the cleared-sign fold") {
    val want = ohlc.toArray.sortBy(_._1).map { case (t, rows) =>
      val cs = rows.map(_._4)
      val sgns = cs.indices.filter(_ >= 19).map { i =>
        val s5 = cs.slice(i - 4, i + 1).sum
        val s20 = cs.slice(i - 19, i + 1).sum
        java.lang.Long.signum(4 * s5 - s20).toLong
      }.filter(_ != 0)
      val g = sgns.sliding(2).count(a =>
        a.length == 2 && a(0) == -1 && a(1) == 1).toLong
      val dth = sgns.sliding(2).count(a =>
        a.length == 2 && a(0) == 1 && a(1) == -1).toLong
      (t, sgns.length.toLong, g, dth)
    }
    val got = q("q_sma_crossover").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_pivot_points matches the cleared-pivot fold") {
    val want = ohlc.toArray.sortBy(_._1).flatMap { case (t, rows) =>
      rows.sliding(2).filter(_.length == 2).map { a =>
        val (_, ph, pl, pc) = a(0); val (d, _, _, c) = a(1)
        val p3 = ph + pl + pc
        (t, d, rnd(p3 / 300.0, 6), rnd((2 * p3 - 3 * pl) / 300.0, 6),
          rnd((2 * p3 - 3 * ph) / 300.0, 6),
          300 * c > 2 * p3 * 100 - 3 * pl * 100)
      }
    }
    val got = q("q_pivot_points").collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_simpson_paradox matches the OR-reversal fold") {
    def lor(a: Long, b: Long, c: Long, dd: Long): Double =
      math.log(((a + 0.5) * (dd + 0.5)) / ((b + 0.5) * (c + 0.5)))
    val per = strata.toArray.map { case (t, (a, b, c, dd)) =>
      (t, lor(a, b, c, dd)) }
    val (sa, sb, sc, sd) = strata.values
      .foldLeft((0L, 0L, 0L, 0L)) { case ((x1, x2, x3, x4), (a, b, c, dd)) =>
        (x1 + a, x2 + b, x3 + c, x4 + dd) }
    val olor = lor(sa, sb, sc, sd)
    val paradox = !per.exists(p => math.signum(p._2) == math.signum(olor))
    val want = (per.map { case (t, l) => (t, rnd(math.exp(l), 4)) }
      :+ (("OVERALL", rnd(math.exp(olor), 4))))
      .sortBy(_._1).map(p => (p._1, p._2, paradox))
    val got = q("q_simpson_paradox").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_meta_fixed_effect matches the snapped pool fold") {
    def lor(a: Long, b: Long, c: Long, dd: Long): Double =
      math.log(((a + 0.5) * (dd + 0.5)) / ((b + 0.5) * (c + 0.5)))
    val sn = strata.values.toArray.map { case (a, b, c, dd) =>
      val l = lor(a, b, c, dd)
      val v = 1.0 / (a + 0.5) + 1.0 / (b + 0.5) + 1.0 / (c + 0.5) +
        1.0 / (dd + 0.5)
      (rndL(1e6 / v), rndL(l / v * 1e6), rndL(l * l / v * 1e6))
    }
    val k = sn.length.toLong
    val s0 = sn.map(_._1).sum; val s1 = sn.map(_._2).sum
    val s2 = sn.map(_._3).sum
    val pooled = s1.toDouble / s0
    val qq = (s2.toDouble - s1.toDouble * s1 / s0) / 1e6
    val r = q("q_meta_fixed_effect").collect()(0)
    assert(r.getLong(0) == k)
    assert(r.getDouble(1) == rnd(math.exp(pooled), 6))
    assert(r.getDouble(2) == rnd(qq, 6))
    assert(r.getDouble(3) == rnd(math.max(0.0, (qq - (k - 1)) / qq), 6))
  }

  test("q_rogan_gladen matches the clamped correction fold") {
    val base = graft.tables.Tables.events(spark, sf)
      .select("value", "event_type", "event_id").collect()
      .map(r => (r.getDouble(0) > 147, r.getString(1) == "purchase",
        r.getLong(2)))
    val tp = base.count(x => x._1 && x._2).toLong
    val fn = base.count(x => !x._1 && x._2).toLong
    val tn = base.count(x => !x._1 && !x._2).toLong
    val fp = base.count(x => x._1 && !x._2).toLong
    val smp = base.filter(_._3 % 7 == 0)
    val sens = tp.toDouble / (tp + fn)
    val spec = tn.toDouble / (tn + fp)
    val app = smp.count(_._1).toDouble / smp.length
    val adj = math.max(0.0, math.min(1.0,
      (app + spec - 1) / (sens + spec - 1)))
    val r = q("q_rogan_gladen").collect()(0)
    assert(r.getDouble(0) == rnd(sens, 6))
    assert(r.getDouble(1) == rnd(spec, 6))
    assert(r.getDouble(2) == rnd(app, 6))
    assert(r.getDouble(3) == rnd(adj, 6))
    assert(r.getDouble(4) ==
      rnd(base.count(_._2).toDouble / base.length, 6))
  }

  test("q_direct_standardization matches the hour-mix fold") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).cast("long"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2) > 100))
    val cell = rows.groupBy(x => (x._1, x._2))
      .map { case (k, g) => (k, (g.length.toLong,
        g.count(_._3).toLong)) }
    val hw = rows.groupBy(_._2).map { case (h, g) =>
      (h, g.length.toLong) }
    val nn = rows.length.toLong
    val want = rows.map(_._1).distinct.sorted.map { t =>
      val tc = cell.filter(_._1._1 == t)
      val crude = tc.values.map(_._2).sum.toDouble /
        tc.values.map(_._1).sum
      val su = tc.map { case ((_, h), (n, k)) =>
        rndL(hw(h).toDouble / nn * (k.toDouble / n) * 1e9)
      }.sum
      (t, rnd(crude, 6), rnd(su / 1e9, 6))
    }
    val got = q("q_direct_standardization").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
