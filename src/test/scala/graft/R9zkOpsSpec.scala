package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-38 semantics (queries/StatsR9zk.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zkOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (partkey, suppkey, price_cents, qty, ship-month). */
  private lazy val li: Array[(Long, Long, Long, Long, String)] =
    graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_quantity"),
        date_trunc("month", col("l_shipdate")).cast("date")
          .cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), rndL(r.getDouble(2) * 100),
        r.getDouble(3).toLong, r.getString(4)))

  test("q_price_dispersion matches the CV fold") {
    val uv = li.groupBy(l => (l._1, l._2)).toArray
      .flatMap { case ((pk, _), g) =>
        val qq = g.map(_._4).sum
        if (qq <= 0) None
        else Some((pk, rndL(g.map(_._3).sum.toDouble / qq)))
      }
    val want = uv.groupBy(_._1).toArray.flatMap { case (pk, g) =>
      val us = g.map(_._2)
      val ns = us.length.toLong
      val su = us.sum
      if (ns < 3 || su <= 0) None
      else {
        val mean = su.toDouble / ns
        val sd = math.sqrt(
          us.map(u => BigInt(u) * u).sum.toDouble / ns - mean * mean)
        Some((pk, ns, rnd(mean / 100.0, 2), rnd(sd / mean, 6)))
      }
    }.sortBy { case (pk, _, _, cv) => (-cv, pk) }.take(20)
    val got = q("q_price_dispersion").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_xbar_r_chart matches the cleared OOC fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, rows) => rows.map(_._3).sum / rows.length })
      }
    val want = daily.toArray.sortBy(_._1).map { case (t, ys) =>
      val blocks = ys.grouped(5).filter(_.length == 5).toArray
        .map(b => (b.sum, b.max - b.min))
      val nb = blocks.length.toLong
      val ss = blocks.map(_._1).sum; val sr = blocks.map(_._2).sum
      val nOoc = blocks.count { case (s5, _) =>
        1000L * nb * s5 > 1000L * ss + 2885L * sr ||
        1000L * nb * s5 < 1000L * ss - 2885L * sr
      }.toLong
      (t, nb, rnd(ss.toDouble / (nb * 5) / 1000, 6),
        rnd(sr.toDouble / nb / 1000, 6),
        rnd((ss.toDouble / (nb * 5) + 0.577 * sr / nb) / 1000, 6),
        rnd((ss.toDouble / (nb * 5) - 0.577 * sr / nb) / 1000, 6),
        nOoc)
    }
    val got = q("q_xbar_r_chart").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_g_test matches the snapped-cell fold") {
    val cells = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), dayofweek(col("ts")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val rt = cells.toArray.groupBy(_._1._1)
      .map { case (t, g) => (t, g.map(_._2).sum) }
    val ct = cells.toArray.groupBy(_._1._2)
      .map { case (dw, g) => (dw, g.map(_._2).sum) }
    val nn = cells.values.sum
    val st = cells.map { case ((t, dw), o) =>
      rndL(o * math.log(o.toDouble * nn / (rt(t).toDouble * ct(dw)))
        * 1e6)
    }.sum
    val df = (rt.size - 1).toLong * (ct.size - 1)
    val r = q("q_g_test").collect()(0)
    assert(r.getLong(0) == nn && r.getLong(1) == df)
    assert(r.getDouble(2) == rnd(2.0 * st / 1e6, 6))
  }

  test("q_chained_index matches the link fold") {
    val pm = li.groupBy(l => (l._1, l._5)).toArray
      .flatMap { case ((pk, m), g) =>
        val qq = g.map(_._4).sum
        if (qq <= 0) None
        else Some((pk, m, rndL(g.map(_._3).sum.toDouble / qq), qq))
      }
    val byMonth = pm.groupBy(_._2)
    def nextMonth(m: String): String =
      LocalDate.parse(m).plusMonths(1).toString
    val links = byMonth.toArray.sortBy(_._1).flatMap { case (m, rows) =>
      val nm = byMonth.getOrElse(nextMonth(m), Array.empty)
        .map(r => (r._1, r._3)).toMap
      val common = rows.flatMap(r => nm.get(r._1).map(u1 => (r, u1)))
      if (common.length < 5) None
      else {
        val num = common.map { case (r, u1) => u1 * r._4 }.sum
        val den = common.map { case (r, _) => r._3 * r._4 }.sum
        if (den <= 0) None
        else Some(rndL(math.log(num.toDouble / den) * 1e9))
      }
    }
    val r = q("q_chained_index").collect()(0)
    assert(r.getLong(0) == links.length.toLong)
    assert(r.getDouble(1) == rnd(math.exp(links.sum / 1e9), 6))
  }

  test("q_gastwirth matches the weighted order-stat fold") {
    val xs = {
      val oc = graft.tables.Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      graft.tables.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice").collect()
        .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
        .groupBy(_._1).toArray
        .map { case (c, g) => (c, g.map(_._2).sum) }
        .filter(_._2 > 0)
        .sortBy(t => (t._2, t._1)).map(_._2)
    }
    val n = xs.length.toLong
    val q13 = xs(((n + 2) / 3 - 1).toInt)
    val q12 = xs(((n + 1) / 2 - 1).toInt)
    val q23 = xs(((2 * n + 2) / 3 - 1).toInt)
    val r = q("q_gastwirth").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) ==
      rnd((3 * q13 + 4 * q12 + 3 * q23).toDouble / 10 / 100, 2))
  }

  test("q_lorenz_asymmetry matches the below-mean fold") {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val xs = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
      .groupBy(_._1).toArray
      .map { case (_, g) => g.map(_._2).sum }
      .filter(_ > 0)
    val n = xs.length.toLong; val sx = xs.sum
    val below = xs.filter(x => n * x < sx)
    val sc = below.length.toDouble / n + below.sum.toDouble / sx
    val r = q("q_lorenz_asymmetry").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == below.length.toLong)
    assert(r.getDouble(2) == rnd(sc, 6))
  }
}
