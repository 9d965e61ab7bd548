package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-39 semantics (queries/StatsR9zl.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zlOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (custkey, brand, orderdate, segment) per lineitem. */
  private lazy val li: Array[(Long, String, String, String)] = {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val segOf = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ord = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map { r =>
        val (c, od) = ord(r.getLong(0))
        (c, brandOf(r.getLong(1)), od, segOf(c))
      }
  }

  private lazy val train: Map[(Long, String), Long] =
    li.filter(_._3 < "1998-01-01").groupBy(t => (t._1, t._2))
      .map { case (k, v) => (k, v.length.toLong) }

  private lazy val test_ : Set[(Long, String)] =
    li.filter(_._3 >= "1998-01-01").map(t => (t._1, t._2)).toSet

  test("q_rec_coverage matches the top-3 unbought fold") {
    val brands = graft.tables.Tables.part(spark, sf)
      .select("p_brand").distinct().collect().map(_.getString(0))
    val pop = train.toArray.groupBy(_._1._2)
      .map { case (b, g) => (b, g.map(_._2).sum) }
    val users = train.keySet.map(_._1)
    val recBrands = users.flatMap { c =>
      brands.filter(b => !train.contains((c, b)))
        .sortBy(b => (-pop.getOrElse(b, 0L), b)).take(3)
    }
    val r = q("q_rec_coverage").collect()(0)
    assert(r.getLong(0) == users.size.toLong)
    assert(r.getLong(1) == recBrands.size.toLong)
    assert(r.getLong(2) == brands.length.toLong)
    assert(r.getDouble(3) ==
      rnd(recBrands.size.toDouble / brands.length, 6))
  }

  test("q_cold_start matches the anti-join fold") {
    val trU = train.keySet.map(_._1); val trB = train.keySet.map(_._2)
    val cu = test_.count(p => !trU(p._1)).toLong
    val cb = test_.count(p => !trB(p._2)).toLong
    val r = q("q_cold_start").collect()(0)
    assert(r.getLong(0) == test_.size.toLong)
    assert(r.getLong(1) == cu && r.getLong(2) == cb)
    assert(r.getDouble(3) == rnd(cu.toDouble / test_.size, 6))
    assert(r.getDouble(4) == rnd(cb.toDouble / test_.size, 6))
  }

  test("q_factorial_interaction matches the cell fold") {
    val cells = graft.tables.Tables.events(spark, sf)
      .select(dayofweek(col("ts")), hour(col("ts")), col("value"))
      .collect()
      .map(r => ((if (Set(1, 7)(r.getInt(0))) 1 else 0,
        if (r.getInt(1) < 12) 1 else 0), rndL(r.getDouble(2) * 100)))
      .groupBy(_._1)
    def stat(k: (Int, Int)): (Long, Double, Double) = {
      val vs = cells(k).map(_._2)
      val n = vs.length.toLong
      val sv = vs.sum; val svv = vs.map(v => v * v).sum
      (n, sv.toDouble / n,
        (n * svv - sv * sv).toDouble / (n.toDouble * (n - 1)))
    }
    val (n11, m11, s11) = stat((1, 1)); val (n10, m10, s10) = stat((1, 0))
    val (n01, m01, s01) = stat((0, 1)); val (n00, m00, s00) = stat((0, 0))
    val se2 = s11 / n11 + s10 / n10 + s01 / n01 + s00 / n00
    val eff = m11 - m10 - m01 + m00
    val r = q("q_factorial_interaction").collect()(0)
    assert(r.getLong(0) == (n11 + n10 + n01 + n00))
    assert(math.abs(r.getDouble(1) - eff / 100) < 1e-6)
    assert(math.abs(r.getDouble(2) - eff / math.sqrt(se2)) < 1e-5)
  }

  test("q_mediation_lite matches the Cramer fold") {
    val day = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, g) =>
        (g.count(_._2 == "click").toLong,
          g.filter(_._2 == "purchase")
            .map(e => math.floor(e._3 * 1e3).toLong).sum)
      }
    val n = day.length.toLong
    val xs = (1L to n).toArray
    val sx = xs.sum; val sm = day.map(_._1).sum; val sy = day.map(_._2).sum
    val sxm = xs.zip(day).map { case (x, (m, _)) => x * m }.sum
    val sxy = xs.zip(day).map { case (x, (_, y)) => x * y }.sum
    val smy = day.map { case (m, y) => m * y }.sum
    val sxx = xs.map(x => x * x).sum
    val smm = day.map(d => d._1 * d._1).sum
    val cxx = n * sxx - sx * sx; val cmm = n * smm - sm * sm
    val cxm = n * sxm - sx * sm; val cxy = n * sxy - sx * sy
    val cmy = n * smy - sm * sy
    val det = cxx.toDouble * cmm - cxm.toDouble * cxm
    val a = cxm.toDouble / cxx
    val b = (cxx.toDouble * cmy - cxm.toDouble * cxy) / det
    val cp = (cmm.toDouble * cxy - cxm.toDouble * cmy) / det
    val r = q("q_mediation_lite").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(a, 6))
    assert(r.getDouble(2) == rnd(b / 1000, 6))
    assert(r.getDouble(3) == rnd(a * b / 1000, 6))
    assert(r.getDouble(4) == rnd(cp / 1000, 6))
    assert(r.getDouble(5) == rnd(cxy.toDouble / cxx / 1000, 6))
  }

  test("q_price_stickiness matches the lag-change fold") {
    val pm = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date")
          .cast("string"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), rndL(r.getDouble(2) * 100),
        r.getDouble(3).toLong))
      .groupBy(t => (t._1, t._2)).toArray
      .flatMap { case ((pk, m), g) =>
        val qq = g.map(_._4).sum
        if (qq <= 0) None
        else Some((pk, m, rndL(g.map(_._3).sum.toDouble / qq)))
      }
    val byPart = pm.groupBy(_._1)
    val pairs = byPart.values.flatMap { rows =>
      val us = rows.sortBy(_._2).map(_._3)
      us.sliding(2).filter(_.length == 2).map(a => (a(0), a(1)))
    }.toArray
    val nParts = byPart.count(_._2.length >= 2).toLong
    val nPairs = pairs.length.toLong
    val nCh = pairs.count(p => p._1 != p._2).toLong
    val r = q("q_price_stickiness").collect()(0)
    assert(r.getLong(0) == nParts && r.getLong(1) == nPairs)
    assert(r.getLong(2) == nCh)
    assert(r.getDouble(3) == rnd(1.0 - nCh.toDouble / nPairs, 6))
    assert(r.getDouble(4) == rnd(nPairs.toDouble / nCh, 6))
  }

  test("q_segment_brand_overlap matches the set fold") {
    val sb = li.map(t => (t._4, t._2)).distinct
    val bySeg = sb.groupBy(_._1).map { case (s0, g) =>
      (s0, g.map(_._2).toSet)
    }
    val segs = bySeg.keySet.toArray.sorted
    val want = (for {
      i <- segs.indices; j <- (i + 1) until segs.length
    } yield {
      val (a, b) = (segs(i), segs(j))
      val c = (bySeg(a) intersect bySeg(b)).size.toLong
      (a, b, c, rnd(c.toDouble / (bySeg(a).size + bySeg(b).size - c), 6))
    }).toArray
    val got = q("q_segment_brand_overlap").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
