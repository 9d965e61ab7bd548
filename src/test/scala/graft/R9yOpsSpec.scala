package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-25 semantics (queries/StatsR9y.scala): folds over the
  * collected sf0.001 tables.
  */
class R9yOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).map { case (t, g) =>
        t -> g.groupBy(_._1).map { case (d0, gg) =>
          (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
        }.toArray.sortBy(_._1)
      }

  test("q_pvm_bridge matches the snapped bridge fold") {
    val brand = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"),
        col("l_shipdate").cast("date").cast("string"))
      .collect()
      .map(r => (brand(r.getLong(0)), r.getDouble(1), r.getDouble(2),
        if (r.getString(3) < "1996-01-01") 0 else 1))
    val got = q("q_pvm_bridge").collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((b, g) <- li.groupBy(_._1)) {
      val g0 = g.filter(_._4 == 0); val g1 = g.filter(_._4 == 1)
      if (g0.nonEmpty && g1.nonEmpty) {
        val s0 = g0.map(l => rnd(l._3 * 100)).sum
        val q0 = g0.map(_._2.toLong).sum
        val s1 = g1.map(l => rnd(l._3 * 100)).sum
        val q1 = g1.map(_._2.toLong).sum
        if (q0 > 0 && q1 > 0) {
          val (gd, gp, gv) = got(b)
          assert(math.abs(gd - rnd((s1 - s0) / 100.0 * 100) / 100.0)
            <= 1e-9)
          assert(math.abs(gp - rnd((s1.toDouble
            - s0.toDouble * q1 / q0) / 100 * 100) / 100.0) <= 1e-9)
          assert(math.abs(gv - rnd(s0.toDouble * (q1 - q0) / q0 / 100
            * 100) / 100.0) <= 1e-9)
        }
      }
    }
  }

  test("q_retention_halflife matches the decay fold") {
    val wk = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"),
        date_trunc("week", to_date(col("ts"))).cast("date")
          .cast("string"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cohort = wk.groupBy(_._1).map { case (u, g) =>
      u -> g.map(_._2).min
    }
    val sizes = cohort.values.groupBy(identity)
      .map { case (c, g) => c -> g.size.toLong }
    def wkDiff(a: String, b: String): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a), java.time.LocalDate.parse(b)) / 7
    val byAge = wk.map { case (u, w) => (cohort(u), wkDiff(cohort(u), w)) }
      .filter(_._2 >= 1)
      .groupBy(_._2).map { case (age, g) =>
        val active = g.size.toLong
        val base = g.map(_._1).map(sizes).sum
        (age, active, base)
      }.filter(x => x._2 > 0 && x._3 > 0)
      .map { case (age, a, b) => (age, rnd(math.log(a.toDouble / b) * 1e6)) }
      .toArray
    val n = byAge.length.toLong
    val sx = byAge.map(_._1).sum
    val sy = byAge.map(_._2).sum
    val sxy = byAge.map(p => p._1 * p._2).sum
    val sxx = byAge.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx) / 1e6
    val r = q("q_retention_halflife").collect()
    if (slope < 0) {
      assert(r.length === 1)
      assert(r(0).getLong(0) === n)
      assert(math.abs(r(0).getDouble(1) - rnd(slope * 1e6) / 1e6)
        <= 1e-9)
      assert(math.abs(r(0).getDouble(2)
        - rnd(-math.log(2.0) / slope * 100) / 100.0) <= 1e-9)
    } else assert(r.isEmpty)
  }

  test("q_esd3 matches the three-round fold") {
    val got = q("q_esd3").collect()
      .map(r => (r.getString(0), (r.get(1).toString, r.getDouble(2),
        r.get(3).toString, r.getDouble(4), r.get(5).toString,
        r.getDouble(6)))).toMap
    for ((t, ds0) <- dmean) {
      var ds = ds0
      val outs = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      for (_ <- 1 to 3) {
        val n = ds.length.toLong
        val sy = ds.map(_._2).sum
        val syy = ds.map(x => x._2 * x._2).sum
        val devs = ds.map { case (d0, y) => (d0, math.abs(y * n - sy)) }
        val mx = devs.map(_._2).max
        val d0 = devs.filter(_._2 == mx).map(_._1).min
        val z2 = mx.toDouble * mx / (n.toDouble * (n * syy - sy * sy))
        outs += ((d0, rnd(z2 * 1e4) / 1e4))
        ds = ds.filterNot(_._1 == d0)
      }
      val (g1, gz1, g2, gz2, g3, gz3) = got(t)
      assert(g1 === outs(0)._1); assert(math.abs(gz1 - outs(0)._2) <= 1e-9)
      assert(g2 === outs(1)._1); assert(math.abs(gz2 - outs(1)._2) <= 1e-9)
      assert(g3 === outs(2)._1); assert(math.abs(gz3 - outs(2)._2) <= 1e-9)
    }
  }

  test("q_robust_moments matches the octile fold") {
    val got = q("q_robust_moments").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2).sorted
      val n = ys.length.toLong
      def oct(m8: Int): Long = {
        val pos = (n - 1) * m8
        val lo = (pos / 8).toInt; val f = pos % 8
        ys(lo) * (8 - f) + (if (f > 0) ys(lo + 1) * f else 0L)
      }
      val (e1, e2, e3) = (oct(2), oct(4), oct(6))
      val (o1, o3, o5, o7) = (oct(1), oct(3), oct(5), oct(7))
      if (e3 > e1 && o5 != o1 && o7 != o3) {
        val bow = (e3 + e1 - e2 * 2).toDouble / (e3 - e1)
        val moo = ((o7 - o5) + (o3 - o1)).toDouble /
          (o5 - o1 + (o7 - o3))
        val (gn, gb, gm) = got(t)
        assert(gn === n)
        assert(math.abs(gb - rnd(bow * 1e4) / 1e4) <= 1e-9)
        assert(math.abs(gm - rnd(moo * 1e4) / 1e4) <= 1e-9)
      }
    }
  }

  test("q_adf_lite matches the cleared OLS fold") {
    val got = q("q_adf_lite").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val pairs = ds.map(_._2).sliding(2)
        .collect { case Array(py, y) => (py, y - py) }.toArray
      val n = pairs.length.toLong
      if (n > 3) {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val cxy = n * sxy - sx * sy
        val cxx = n * sxx - sx * sx
        val cyy = n * syy - sy * sy
        if (cxx > 0 && cyy.toDouble * cxx > cxy.toDouble * cxy) {
          val beta = cxy.toDouble / cxx
          val tStat = beta / math.sqrt((cyy.toDouble
            - cxy.toDouble * cxy / cxx) / (n - 2) * n / cxx.toDouble)
          val (gn, gb, gt) = got(t)
          assert(gn === n)
          assert(math.abs(gb - rnd(beta * 1e6) / 1e6) <= 1e-9)
          assert(math.abs(gt - rnd(tStat * 1e4) / 1e4) <= 1e-9)
        }
      }
    }
  }

  test("q_qs_seasonal matches the snapped-rho fold") {
    val got = q("q_qs_seasonal").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length.toLong
      val sy = ys.sum; val syy = ys.map(y => y * y).sum
      val clr = n * syy - sy * sy
      if (clr > 0) {
        var srsq = 0.0; var lagsDone = 0
        for (k <- Seq(7, 14) if ys.length > k) {
          val pairs = (0 until ys.length - k).map(i => (ys(i), ys(i + k)))
          val m = pairs.length.toLong
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
          val rho = rnd((m * sxy - sa * sb).toDouble * n /
            (m.toDouble * clr) * 1e9)
          srsq += (rho.toDouble * rho / 1e18) / (n - k)
          lagsDone += 1
        }
        if (lagsDone == 2) {
          val qs = n * (n + 2) * srsq
          val (gn, gq) = got(t)
          assert(gn === n)
          assert(math.abs(gq - rnd(qs * 1e4) / 1e4) <= 1e-9)
        }
      }
    }
  }
}
