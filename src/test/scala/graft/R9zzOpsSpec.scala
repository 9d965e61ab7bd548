package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-53 semantics (queries/StatsR9zz.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zzOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per-type daily milli-means (sorted) and counts. */
  private lazy val daily: Map[String, Array[(String, Long, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1).map { case (d, rows) =>
          (d, rows.map(_._3).sum / rows.length, rows.length.toLong)
        })
      }

  private def rets(series: Array[Long]): Array[Long] =
    series.sliding(2)
      .map(a => rndL(math.log(a(1).toDouble / a(0)) * 1e6)).toArray

  test("q_event_study_car matches the window fold") {
    val allDaily = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e3).toLong))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (d, g) => (d, g.map(_._2).sum / g.length) }
    val mRet = allDaily.drop(1).map(_._1)
      .zip(rets(allDaily.map(_._2))).toMap
    val want = daily.toArray.sortBy(_._1).map { case (t, rows) =>
      val tr = rows.drop(1).map(_._1).zip(rets(rows.map(_._2)))
      val ab = tr.flatMap { case (d, r) =>
        mRet.get(d).map(m => (d, r - m)) }
      val iOf = ab.map(_._1).zipWithIndex
        .map { case (d, i) => (d, i + 1) }.toMap
      val top3 = rows.sortBy(r => (-r._3, r._1)).take(3).map(_._1)
        .flatMap(iOf.get)
      val cars = top3.map { ei =>
        ab.zipWithIndex.filter { case (_, i0) =>
          i0 + 1 >= ei - 2 && i0 + 1 <= ei + 2
        }.map(_._1._2).sum
      }
      (t, cars.length.toLong,
        rnd(cars.sum.toDouble / cars.length / 1e6, 6))
    }
    val got = q("q_event_study_car").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_engle_granger matches the residual-ADF fold") {
    val vm = daily("view").map(r => (r._1, r._2)).toMap
    val pr = daily("click").flatMap { case (d, x, _) =>
      vm.get(d).map(y => (d, x, y)) }.sortBy(_._1)
    val n0 = pr.length.toLong
    val sx = pr.map(_._2).sum; val sy = pr.map(_._3).sum
    val sxy = pr.map(p => p._2 * p._3).sum
    val sxx = pr.map(p => p._2 * p._2).sum
    val cxy = n0 * sxy - sx * sy; val cxx = n0 * sxx - sx * sx
    val b = cxy.toDouble / cxx
    val a = (sy - b * sx) / n0
    val es = pr.map(p => rndL((p._3 - a - b * p._2) * 1e6))
    val lg = es.sliding(2).map(w => (w(1) - w(0), w(0))).toArray
    val n = lg.length.toLong
    val sx2 = lg.map(x => BigInt(x._2)).sum
    val sy2 = lg.map(x => BigInt(x._1)).sum
    val sxy2 = lg.map(x => BigInt(x._2) * x._1).sum
    val sxx2 = lg.map(x => BigInt(x._2) * x._2).sum
    val syy2 = lg.map(x => BigInt(x._1) * x._1).sum
    val c2xy = BigInt(n) * sxy2 - sx2 * sy2
    val c2xx = BigInt(n) * sxx2 - sx2 * sx2
    val c2yy = BigInt(n) * syy2 - sy2 * sy2
    val beta = c2xy.toDouble / c2xx.toDouble
    val t = beta / math.sqrt((c2yy.toDouble
      - c2xy.toDouble * c2xy.toDouble / c2xx.toDouble)
      / (n - 2) * n / c2xx.toDouble)
    val r = q("q_engle_granger").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(beta, 6))
    assert(r.getDouble(2) == rnd(t, 4))
    if (beta + 1 > 0 && beta + 1 < 1)
      assert(r.getDouble(3) ==
        rnd(-math.log(2.0) / math.log(beta + 1), 4))
  }

  test("q_convergence matches the snapped half fold") {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val per = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map { r =>
        val (c, od) = oc(r.getLong(0))
        (c, od < "1998-01-01", rndL(r.getDouble(1) * 100))
      }
      .groupBy(_._1).toArray
      .map { case (_, g) =>
        (g.filter(_._2).map(_._3).sum, g.filter(!_._2).map(_._3).sum)
      }.filter(p => p._1 > 0 && p._2 > 0)
    val sn = per.map { case (r1, r2) =>
      (rndL(math.log(r1.toDouble) * 1e6),
        rndL((math.log(r2.toDouble) - math.log(r1.toDouble)) * 1e6))
    }
    val n = sn.length.toLong
    val sx = sn.map(x => BigInt(x._1)).sum
    val sy = sn.map(x => BigInt(x._2)).sum
    val sxy = sn.map(x => BigInt(x._1) * x._2).sum
    val sxx = sn.map(x => BigInt(x._1) * x._1).sum
    val s22 = sn.map(x => BigInt(x._1 + x._2) * (x._1 + x._2)).sum
    val s2 = sn.map(x => BigInt(x._1 + x._2)).sum
    val r = q("q_convergence").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd((BigInt(n) * sxy - sx * sy).toDouble
      / (BigInt(n) * sxx - sx * sx).toDouble, 6))
    assert(r.getDouble(2) == rnd(math.sqrt(
      (n * sxx.toDouble - sx.toDouble * sx.toDouble)
        / (n.toDouble * (n - 1))) / 1e6, 6))
    assert(r.getDouble(3) == rnd(math.sqrt(
      (n * s22.toDouble - s2.toDouble * s2.toDouble)
        / (n.toDouble * (n - 1))) / 1e6, 6))
  }

  test("q_gompertz_fit matches the linearization fold") {
    val fw = graft.tables.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        date_trunc("week", col("o_orderdate")).cast("date")
          .cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (_, g) => g.map(_._2).min }
    val wk = fw.groupBy(identity).toArray.sortBy(_._1)
      .map { case (_, g) => g.size.toLong }
    val nn = wk.sum
    var cum = 0L
    val zs = wk.zipWithIndex.flatMap { case (y, i0) =>
      cum += y
      if (cum > 0 && cum < nn)
        Some(((i0 + 1).toLong, rndL(math.log(
          -math.log(cum.toDouble / nn)) * 1e6)))
      else None
    }
    val n = zs.length.toLong
    val sx = zs.map(_._1).sum; val sy = zs.map(_._2).sum
    val sxy = zs.map(p => p._1 * p._2).sum
    val sxx = zs.map(p => p._1 * p._1).sum
    val cxx = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy).toDouble / cxx
    val r = q("q_gompertz_fit").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(slope / 1e6, 6))
    assert(r.getDouble(2) == rnd((sy - slope * sx) / n / 1e6, 6))
  }

  /** Daily brand demand. */
  private lazy val brandDaily: Map[String, Array[Long]] = {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        col("l_shipdate").cast("date").cast("string"),
        col("l_quantity")).collect()
      .map(r => (brandOf(r.getLong(0)), r.getString(1),
        r.getDouble(2).toLong))
      .groupBy(_._1).map { case (b, g) =>
        (b, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, rows) => rows.map(_._3).sum })
      }
  }

  private def sd(qs: Array[Long]): Double = {
    val n = qs.length.toLong
    val sq = qs.sum; val sqq = qs.map(x => x * x).sum
    math.sqrt((n * sqq.toDouble - sq.toDouble * sq)
      / (n.toDouble * (n - 1)))
  }

  test("q_risk_pooling matches the pooled-sd fold") {
    val sds = brandDaily.values.filter(_.length > 1)
      .map(qs => rndL(sd(qs) * 1e6)).toArray
    val dayTot = brandDaily.toArray.flatMap { case (_, qs) => qs }
    // pooled = sd of DAILY TOTAL demand
    val byDay = {
      val brandOf = graft.tables.Tables.part(spark, sf)
        .select("p_partkey", "p_brand").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      graft.tables.Tables.lineitem(spark, sf)
        .select(col("l_shipdate").cast("date").cast("string"),
          col("l_quantity")).collect()
        .map(r => (r.getString(0), r.getDouble(1).toLong))
        .groupBy(_._1).toArray
        .map { case (_, g) => g.map(_._2).sum }
    }
    val pooled = sd(byDay)
    val r = q("q_risk_pooling").collect()(0)
    assert(r.getLong(0) == sds.length.toLong)
    assert(r.getDouble(1) == rnd(sds.sum / 1e6, 6))
    assert(r.getDouble(2) == rnd(pooled, 6))
    assert(r.getDouble(3) == rnd(pooled / (sds.sum / 1e6), 6))
  }

  test("q_safety_stock matches the z-sigma fold") {
    val want = brandDaily.toArray.filter(_._2.length > 1)
      .map { case (b, qs) =>
        val s0 = sd(qs)
        (b, rnd(qs.sum.toDouble / qs.length, 6), rnd(s0, 6),
          rnd(1.645 * s0 * math.sqrt(7.0), 4))
      }.sortBy { case (b, _, _, ss) => (-ss, b) }.take(10)
    val got = q("q_safety_stock").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
