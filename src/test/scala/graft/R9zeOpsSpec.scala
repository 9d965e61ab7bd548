package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-31 semantics (queries/StatsR9ze.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zeOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per-customer revenue cents, keyed. */
  private lazy val cust: Array[(Long, Long)] = {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
      .groupBy(_._1).toArray
      .map { case (c, g) => (c, g.map(_._2).sum) }
      .filter(_._2 > 0)
  }

  test("q_atkinson matches the snapped-geomean fold") {
    val n = cust.length.toLong
    val slg = cust.map(t => rndL(math.log(t._2.toDouble) * 1e6)).sum
    val sx = cust.map(_._2).sum
    val want = rnd(1.0 - math.exp(slg.toDouble / (n * 1e6)) * n / sx, 6)
    val r = q("q_atkinson").collect()(0)
    assert(r.getLong(0) == n && r.getDouble(1) == want)
  }

  test("q_palma matches the rank-cut fold") {
    val sorted = cust.sortBy(t => (t._2, t._1))
    val n = sorted.length.toLong
    val sx = sorted.map(_._2).sum
    val b40 = sorted.take(((4 * n) / 10).toInt).map(_._2).sum
    val t10 = sorted.takeRight((n / 10).toInt).map(_._2).sum
    val r = q("q_palma").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(b40.toDouble / sx, 6))
    assert(r.getDouble(2) == rnd(t10.toDouble / sx, 6))
    assert(r.getDouble(3) == rnd(t10.toDouble / b40, 6))
  }

  test("q_hoover matches the deviation fold") {
    val n = cust.length.toLong
    val sx = cust.map(_._2).sum
    val sdev = cust.map(t => (BigInt(n) * t._2 - sx).abs).sum
    val r = q("q_hoover").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(sdev.toDouble / (2.0 * n * sx), 6))
  }

  test("q_theil_decomp matches the decomposition fold") {
    val natOf = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val n = cust.length.toLong
    val sx = cust.map(_._2).sum
    val mu = sx.toDouble / n
    val st = cust.map(t =>
      rndL(t._2 / mu * math.log(t._2 / mu) * 1e9)).sum
    val grp = cust.groupBy(t => natOf(t._1))
    val tb = grp.values.map { g =>
      val ng = g.length; val sg = g.map(_._2).sum
      sg.toDouble / sx * math.log((sg.toDouble / ng) / mu)
    }.sum
    val r = q("q_theil_decomp").collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == grp.size.toLong)
    assert(r.getDouble(2) == rnd(st / 1e9 / n, 6))
    assert(math.abs(r.getDouble(3) - tb) < 1e-6)
    assert(math.abs(r.getDouble(4) - (st / 1e9 / n - tb)) < 2e-6)
  }

  test("q_tornqvist matches the snapped-term fold") {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate").cast("date").cast("string")).collect()
      .map(r => (brandOf(r.getLong(0)), r.getDouble(1).toLong,
        rndL(r.getDouble(2) * 100), r.getString(3)))
    val byBH = li.groupBy(l => (l._1, if (l._4 < "1996-01-01") 0 else 1))
      .map { case (k, g) => (k, (g.map(_._3).sum, g.map(_._2).sum)) }
    val brands = byBH.keys.map(_._1).toSet.toArray.sorted.flatMap { b =>
      for {
        (s0, q0) <- byBH.get((b, 0)) if q0 > 0 && s0 > 0
        (s1, q1) <- byBH.get((b, 1)) if q1 > 0 && s1 > 0
      } yield (s0, q0, s1, q1)
    }
    val t0 = brands.map(_._1).sum; val t1 = brands.map(_._3).sum
    val slt = brands.map { case (s0, q0, s1, q1) =>
      rndL((s0.toDouble / t0 + s1.toDouble / t1) / 2
        * math.log(s1.toDouble * q0 / (s0.toDouble * q1)) * 1e9)
    }.sum
    val r = q("q_tornqvist").collect()(0)
    assert(r.getLong(0) == brands.length.toLong)
    assert(r.getDouble(1) == rnd(math.exp(slt / 1e9), 6))
  }

  test("q_weibull_mrr matches the Benard regression fold") {
    val byU = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toArray
      .flatMap { case (u, g) =>
        val t0 = g.map(_._3).min
        val tps = g.filter(_._2 == "purchase").map(_._3)
        if (tps.isEmpty) None
        else {
          val tm = (tps.min - t0) / 60000000L
          if (tm >= 1) Some((u, tm)) else None
        }
      }
    val sorted = byU.sortBy(t => (t._2, t._1))
    val nn = sorted.length.toLong
    val pts = sorted.zipWithIndex.map { case ((_, tm), i0) =>
      val fi = (i0 + 1 - 0.3) / (nn + 0.4)
      (rndL(math.log(tm.toDouble) * 1e6),
        rndL(math.log(-math.log(1.0 - fi)) * 1e6))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val cxy = BigInt(n) * sxy - BigInt(sx) * sy
    val cxx = BigInt(n) * sxx - BigInt(sx) * sx
    val k = cxy.toDouble / cxx.toDouble
    val b = (sy - k * sx) / n
    val r = q("q_weibull_mrr").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(k, 6))
    assert(r.getDouble(2) == rnd(math.exp(-b / k / 1e6), 4))
  }
}
