package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-43 semantics (queries/StatsR9zp.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zpOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Consecutive (ok1, ok2) order pairs per customer. */
  private lazy val consec: Array[(Long, Long)] =
    graft.tables.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).values.flatMap { g =>
        val sorted = g.sortBy(o => (o._3, o._2)).map(_._2)
        sorted.zip(sorted.drop(1))
      }.toArray

  private lazy val orderBrands: Map[Long, Set[String]] = {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), brandOf(r.getLong(1))))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).toSet) }
  }

  test("q_seq_pairs matches the sequence fold") {
    val withB = consec.filter(p =>
      orderBrands.contains(p._1) && orderBrands.contains(p._2))
    val pairs = withB.flatMap { case (o1, o2) =>
      for (b1 <- orderBrands(o1).toSeq; b2 <- orderBrands(o2).toSeq)
        yield (b1, b2)
    }.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    // the base counts every pair whose EARLIER order has brands —
    // the later order need not (matching the impl's single join)
    val base = consec.filter(p => orderBrands.contains(p._1))
      .flatMap(p => orderBrands(p._1).toSeq)
      .groupBy(identity).map { case (b, g) => (b, g.length.toLong) }
    val want = pairs.toArray.map { case ((b1, b2), s0) =>
      (b1, b2, s0, rnd(s0.toDouble / base(b1), 6))
    }.sortBy { case (b1, b2, s0, _) => (-s0, b1, b2) }.take(10)
    val got = q("q_seq_pairs").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_brand_loyalty matches the repeat fold") {
    val withB1 = consec.filter(p => orderBrands.contains(p._1))
    val cur = withB1.flatMap { case (o1, o2) =>
      orderBrands(o1).toSeq.map(b => (b, o2))
    }
    val cn = cur.groupBy(_._1).map { case (b, g) => (b, g.length.toLong) }
    val rep = cur.filter { case (b, o2) =>
      orderBrands.get(o2).exists(_.contains(b))
    }.groupBy(_._1).map { case (b, g) => (b, g.length.toLong) }
    val want = cn.toArray.filter(_._2 >= 20)
      .map { case (b, n) =>
        val r = rep.getOrElse(b, 0L)
        (b, n, r, rnd(r.toDouble / n, 6))
      }.sortBy { case (b, _, _, l) => (-l, b) }.take(10)
    val got = q("q_brand_loyalty").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_hhi_trend matches the snapped-HHI trend fold") {
    val sm = graft.tables.Tables.lineitem(spark, sf)
      .select(date_trunc("month", col("l_shipdate")).cast("date")
        .cast("string"), col("l_suppkey"), col("l_extendedprice"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        rndL(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val hu = sm.toArray.groupBy(_._1._1).toArray.sortBy(_._1)
      .flatMap { case (_, g) =>
        val tot = g.map(_._2).sum
        if (tot <= 0) None
        else Some(rndL(g.map(x => BigInt(x._2) * x._2).sum.toDouble
          / (tot.toDouble * tot) * 1e9))
      }
    val n = hu.length.toLong
    val xs = (1L to n).toArray
    val sx = xs.sum; val sy = hu.sum
    val sxy = xs.zip(hu).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val cxy = n * sxy - sx * sy; val cxx = n * sxx - sx * sx
    val r = q("q_hhi_trend").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(sy.toDouble / n / 1e9, 6))
    assert(r.getDouble(2) == JBD.valueOf(cxy.toDouble / cxx / 1e9)
      .setScale(9, RoundingMode.HALF_UP).doubleValue)
  }

  test("q_ks_exponential matches the envelope fold") {
    val ts = graft.tables.Tables.events(spark, sf)
      .select(unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).map(_._1)
    val gaps = ts.sliding(2).map(a => a(1) - a(0)).toArray
    val n = gaps.length.toLong
    val sg = gaps.sum
    val us = gaps.map(g =>
      rndL((1.0 - math.exp(-g.toDouble * n / sg)) * 1e9)).sorted
    val dp = us.zipWithIndex.map { case (u, i0) =>
      (i0 + 1L) * 1000000000L - n * u }.max
    val dm = us.zipWithIndex.map { case (u, i0) =>
      n * u - i0.toLong * 1000000000L }.max
    val d = math.max(dp, dm)
    val r = q("q_ks_exponential").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(d.toDouble / (n.toDouble * 1e9), 6))
    assert(r.getDouble(2) ==
      rnd(math.sqrt(n.toDouble) * d / (n.toDouble * 1e9), 6))
  }

  test("q_calibration_slope matches the cleared-moment fold") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select("value", "event_type").collect()
      .map(r => (math.min(rndL(r.getDouble(0) * 5), 999L),
        if (r.getString(1) == "purchase") 1L else 0L))
    val n = rows.length.toLong
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxy = rows.map(p => p._1 * p._2).sum
    val sxx = rows.map(p => BigInt(p._1) * p._1).sum
    val cxy = BigInt(n) * sxy - BigInt(sx) * sy
    val cxx = BigInt(n) * sxx - BigInt(sx) * sx
    val slope = cxy.toDouble / cxx.toDouble
    val r = q("q_calibration_slope").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(slope * 1000, 6))
    assert(r.getDouble(2) == rnd((sy - slope * sx) / n, 6))
  }

  test("q_two_proportion matches the pooled-z fold") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select(dayofweek(col("ts")), col("event_type")).collect()
      .map(r => (Set(1, 7)(r.getInt(0)), r.getString(1) == "purchase"))
    val n1 = rows.count(_._1).toLong
    val x1 = rows.count(p => p._1 && p._2).toLong
    val n2 = rows.count(!_._1).toLong
    val x2 = rows.count(p => !p._1 && p._2).toLong
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    val r = q("q_two_proportion").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == x1)
    assert(r.getLong(2) == n2 && r.getLong(3) == x2)
    assert(r.getDouble(4) == rnd(p1 - p2, 6))
    assert(r.getDouble(5) == rnd(z, 6))
  }
}
