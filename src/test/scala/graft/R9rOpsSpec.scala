package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-18 semantics (queries/StatsR9r.scala + the two streaming
  * keys): folds over the collected sf0.001 tables; streaming keys
  * checked against the same folds (batch equivalence through real
  * state stores).
  */
class R9rOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ords: Array[(Long, Long, Double, String)] =
    graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))

  private lazy val li: Array[(Long, Long, Double, Double, String)] =
    graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate").cast("date")
          .cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))

  test("q_yoy_growth matches the lag-12 fold") {
    val m = ords.groupBy(_._4.take(7)).map { case (mo, g) =>
      (mo, g.map(o => rnd(o._3 * 100)).sum)
    }.toArray.sortBy(_._1)
    val got = q("q_yoy_growth").collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    var checked = 0
    for (i <- 12 until m.length) {
      val prev = m(i - 12)._2
      if (prev > 0) {
        val (grev, gyoy) = got(m(i)._1)
        assert(math.abs(grev - rnd(m(i)._2 / 100.0 * 100) / 100.0)
          <= 1e-9)
        assert(math.abs(gyoy - rnd((m(i)._2.toDouble / prev - 1) * 100
          * 1e4) / 1e4) <= 1e-9)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_laspeyres matches the base-weight fold") {
    val brand = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val grouped = li.groupBy(l => (brand(l._2),
      if (l._5 < "1996-01-01") 0 else 1))
    val brands = grouped.keys.map(_._1).toArray.distinct
    var den = 0L; var num = 0L; var nb = 0L
    for (b <- brands) {
      (grouped.get((b, 0)), grouped.get((b, 1))) match {
        case (Some(g0), Some(g1)) =>
          val s0 = g0.map(l => rnd(l._4 * 100)).sum
          val q0 = g0.map(_._3.toLong).sum
          val s1 = g1.map(l => rnd(l._4 * 100)).sum
          val q1 = g1.map(_._3.toLong).sum
          if (q0 > 0 && q1 > 0) {
            den += s0; num += rnd(s1.toDouble * q0 / q1); nb += 1
          }
        case _ =>
      }
    }
    val r = q("q_laspeyres").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === nb)
    assert(math.abs(r(0).getDouble(1)
      - rnd(num.toDouble / den * 1e6) / 1e6) <= 1e-9)
  }

  test("q_repeat_part_rate matches the pair fold") {
    val cust = ords.map(o => o._1 -> o._2).toMap
    val brand = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pairs = li.flatMap(l => cust.get(l._1).map(c =>
      (brand(l._2), c, l._2)))
      .groupBy(identity).map { case (k, g) => k -> g.length }
    val got = q("q_repeat_part_rate").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((b, g) <- pairs.groupBy(_._1._1)) {
      val n = g.size.toLong
      val rep = g.count(_._2 >= 2).toLong
      val (gn, gr, grt) = got(b)
      assert(gn === n)
      assert(gr === rep)
      assert(math.abs(grt - rnd(rep.toDouble / n * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_segment_aov matches the med2 fold") {
    val seg = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = q("q_segment_aov").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((sg, g) <- ords.groupBy(o => seg(o._2))) {
      val cents = g.map(o => (rnd(o._3 * 100), o._1))
        .sortBy(identity).map(_._1)
      val n = cents.length
      val p1 = (n + 1) / 2; val p2 = n / 2 + 1
      val med2 = cents(p1 - 1) + cents(p2 - 1)
      val (gn, gaov, gmed) = got(sg)
      assert(gn === n.toLong)
      assert(math.abs(gaov - rnd(cents.sum.toDouble / n / 100 * 100)
        / 100.0) <= 1e-9)
      assert(math.abs(gmed - rnd(med2 / 200.0 * 100) / 100.0) <= 1e-9)
    }
  }

  test("s_stream_vwap equals the batch ratio fold") {
    val evs = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = q("s_stream_vwap").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, g) <- evs.groupBy(_._1)) {
      val sp = g.map(e => rnd(e._2 * 100)).sum
      val (gn, gv) = got(t)
      assert(gn === g.length.toLong)
      assert(math.abs(gv - rnd(sp.toDouble / g.length / 100 * 1e4)
        / 1e4) <= 1e-9)
    }
  }

  test("s_stream_ring_zscore equals the ring fold") {
    val evs = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")),
        col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val got = q("s_stream_ring_zscore").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    for ((t, g) <- evs.groupBy(_._1)) {
      var ring = List.empty[Long]
      var alarms = 0L
      for (e <- g.sortBy(x => (x._2, x._3))) {
        val v = rnd(e._4 * 100)
        if (ring.length == 20) {
          val s1 = ring.sum
          val s2 = ring.map(x => x * x).sum
          val dev = 20L * v - s1
          if (20L * s2 > s1 * s1 && dev * dev > 4L * (20L * s2 - s1 * s1))
            alarms += 1
        }
        ring = (ring :+ v).takeRight(20)
      }
      val (gn, ga) = got(t)
      assert(gn === g.length.toLong)
      assert(ga === alarms)
    }
  }
}
