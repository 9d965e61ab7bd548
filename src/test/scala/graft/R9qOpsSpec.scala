package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-17 semantics (queries/StatsR9q.scala): folds over the
  * collected sf0.001 TPC-H tables.
  */
class R9qOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (orderkey, linenumber, partkey, qty, price, discount, shipdate)
  private lazy val li: Array[(Long, Long, Long, Double, Double, Double, String)] =
    graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_shipdate").cast("date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))

  private lazy val ords: Array[(Long, Long, String, String)] =
    graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"),
        col("o_orderdate").cast("date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))

  private def days(a: String, b: String): Long =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))

  test("q_lead_time matches the x20-cleared fold") {
    val prio = ords.map(o => o._1 -> (o._3, o._4)).toMap
    val got = q("q_lead_time").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((p, g) <- li.flatMap(l => prio.get(l._1).map(o =>
        (o._1, days(o._2, l._7)))).groupBy(_._1)) {
      val leads = g.map(_._2).sorted
      val n = leads.length.toLong
      def v(m20: Int): Long = {
        val pos = (n - 1) * m20
        val lo = (pos / 20).toInt; val f = pos % 20
        leads(lo) * (20 - f) + (if (f > 0) leads(lo + 1) * f else 0L)
      }
      val (gn, g50, g90, gm) = got(p)
      assert(gn === n)
      assert(math.abs(g50 - rnd(v(10) / 20.0 * 100) / 100.0) <= 1e-9)
      assert(math.abs(g90 - rnd(v(18) / 20.0 * 100) / 100.0) <= 1e-9)
      assert(math.abs(gm - rnd(leads.sum.toDouble / n * 1e4) / 1e4)
        <= 1e-9)
    }
  }

  test("q_segment_migration matches the tercile fold") {
    def ntile3(xs: Array[(Long, Long)]): Map[Long, Int] = {
      val sorted = xs.sortBy(x => (x._2, x._1))
      val n = sorted.length
      val base = n / 3; val extra = n % 3
      var idx = 0
      val out = scala.collection.mutable.Map.empty[Long, Int]
      for (b <- 0 until 3) {
        val sz = base + (if (b < extra) 1 else 0)
        for (_ <- 0 until sz) { out(sorted(idx)._1) = b + 1; idx += 1 }
      }
      out.toMap
    }
    val h1 = ntile3(ords.filter(_._4 < "1996-01-01").groupBy(_._2)
      .map { case (c, g) => (c, g.length.toLong) }.toArray)
    val h2 = ntile3(ords.filter(_._4 >= "1996-01-01").groupBy(_._2)
      .map { case (c, g) => (c, g.length.toLong) }.toArray)
    val m = h1.keySet.intersect(h2.keySet).toArray
      .map(c => (h1(c).toLong, h2(c).toLong))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val rows = m.groupBy(_._1._1).map { case (s1, g) => s1 -> g.values.sum }
    val got = q("q_segment_migration").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === m.keySet.toSet)
    for ((k, n) <- m) {
      val (gn, gs) = got(k)
      assert(gn === n)
      assert(math.abs(gs - rnd(n.toDouble / rows(k._1) * 1e4) / 1e4)
        <= 1e-9)
    }
  }

  test("q_fill_rate matches the synthesized-column fold") {
    val modes = Array("AIR", "MAIL", "RAIL", "SHIP", "TRUCK")
    val acc = scala.collection.mutable
      .Map.empty[String, (Long, Long, Long)]
    for (l <- li) {
      val mode = modes(((l._1 + l._2) % 5).toInt)
      val commit = (l._1 % 10 + 5).toInt
      val receipt = ((l._1 + l._2) % 14 + 1).toInt
      val ontime = if (receipt <= commit) 1L else 0L
      val slack = (commit - receipt).toLong
      val (n, o, sl) = acc.getOrElse(mode, (0L, 0L, 0L))
      acc(mode) = (n + 1, o + ontime, sl + slack)
    }
    val got = q("q_fill_rate").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === acc.keySet.toSet)
    for ((m, (n, o, sl)) <- acc) {
      val (gn, go, gr, gs) = got(m)
      assert(gn === n)
      assert(go === o)
      assert(math.abs(gr - rnd(o.toDouble / n * 1e6) / 1e6) <= 1e-9)
      assert(math.abs(gs - rnd(sl.toDouble / n * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_discount_bands matches the exact-money fold") {
    val acc = scala.collection.mutable
      .Map.empty[Long, (Long, Double, Long)]
    for (l <- li) {
      val band = rnd(l._6 * 100)
      val net = rnd(l._5 * 100) * (100 - band)
      val (n, qsum, nu) = acc.getOrElse(band, (0L, 0.0, 0L))
      acc(band) = (n + 1, qsum + l._4, nu + net)
    }
    val got = q("q_discount_bands").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got.keySet === acc.keySet.toSet)
    for ((b, (n, qs, nu)) <- acc) {
      val (gn, gq, gr) = got(b)
      assert(gn === n)
      assert(math.abs(gq - rnd(qs / n * 1e4) / 1e4) <= 1e-9)
      assert(math.abs(gr - rnd(nu / 1e4 / 100 * 100) / 100.0) <= 1e-9)
    }
  }

  test("q_never_ordered matches the anti-join fold") {
    val ordered = li.map(_._3).toSet
    val parts = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = q("q_never_ordered").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((b, g) <- parts.groupBy(_._2)) {
      val never = g.count(p => !ordered.contains(p._1)).toLong
      val (gn, gv, gs) = got(b)
      assert(gn === g.length.toLong)
      assert(gv === never)
      assert(math.abs(gs - rnd(never.toDouble / g.length * 1e4) / 1e4)
        <= 1e-9)
    }
  }

  test("q_largest_remainder matches the Hare fold") {
    val srcs = graft.tables.Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nn = srcs.map(_._2).sum
    val quo = srcs.map { case (s0, nd) =>
      (s0, nd, nd * 100 / nn, nd * 100 % nn)
    }
    val sb = quo.map(_._3).sum
    val bonusSet = quo.sortBy(x => (-x._4, x._1)).take((100 - sb).toInt)
      .map(_._1).toSet
    val got = q("q_largest_remainder").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    var tot = 0L
    for ((s0, nd, base, _) <- quo) {
      val slots = base + (if (bonusSet(s0)) 1L else 0L)
      val (gn, gs) = got(s0)
      assert(gn === nd)
      assert(gs === slots)
      tot += slots
    }
    assert(tot === 100L)
  }
}
