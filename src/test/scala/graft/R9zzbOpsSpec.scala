package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-55 semantics (queries/StatsR9zzb.scala): brute-force
  * folds over the collected sf0.001 tables.
  */
class R9zzbOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val orders: Array[(Long, Long, String, Long, String)] =
    graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        rndL(r.getDouble(3) * 100), r.getString(4)))

  test("q_boxplot_stats matches the five-number fold") {
    val want = orders.groupBy(_._5).toArray.sortBy(_._1)
      .map { case (p, g) =>
        val sorted = g.sortBy(o => (o._4, o._1)).map(_._4)
        val n = sorted.length.toLong
        def at(i: Long) = sorted((i - 1).toInt)
        val q1 = at((n + 3) / 4); val med = at((n + 1) / 2)
        val q3 = at((3 * n + 3) / 4)
        val hi = sorted.count(v => 2 * v > 5 * q3 - 3 * q1).toLong
        val lo = sorted.count(v => 2 * v < 5 * q1 - 3 * q3).toLong
        (p, n, rnd(q1 / 100.0, 2), rnd(med / 100.0, 2),
          rnd(q3 / 100.0, 2), rnd((q1 + 2 * med + q3) / 400.0, 2),
          lo, hi)
      }
    val got = q("q_boxplot_stats").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_expected_shortfall matches the tail fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (d, rows) => (d, rows.map(_._3).sum / rows.length) })
      }
    val want = daily.toArray.sortBy(_._1).map { case (t, rows) =>
      val rets = rows.sliding(2).map { a =>
        (a(1)._1, rndL(math.log(a(1)._2.toDouble / a(0)._2) * 1e6))
      }.toArray
      val sorted = rets.sortBy(r => (r._2, r._1))
      val n = sorted.length.toLong
      val varU = sorted(((n + 19) / 20 - 1).toInt)._2
      val tail = sorted.map(_._2).filter(_ <= varU)
      (t, n, rnd(varU / 1e6, 6),
        rnd(tail.sum.toDouble / tail.length / 1e6, 6))
    }
    val got = q("q_expected_shortfall").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_topk_stability matches the leaderboard fold") {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val odOf = orders.map(o => (o._1, o._3)).toMap
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_extendedprice").collect()
      .map(r => (if (odOf(r.getLong(0)) < "1998-01-01") 1 else 2,
        brandOf(r.getLong(1)), rndL(r.getDouble(2) * 100)))
    def top(h: Int): Array[(String, Long)] =
      li.filter(_._1 == h).groupBy(_._2)
        .map { case (b, g) => (b, g.map(_._3).sum) }.toArray
        .sortBy { case (b, rv) => (-rv, b) }.take(10)
        .zipWithIndex.map { case ((b, _), i) => (b, (i + 1).toLong) }
    val t1 = top(1).toMap; val t2 = top(2).toMap
    val common = t1.keySet.intersect(t2.keySet)
    val same = common.count(b => t1(b) == t2(b)).toLong
    val r = q("q_topk_stability").collect()(0)
    assert(r.getLong(0) == common.size.toLong)
    assert(r.getLong(1) == same)
    assert(r.getDouble(2) ==
      rnd(common.size.toDouble / (20 - common.size), 6))
  }

  test("q_activity_gini matches the sorted identity fold") {
    val ks = graft.tables.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).toArray
      .map { case (u, g) => (u, g.length.toLong) }
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = ks.length.toLong; val sk = ks.sum
    val sik = ks.zipWithIndex.map { case (k, i) => (i + 1L) * k }.sum
    val r = q("q_activity_gini").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(sk.toDouble / n, 6))
    assert(r.getDouble(2) ==
      rnd(2.0 * sik / (n.toDouble * sk) - (n + 1).toDouble / n, 6))
  }

  test("q_aov_trend matches the snapped trend fold") {
    val byM = orders.groupBy(_._3.substring(0, 7)).toArray
      .map { case (mp, g) =>
        (mp, g.map(_._4).sum, g.length.toLong)
      }.sortBy(_._1)
    val aov = byM.map { case (_, rev, n) =>
      rndL(rev.toDouble / n * 100) }
    val n = aov.length.toLong
    val xs = (1L to n).toArray
    val sx = xs.sum; val sy = aov.sum
    val sxy = xs.zip(aov).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val r = q("q_aov_trend").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(sy.toDouble / n / 1e4, 2))
    assert(r.getDouble(2) == rnd((n * sxy - sx * sy).toDouble
      / (n * sxx - sx * sx) / 1e4, 6))
  }

  test("q_priority_shift matches the first/last fold") {
    val per = orders.groupBy(_._2).values.filter(_.length >= 2)
      .map { g =>
        val sorted = g.toArray.sortBy(o => (o._3, o._1))
        (sorted.head._5.charAt(0).asDigit.toLong,
          sorted.last._5.charAt(0).asDigit.toLong)
      }.toArray
    val esc = per.count(p => p._2 < p._1).toLong
    val same = per.count(p => p._2 == p._1).toLong
    val de = per.count(p => p._2 > p._1).toLong
    val r = q("q_priority_shift").collect()(0)
    assert(r.getLong(0) == per.length.toLong)
    assert(r.getLong(1) == esc && r.getLong(2) == same)
    assert(r.getLong(3) == de)
    assert(r.getDouble(4) == rnd(esc.toDouble / per.length, 6))
  }
}
