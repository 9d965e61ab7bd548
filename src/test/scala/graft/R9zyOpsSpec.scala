package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-52 semantics (queries/StatsR9zy.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zyOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_zero_inflation matches the score-test fold") {
    val ks = graft.tables.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1) == "purchase"))
      .groupBy(_._1).map(_._2.count(_._2).toLong).toArray
    val n = ks.length.toLong; val sk = ks.sum
    val n0 = ks.count(_ == 0L).toLong
    val lam = sk.toDouble / n; val p0 = math.exp(-lam)
    val den = n * p0 * (1.0 - p0) - n * lam * p0 * p0
    val r = q("q_zero_inflation").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(lam, 6))
    assert(r.getLong(2) == n0)
    assert(r.getDouble(3) == rnd(n * p0, 4))
    assert(r.getDouble(4) == rnd(math.pow(n0 - n * p0, 2) / den, 6))
  }

  test("q_distribution_overlap matches the OVL fold") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select(dayofweek(col("ts")), col("value")).collect()
      .map(r => (Set(1, 7)(r.getInt(0)),
        math.min(math.floor(r.getDouble(1) / 10).toLong, 19L)))
    val t1 = rows.count(_._1).toLong; val t2 = rows.count(!_._1).toLong
    val su = rows.groupBy(_._2).map { case (_, g) =>
      val n1 = g.count(_._1).toLong; val n2 = g.count(!_._1).toLong
      rndL(math.min(n1.toDouble / t1, n2.toDouble / t2) * 1e9)
    }.sum
    val r = q("q_distribution_overlap").collect()(0)
    assert(r.getLong(0) == t1 && r.getLong(1) == t2)
    assert(r.getDouble(2) == rnd(su / 1e9, 6))
  }

  test("q_mean_residual_life matches the excess fold") {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val xs = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
      .groupBy(_._1).toArray
      .map { case (c, g) => (c, g.map(_._2).sum) }.filter(_._2 > 0)
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = xs.length.toLong
    val want = Seq(50L, 75L, 90L).map { p =>
      val u = xs(((n * p + 99) / 100 - 1).toInt)
      val ex = xs.filter(_ > u)
      (p, rnd(u / 100.0, 2), ex.length.toLong,
        rnd(ex.map(_ - u).sum.toDouble / ex.length / 100, 2))
    }
    val got = q("q_mean_residual_life").collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
  }

  test("q_trading_day_adjust matches the factor fold") {
    val day = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date").cast("string"),
        col("l_extendedprice"),
        dayofweek(col("l_shipdate")).cast("long"),
        date_trunc("month", col("l_shipdate")).cast("date")
          .cast("string")).collect()
      .map(r => (r.getString(0), rndL(r.getDouble(1) * 100),
        r.getLong(2), r.getString(3)))
      .groupBy(_._1).toArray
      .map { case (_, g) => (g.map(_._2).sum, g.head._3, g.head._4) }
    val tr = day.map(_._1).sum; val td = day.length.toLong
    val fOf = day.groupBy(_._2).map { case (wd, g) =>
      (wd, rndL((g.map(_._1).sum.toDouble / g.length)
        / (tr.toDouble / td) * 1e6))
    }
    val want = day.groupBy(_._3).toArray.sortBy(_._1)
      .map { case (m, g) =>
        val actual = g.map(_._1).sum
        val sf0 = g.map(d0 => fOf(d0._2)).sum
        val idx = sf0.toDouble / g.length / 1e6
        (m, rnd(actual / 100.0, 2), rnd(idx, 6),
          rnd(actual.toDouble / idx / 100, 2))
      }
    val got = q("q_trading_day_adjust").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_gini_stump matches the exact-square sweep fold") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select("value", "event_type").collect()
      .map(r => (rndL(r.getDouble(0) * 100),
        if (r.getString(1) == "purchase") 1L else 0L))
    val grid = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (v, g) => (v, g.map(_._2).sum,
        g.length.toLong - g.map(_._2).sum) }
    val p = grid.map(_._2).sum; val qq = grid.map(_._3).sum
    var pl = 0L; var ql = 0L
    var best = Double.NegativeInfinity; var bestV = 0L
    grid.foreach { case (v, dp, dq) =>
      val nl = pl + ql; val nr = p + qq - nl
      if (nl > 0 && nr > 0) {
        val score = (pl * pl + ql * ql).toDouble / nl +
          ((p - pl) * (p - pl) + (qq - ql) * (qq - ql)).toDouble / nr
        if (score > best) { best = score; bestV = v }
      }
      pl += dp; ql += dq
    }
    val n = p + qq
    val r = q("q_gini_stump").collect()(0)
    assert(r.getDouble(0) == rnd(bestV / 100.0, 2))
    assert(r.getDouble(1) ==
      rnd(1.0 - (p * p + qq * qq).toDouble / (n * n), 6))
    assert(r.getDouble(2) == rnd(1.0 - best / n, 6))
    assert(r.getDouble(3) ==
      rnd((best - (p * p + qq * qq).toDouble / n) / n, 6))
  }

  test("q_rank_distance matches the dual-ranking fold") {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val br = graft.tables.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (brandOf(r.getLong(0)), rndL(r.getDouble(1) * 100),
        r.getDouble(2).toLong))
      .groupBy(_._1).toArray
      .map { case (b, g) => (b, g.map(_._2).sum, g.map(_._3).sum) }
    val r1 = br.sortBy(t => (-t._2, t._1)).zipWithIndex
      .map { case (t, i) => (t._1, (i + 1).toLong) }.toMap
    val r2 = br.sortBy(t => (-t._3, t._1)).zipWithIndex
      .map { case (t, i) => (t._1, (i + 1).toLong) }.toMap
    val bs = br.map(_._1).sorted
    val disc = (for {
      i <- bs.indices; j <- (i + 1) until bs.length
    } yield {
      (r1(bs(i)) < r1(bs(j))) != (r2(bs(i)) < r2(bs(j)))
    }).count(identity).toLong
    val nPairs = (bs.length * (bs.length - 1) / 2).toLong
    val foot = bs.map(b => math.abs(r1(b) - r2(b))).sum
    val r = q("q_rank_distance").collect()(0)
    assert(r.getLong(0) == bs.length.toLong)
    assert(r.getLong(1) == disc)
    assert(r.getDouble(2) == rnd(disc.toDouble / nPairs, 6))
    assert(r.getLong(3) == foot)
  }
}
