package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-46 semantics (queries/StatsR9zs.scala): brute-force folds
  * over the collected sf0.001 tables, with ErfCore as the shared Φ.
  */
class R9zsOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Snapped log-revenue grid + moments. */
  private lazy val xu: Array[Long] = {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
      .groupBy(_._1).toArray.map { case (_, g) => g.map(_._2).sum }
      .filter(_ > 0).map(x => rndL(math.log(x.toDouble) * 1e6))
  }

  private lazy val (muV, sdV) = {
    val n = xu.length.toLong
    val sx = xu.sum
    val sxx = xu.map(x => BigInt(x) * x).sum
    (sx.toDouble / n,
      math.sqrt((n * sxx.toDouble - sx.toDouble * sx)
        / (n.toDouble * (n - 1))))
  }

  private lazy val uu: Array[Long] = xu.map { x =>
    val z = (x - muV) / sdV
    val phi = 0.5 * (1.0 + graft.expr.ErfCore.erf(z / math.sqrt(2.0)))
    math.max(1L, math.min(999999999L, rndL(phi * 1e9)))
  }.sorted

  test("q_lilliefors matches the snapped-Phi envelope fold") {
    val n = uu.length.toLong
    val dp = uu.zipWithIndex.map { case (u, i0) =>
      (i0 + 1L) * 1000000000L - n * u }.max
    val dm = uu.zipWithIndex.map { case (u, i0) =>
      n * u - i0.toLong * 1000000000L }.max
    val dd = math.max(dp, dm).toDouble / (n.toDouble * 1e9)
    val r = q("q_lilliefors").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(dd, 6))
    assert(r.getDouble(2) == rnd(dd * (math.sqrt(n.toDouble) - 0.01
      + 0.85 / math.sqrt(n.toDouble)), 6))
  }

  test("q_ad_normal matches the mirror-term fold") {
    val n = uu.length
    val st = (0 until n).map { i0 =>
      val i = i0 + 1L
      rndL((2 * i - 1) * (math.log(uu(i0) / 1e9)
        + math.log(1.0 - uu(n - 1 - i0) / 1e9)) * 1e6)
    }.sum
    val a2 = -n.toDouble - st / (n.toDouble * 1e6)
    val r = q("q_ad_normal").collect()(0)
    assert(r.getLong(0) == n.toLong)
    assert(r.getDouble(1) == rnd(a2, 6))
    assert(r.getDouble(2) == rnd(a2 * (1.0 + 0.75 / n
      + 2.25 / (n.toDouble * n)), 6))
  }

  test("q_empirical_rule matches the within-count fold") {
    val n = xu.length.toLong
    val want = Seq(1, 2, 3).map { k =>
      val within = xu.count(x => math.abs(x - muV) <= k * sdV).toLong
      (k, within, rnd(within.toDouble / n, 6),
        rnd(graft.expr.ErfCore.erf(k / math.sqrt(2.0)), 6),
        rnd(1.0 - 1.0 / (k * k), 6))
    }
    val got = q("q_empirical_rule").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == want)
  }

  /** Daily (n_t, purchases, errors). */
  private lazy val days: Array[(Long, Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, g) => (g.length.toLong,
        g.count(_._2 == "purchase").toLong,
        g.count(_._2 == "error").toLong) }

  test("q_p_chart matches the cleared-limit fold") {
    val nn = days.map(_._1).sum; val kk = days.map(_._2).sum
    val ooc = days.count { case (nt, xt, _) =>
      val dv = xt * nn - nt * kk
      dv * dv > 9L * kk * (nn - kk) * nt
    }.toLong
    val r = q("q_p_chart").collect()(0)
    assert(r.getLong(0) == days.length.toLong)
    assert(r.getDouble(1) == rnd(kk.toDouble / nn, 6))
    assert(r.getLong(2) == ooc)
  }

  test("q_c_chart matches the cleared-limit fold") {
    val nd = days.length.toLong; val sc = days.map(_._3).sum
    val ooc = days.count { case (_, _, ct) =>
      val dv = ct * nd - sc
      dv * dv > 9L * sc * nd
    }.toLong
    val r = q("q_c_chart").collect()(0)
    assert(r.getLong(0) == nd)
    assert(r.getDouble(1) == rnd(sc.toDouble / nd, 6))
    assert(r.getDouble(2) == rnd(sc.toDouble / nd
      + 3.0 * math.sqrt(sc.toDouble / nd), 4))
    assert(r.getLong(3) == ooc)
  }

  test("q_we_rules matches the sign-run fold") {
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
      val n = ys.length.toLong; val sy = ys.sum
      val sides = ys.map(y => java.lang.Long.signum(y * n - sy).toLong)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      sides.foreach { s0 =>
        if (runs.nonEmpty && runs.last._1 == s0)
          runs(runs.length - 1) = (s0, runs.last._2 + 1)
        else runs += ((s0, 1))
      }
      val viol = runs.count(r0 => r0._1 != 0 && r0._2 >= 8).toLong
      val longest = runs.filter(_._1 != 0).map(_._2.toLong)
        .foldLeft(0L)(math.max)
      (t, viol, longest)
    }
    val got = q("q_we_rules").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }
}
