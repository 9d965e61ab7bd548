package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-6 semantics (queries/StatsR9f.scala): each indicator/test
  * re-derived by a brute-force fold over the collected sf0.001
  * events, independent of the window/join shapes under test.
  */
class R9fOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (event_id, ts_us, day, event_type, value)
  private lazy val evs: Array[(Long, Long, String, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")),
        to_date(col("ts")).cast("string"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4)))

  // per-type day-ordered (day, h, l, c) in exact centi
  private lazy val ohlc: Map[String, Array[(String, Long, Long, Long)]] =
    evs.groupBy(_._4).map { case (t, g) =>
      t -> g.groupBy(_._3).map { case (d0, gg) =>
        val cs = gg.map(e => rnd(e._5 * 100))
        val last = gg.maxBy(e => (e._2, e._1))
        (d0, cs.max, cs.min, rnd(last._5 * 100))
      }.toArray.sortBy(_._1)
    }

  // per-type day-ordered daily milli mean y (exact integer div)
  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._4).map { case (t, g) =>
      t -> g.groupBy(_._3).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._5 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  test("q_aroon matches the latest-argmax age fold") {
    val got = q("q_aroon").collect()
      .map(r => ((r.getString(0), r.get(1).toString),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    var checked = 0
    for ((t, days) <- ohlc; i <- 24 until days.length) {
      val w = days.slice(i - 24, i + 1)
      val hMax = w.map(_._2).max
      val lMin = w.map(_._3).min
      val ageH = 24 - w.lastIndexWhere(_._2 == hMax)
      val ageL = 24 - w.lastIndexWhere(_._3 == lMin)
      val (gu, gd, go) = got((t, days(i)._1))
      assert(gu === (25L - ageH) * 4)
      assert(gd === (25L - ageL) * 4)
      assert(go === (25L - ageH) * 4 - (25L - ageL) * 4)
      checked += 1
    }
    assert(checked === got.size)
  }

  test("q_cci matches the cleared-MAD fold") {
    val got = q("q_cci").collect()
      .map(r => ((r.getString(0), r.get(1).toString), r.getDouble(2))).toMap
    var checked = 0
    for ((t, days) <- ohlc; i <- 19 until days.length) {
      val w = days.slice(i - 19, i + 1).map(x => x._2 + x._3 + x._4)
      val s = w.sum
      val tDev = w.map(x => math.abs(x * 20 - s)).sum
      if (tDev > 0) {
        val exp = rnd((w.last * 20 - s) * 10.0 / (tDev * 3L) * 1e4) / 1e4
        assert(math.abs(got((t, days(i)._1)) - exp) <= 1e-9)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_omega_ratio matches the gain/loss fold") {
    val got = q("q_omega_ratio").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val rs = ds.map(_._2).sliding(2).collect { case Array(py, y) =>
        rnd(math.log(y.toDouble / py) * 1e6)
      }.toArray
      val gains = rs.filter(_ > 0).sum
      val losses = -rs.filter(_ < 0).sum
      if (losses > 0) {
        val (gn, gg, gl, go) = got(t)
        assert(gn === rs.length.toLong)
        assert(gg === gains)
        assert(gl === losses)
        assert(math.abs(go - rnd(gains.toDouble / losses * 1e6) / 1e6)
          <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_cronbach_alpha matches the cleared variance-ratio fold") {
    val k = dmean.size
    val byDay = dmean.toArray.flatMap { case (t, ds) =>
      ds.map { case (d0, y) => (d0, t, y) }
    }.groupBy(_._1).filter(_._2.length == k)
    val n = byDay.size.toLong
    var aNum = 0L
    for ((t, _) <- dmean) {
      val ys = byDay.values.map(_.find(_._2 == t).get._3).toArray
      aNum += n * ys.map(y => y * y).sum - ys.sum * ys.sum
    }
    val ts = byDay.values.map(_.map(_._3).sum).toArray
    val bNum = n * ts.map(t0 => t0 * t0).sum - ts.sum * ts.sum
    val exp = rnd(k * (1.0 - aNum.toDouble / bNum) / (k - 1.0) * 1e6) / 1e6
    val r = q("q_cronbach_alpha").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === k.toLong)
    assert(r(0).getLong(1) === n)
    assert(math.abs(r(0).getDouble(2) - exp) <= 1e-9)
  }

  test("q_mood_median matches the pooled-med2 2x2 fold") {
    val types = dmean.keys.toArray.sorted
    val got = q("q_mood_median").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    var checked = 0
    for (i <- types.indices; j <- i + 1 until types.length) {
      val t1 = types(i); val t2 = types(j)
      val pool = (dmean(t1).map(x => (x._2, t1, x._1))
        ++ dmean(t2).map(x => (x._2, t2, x._1))).sortBy(x => (x._1, x._2, x._3))
      val n = pool.length
      val p1 = (n + 1) / 2; val p2 = n / 2 + 1
      val med2 = pool(p1 - 1)._1 + pool(p2 - 1)._1
      val a = pool.count(x => x._2 == t1 && x._1 * 2 > med2).toLong
      val b = pool.count(x => x._2 == t1 && x._1 * 2 <= med2).toLong
      val c = pool.count(x => x._2 == t2 && x._1 * 2 > med2).toLong
      val dd = pool.count(x => x._2 == t2 && x._1 * 2 <= med2).toLong
      if (a + c > 0 && b + dd > 0) {
        val chi = n.toDouble * (a * dd - b * c) * (a * dd - b * c) /
          ((a + b) * (c + dd) * (a + c) * (b + dd))
        val (gn, gchi) = got((t1, t2))
        assert(gn === n.toLong)
        assert(math.abs(gchi - rnd(chi * 1e4) / 1e4) <= 1e-9)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_pettitt matches the doubled-rank U_t fold") {
    val got = q("q_pettitt").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.get(3).toString, r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val n = ds.length
      val ys = ds.map(_._2)
      // doubled tie-averaged rank of each y
      val tr2 = ys.map { y =>
        val below = ys.count(_ < y).toLong
        val ties = ys.count(_ == y).toLong
        (below + 1) * 2 + ties - 1
      }
      var s = 0L
      val us = (0 until n - 1).map { i => s += tr2(i); math.abs(s - (i + 1).toLong * (n + 1)) }
      val kStat = us.max
      val tStar = ds(us.indexOf(kStat))._1
      val p = 2.0 * math.exp(kStat.toDouble * kStat * -6.0 /
        (n.toLong * n * n + n.toLong * n))
      val (gn, gk, gt, gp) = got(t)
      assert(gn === n.toLong)
      assert(gk === kStat)
      assert(gt === tStar)
      assert(math.abs(gp - rnd(p * 1e6) / 1e6) <= 1e-9)
    }
  }
}
