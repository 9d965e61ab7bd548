package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-37 semantics (queries/StatsR9zj.scala): brute-force folds
  * over the collected sf0.001 click/view daily grid.
  */
class R9zjOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per-type day-sorted (day, milli-mean) grid. */
  private lazy val daily: Map[String, Array[(String, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (d, rows) => (d, rows.map(_._3).sum / rows.length) })
      }

  /** Day-joined (d, x=click, y=view) pairs. */
  private lazy val pr: Array[(String, Long, Long)] = {
    val vm = daily("view").toMap
    daily("click").flatMap { case (d, x) => vm.get(d).map(y => (d, x, y)) }
  }

  test("q_lin_ccc matches the cleared-ratio fold") {
    val n = pr.length.toLong
    val sx = pr.map(_._2).sum; val sy = pr.map(_._3).sum
    val sxy = pr.map(p => p._2 * p._3).sum
    val sxx = pr.map(p => p._2 * p._2).sum
    val syy = pr.map(p => p._3 * p._3).sum
    val den = (n * sxx - sx * sx) + (n * syy - sy * sy) +
      (sx - sy) * (sx - sy)
    val r = q("q_lin_ccc").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(2.0 * (n * sxy - sx * sy) / den, 6))
  }

  test("q_bland_altman matches the exact-outside fold") {
    val dd = pr.map(p => p._2 - p._3)
    val n = dd.length.toLong
    val s1 = dd.sum; val s2 = dd.map(x => x * x).sum
    val mean = s1.toDouble / n / 1000
    val sd = math.sqrt((n * s2 - s1 * s1).toDouble
      / (n.toDouble * (n - 1))) / 1000
    val nOut = dd.count(x =>
      625L * (n - 1) * (n * x - s1) * (n * x - s1)
        > 2401L * n * (n * s2 - s1 * s1)).toLong
    val r = q("q_bland_altman").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(mean, 6))
    assert(r.getDouble(2) == rnd(mean - 1.96 * sd, 6))
    assert(r.getDouble(3) == rnd(mean + 1.96 * sd, 6))
    assert(r.getLong(4) == nOut)
  }

  test("q_deming matches the closed-form fold") {
    val n = pr.length.toLong
    val sx = pr.map(_._2).sum; val sy = pr.map(_._3).sum
    val sxy = pr.map(p => p._2 * p._3).sum
    val sxx = pr.map(p => p._2 * p._2).sum
    val syy = pr.map(p => p._3 * p._3).sum
    val cxy = n * sxy - sx * sy
    val cxx = n * sxx - sx * sx
    val cyy = n * syy - sy * sy
    val slope = ((cyy - cxx).toDouble +
      math.sqrt(math.pow((cyy - cxx).toDouble, 2)
        + 4.0 * cxy * cxy)) / (2.0 * cxy)
    val r = q("q_deming").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(slope, 6))
    assert(r.getDouble(2) == rnd((sy - slope * sx) / n / 1000, 6))
  }

  test("q_win_ratio matches the pairwise fold") {
    val xs = daily("click").map(_._2); val ys = daily("view").map(_._2)
    val all = for (x <- xs; y <- ys) yield (x, y)
    val w = all.count(p => p._1 > p._2).toLong
    val l = all.count(p => p._1 < p._2).toLong
    val t = all.count(p => p._1 == p._2).toLong
    val r = q("q_win_ratio").collect()(0)
    assert(r.getLong(0) == all.length.toLong)
    assert(r.getLong(1) == w && r.getLong(2) == l && r.getLong(3) == t)
    assert(r.getDouble(4) == rnd(w.toDouble / l, 6))
    assert(r.getDouble(5) == rnd((2 * w + t).toDouble / (2 * all.length), 6))
  }

  test("q_copula_tail_dep matches the rank-flag fold") {
    val n = pr.length.toLong
    val k = n / 5
    val rxOf = pr.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case (p, i) => (p._1, (i + 1).toLong) }.toMap
    val ryOf = pr.sortBy(p => (p._3, p._1)).zipWithIndex
      .map { case (p, i) => (p._1, (i + 1).toLong) }.toMap
    val bothUp = pr.count(p =>
      ryOf(p._1) > n - k && rxOf(p._1) > n - k).toLong
    val bothLo = pr.count(p =>
      ryOf(p._1) <= k && rxOf(p._1) <= k).toLong
    val r = q("q_copula_tail_dep").collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == k)
    assert(r.getLong(2) == bothUp && r.getLong(3) == bothLo)
    assert(r.getDouble(4) == rnd(bothUp.toDouble / k, 6))
    assert(r.getDouble(5) == rnd(bothLo.toDouble / k, 6))
  }

  test("q_krippendorff matches the coincidence fold") {
    val med2 = daily.map { case (t, rows) =>
      val ys = rows.sortBy(r => (r._2, r._1)).map(_._2)
      val ng = ys.length
      (t, ys((ng + 1) / 2 - 1) + ys(ng / 2))
    }
    val codes = daily.toArray.flatMap { case (t, rows) =>
      rows.map { case (d, y) => (d, if (2 * y > med2(t)) 1L else 0L) }
    }
    val units = codes.groupBy(_._1).values
      .filter(_.length > 1)
      .map(g => (g.length.toLong, g.map(_._2).sum)).toArray
    val nn = units.map(_._1).sum
    val nn1 = units.map(_._2).sum
    val do12 = units.map { case (mu, n1) =>
      n1 * (mu - n1) * (12 / (mu - 1))
    }.sum
    val alpha = 1.0 - (nn - 1).toDouble * do12 /
      (12.0 * nn1 * (nn - nn1))
    val r = q("q_krippendorff").collect()(0)
    assert(r.getLong(0) == nn)
    assert(r.getDouble(1) == rnd(alpha, 6))
  }
}
