package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-24 key-level pins (queries/StatsR10w.scala): Chatterjee
  * ξ, Wasserstein-1, BWS, distance correlation — brute-force folds
  * over the sf0.001 daily grid.
  */
class R10wOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Daily milli means per type, keyed by day. */
  private lazy val dm: Map[String, Array[(String, Long)]] = {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    ev.groupBy(_._1).map { case (t, rows) =>
      t -> rows.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_._3).sum / g.length) }
    }
  }

  private lazy val types: Array[String] = dm.keys.toArray.sorted

  private def pairedSeries(t1: String, t2: String)
      : Array[(String, Long, Long)] = {
    val m2 = dm(t2).toMap
    dm(t1).flatMap { case (d, x) => m2.get(d).map(y => (d, x, y)) }
  }

  test("q_chatterjee_xi matches the ties-general fold") {
    val want = (for {
      t1 <- types; t2 <- types if t1 != t2
    } yield {
      val p = pairedSeries(t1, t2)
      val n = p.length
      val ys = p.map(_._3)
      val byX = p.sortBy(e => (e._2, e._1))
      val rs = byX.map(e => ys.count(_ <= e._3).toLong)
      val ls = byX.map(e => ys.count(_ >= e._3).toLong)
      val sd = (1 until n).map(i => math.abs(rs(i) - rs(i - 1))).sum
      val sl = ls.map(l => l * (n - l)).sum
      (t1, t2, n.toLong, rnd(1.0 - n.toDouble * sd / (2.0 * sl), 6))
    }).toSeq
    val got = q("q_chatterjee_xi").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("q_wasserstein matches the step-integral fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val xs = dm(types(i)).map(_._2); val ys = dm(types(j)).map(_._2)
      val n1 = xs.length.toLong; val n2 = ys.length.toLong
      val vals = (xs ++ ys).distinct.sorted
      var c1 = 0L; var c2 = 0L; var si = 0L
      vals.zipWithIndex.foreach { case (v, k) =>
        c1 += xs.count(_ == v); c2 += ys.count(_ == v)
        if (k < vals.length - 1)
          si += math.abs(c1 * n2 - c2 * n1) * (vals(k + 1) - v)
      }
      (types(i), types(j), n1, n2,
        rnd(si / (n1.toDouble * n2) / 1e3, 6))
    }).toSeq
    val got = q("q_wasserstein").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("q_bws_test matches the rank fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val t1 = types(i); val t2 = types(j)
      val xs = dm(t1).map(_._2); val ys = dm(t2).map(_._2)
      val pool = xs ++ ys
      def r2(v: Long): Long =
        2L * (pool.count(_ < v) + 1) + pool.count(_ == v) - 1
      def bStat(own: Array[Long], nn: Long, mm: Long): Double = {
        val sorted = own.map(r2).sorted
        sorted.zipWithIndex.map { case (rr, idx) =>
          val ii = idx + 1L
          val dev = rr / 2.0 - (mm + nn) / nn.toDouble * ii
          dev * dev / (ii / (nn + 1.0) * (1.0 - ii / (nn + 1.0))
            * (mm.toDouble * (mm + nn) / nn))
        }.sum / nn
      }
      val nx = xs.length.toLong; val ny = ys.length.toLong
      val bx = bStat(xs, nx, ny); val by = bStat(ys, ny, nx)
      (t1, t2, nx, ny, rnd(bx, 4), rnd(by, 4), rnd((bx + by) / 2, 4))
    }).toSeq
    val got = q("q_bws_test").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want)
  }

  test("q_distance_corr matches the double-centering fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val p = pairedSeries(types(i), types(j))
      val n = p.length
      val ax = Array.tabulate(n, n)((a, b) =>
        math.abs(p(a)._2 - p(b)._2))
      val ay = Array.tabulate(n, n)((a, b) =>
        math.abs(p(a)._3 - p(b)._3))
      val rx = ax.map(_.sum); val ry = ay.map(_.sum)
      val gx = rx.sum; val gy = ry.sum
      var scov = 0.0; var svx = 0.0; var svy = 0.0
      for (a <- 0 until n; b <- 0 until n) {
        val aa = ax(a)(b) - rx(a).toDouble / n - rx(b).toDouble / n +
          gx.toDouble / n / n
        val bb = ay(a)(b) - ry(a).toDouble / n - ry(b).toDouble / n +
          gy.toDouble / n / n
        scov += aa * bb; svx += aa * aa; svy += bb * bb
      }
      val dcov2 = scov / (n.toDouble * n)
      val dvarx = svx / (n.toDouble * n)
      val dvary = svy / (n.toDouble * n)
      (types(i), types(j), n.toLong,
        rnd(math.sqrt(math.max(dcov2, 0.0))
          / math.sqrt(math.sqrt(dvarx * dvary)), 6))
    }).toSeq
    val got = q("q_distance_corr").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }
}
