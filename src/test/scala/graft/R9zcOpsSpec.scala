package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-29 semantics (queries/StatsR9zc.scala): brute-force folds
  * over the collected sf0.001 events.
  */
class R9zcOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (event_type, iso-day, floor(value·1e3)) per event. */
  private lazy val ev: Array[(String, String, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))

  /** Per type: day-sorted milli-mean series. */
  private lazy val series: Map[String, Array[Long]] =
    ev.groupBy(_._1).map { case (t, g) =>
      (t, g.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (_, rows) => rows.map(_._3).sum / rows.length })
    }

  private case class M(n: Long, sx: Long, sy: Long, sxy: Long,
      sxx: Long, syy: Long) {
    def cxy: Long = n * sxy - sx * sy
    def cxx: Long = n * sxx - sx * sx
    def cyy: Long = n * syy - sy * sy
    def ssr: Double = (cyy.toDouble - cxy.toDouble * cxy / cxx) / n
  }

  private def mom(pts: Array[(Long, Long)]): M =
    M(pts.length, pts.map(_._1).sum, pts.map(_._2).sum,
      pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum,
      pts.map(p => p._2 * p._2).sum)

  private def idx(ys: Array[Long]): Array[(Long, Long)] =
    ys.zipWithIndex.map { case (y, i) => ((i + 1).toLong, y) }

  test("q_breusch_pagan matches the snapped residual fold") {
    val want = series.toArray.sortBy(_._1).flatMap { case (t, ys) =>
      val pts = idx(ys); val m = mom(pts)
      if (m.cxx <= 0) None else {
        val b = m.cxy.toDouble / m.cxx
        val a = (m.sy - b * m.sx) / m.n
        val g = pts.map { case (i, y) => (i, rndL((y - a - b * i) * (y - a - b * i))) }
        val n = g.length.toLong
        val sx = g.map(_._1).sum; val sg = g.map(_._2).sum
        val sxg = g.map(p => p._1 * p._2).sum
        val sxx = g.map(p => p._1 * p._1).sum
        val sgg = g.map(p => BigInt(p._2) * p._2).sum
        val cxg = n * sxg - sx * sg
        val cxx = n * sxx - sx * sx
        val cgg = BigInt(n) * sgg - BigInt(sg) * sg
        if (cxx <= 0 || cgg <= 0) None
        else Some((t, n,
          rnd(n * cxg.toDouble * cxg / (cxx.toDouble * cgg.toDouble), 6)))
      }
    }
    val got = q("q_breusch_pagan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_chow_test matches the split-SSR fold") {
    val want = series.toArray.sortBy(_._1).flatMap { case (t, ys) =>
      val pts = idx(ys)
      val p = mom(pts)
      val h1 = mom(pts.filter(_._1 <= 15))
      val h2 = mom(pts.filter(_._1 > 15))
      if (p.cxx <= 0 || h1.cxx <= 0 || h2.cxx <= 0
        || h1.n <= 2 || h2.n <= 2) None
      else {
        val (sp, s1, s2) = (p.ssr, h1.ssr, h2.ssr)
        if (s1 + s2 <= 0) None
        else Some((t, p.n,
          rnd(((sp - s1 - s2) / 2) / ((s1 + s2) / (p.n - 4)), 6)))
      }
    }
    val got = q("q_chow_test").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_goldfeld_quandt matches the outer-thirds fold") {
    val want = series.toArray.sortBy(_._1).flatMap { case (t, ys) =>
      val pts = idx(ys)
      val nt = pts.length.toLong; val m = nt / 3
      val e1 = mom(pts.filter(_._1 <= m))
      val e2 = mom(pts.filter(_._1 > nt - m))
      if (e1.cxx <= 0 || e2.cxx <= 0 || e1.n <= 2) None
      else {
        val (s1, s2) = (e1.ssr, e2.ssr)
        if (s1 <= 0) None
        else Some((t, e1.n, rnd((s2 / (e2.n - 2)) / (s1 / (e1.n - 2)), 6)))
      }
    }
    val got = q("q_goldfeld_quandt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_kpss_lite matches the cleared partial-sum fold") {
    val want = series.toArray.sortBy(_._1).flatMap { case (t, ys) =>
      val n = ys.length.toLong; val sy = ys.sum
      val z = ys.map(y => n * y - sy)
      val st = z.scanLeft(0L)(_ + _).drop(1)
      val ss2 = st.map(s => BigInt(s) * s).sum
      val sz2 = z.map(v => BigInt(v) * v).sum
      if (sz2 <= 0) None
      else Some((t, n, rnd(ss2.toDouble / (n * sz2.toDouble), 6)))
    }
    val got = q("q_kpss_lite").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_iv_wald matches the weekend-instrument fold") {
    val byDay = ev.groupBy(_._2).toArray.map { case (d, g) =>
      val y = g.filter(_._1 == "purchase").map(_._3).sum
      val c = g.count(_._1 == "click").toLong
      val dow = LocalDate.parse(d).getDayOfWeek
      (dow == DayOfWeek.SATURDAY || dow == DayOfWeek.SUNDAY, y, c)
    }
    val we = byDay.filter(_._1); val wd = byDay.filter(!_._1)
    val (n1, n0) = (we.length.toLong, wd.length.toLong)
    val fs = we.map(_._3).sum.toDouble / n1 - wd.map(_._3).sum.toDouble / n0
    val beta = ((we.map(_._2).sum.toDouble / n1
      - wd.map(_._2).sum.toDouble / n0) / 1000.0) / fs
    val r = q("q_iv_wald").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n0)
    assert(r.getDouble(2) == rnd(fs, 6))
    assert(r.getDouble(3) == rnd(beta, 6))
  }

  test("q_rdd_estimate matches the local-linear fold") {
    val byDay = ev.groupBy(_._2).toArray.sortBy(_._1)
      .map { case (_, g) => g.map(_._3).sum / g.length }
    val pts = byDay.zipWithIndex
      .map { case (y, i) => (2L * (i + 1) - 31, y) }
      .filter(p => math.abs(p._1) >= 1 && math.abs(p._1) <= 13)
    def a0(side: Array[(Long, Long)]): (Long, Double) = {
      val n = side.length.toLong
      val su = side.map(_._1).sum; val sy = side.map(_._2).sum
      val suy = side.map(p => p._1 * p._2).sum
      val suu = side.map(p => p._1 * p._1).sum
      (n, (sy.toDouble * suu - su.toDouble * suy) / (n * suu - su * su))
    }
    val (nl, al) = a0(pts.filter(_._1 < 0))
    val (nr, ar) = a0(pts.filter(_._1 > 0))
    val r = q("q_rdd_estimate").collect()(0)
    assert(r.getLong(0) == nl && r.getLong(1) == nr)
    assert(r.getDouble(2) == rnd(al / 1000.0, 6))
    assert(r.getDouble(3) == rnd(ar / 1000.0, 6))
    assert(r.getDouble(4) == rnd((ar - al) / 1000.0, 6))
  }
}
