package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-3 semantics (queries/StatsR9c.scala): each shape statistic
  * re-derived by a brute-force fold over the collected sf0.001 events.
  */
class R9cOpsSpec extends AnyFunSuite with SparkFixture {

  private case class Ev(typ: String, day: String, vM: Long, user: Long)

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      floor(col("value") * 1e3).cast("long").as("v_m"), col("user_id"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

  private lazy val daily: Map[String, Array[(String, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_.vM).sum / g.length) }
    }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_sax_symbols matches the z-breakpoint fold") {
    val got = q("q_sax_symbols").collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val n = ys.length
      val sy = ys.sum; val sq = ys.map(y => y * y).sum
      val mean = sy.toDouble / n
      val sd = math.sqrt((sq - sy.toDouble * sy / n) / (n - 1))
      val syms = ys.map { y =>
        val z = (y - mean) / sd
        if (z < -0.6745) 'a' else if (z < 0.0) 'b'
        else if (z < 0.6745) 'c' else 'd'
      }
      val (gs, ga, gb, gc, gd) = got(t)
      assert(gs === syms.mkString)
      assert((ga, gb, gc, gd) === ((syms.count(_ == 'a').toLong,
        syms.count(_ == 'b').toLong, syms.count(_ == 'c').toLong,
        syms.count(_ == 'd').toLong)))
    }
  }

  test("q_matrix_profile matches the brute-force NN distance profile") {
    val m = 7
    val got = q("q_matrix_profile").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getLong(3)))).toMap
    var checked = 0
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val nw = ys.length - m + 1
      def win(i: Int) = ys.slice(i - 1, i - 1 + m) // 1-based window idx
      def dU(i: Int, j: Int): Long = {
        val a = win(i); val b = win(j)
        val sa = a.sum; val sb = b.sum
        val qa = a.map(x => x * x).sum; val qb = b.map(x => x * x).sum
        val p = a.zip(b).map { case (x, y) => x * y }.sum
        val rho = (m.toDouble * p - sa.toDouble * sb) /
          math.sqrt((m.toDouble * qa - sa.toDouble * sa)
            * (m.toDouble * qb - sb.toDouble * sb))
        rnd(math.sqrt(math.max(0.0, 2.0 * m * (1.0 - rho))) * 1e6)
      }
      for (i <- 1 to nw) {
        val cands = (1 to nw).filter(j => math.abs(i - j) > 3)
        if (cands.nonEmpty) {
          val best = cands.map(j => (dU(i, j), j.toLong)).min
          val (gd, gj) = got((t, i.toLong))
          assert(gj === best._2, s"type $t win $i")
          assert(math.abs(gd - best._1 / 1e6) <= 1e-4)
          checked += 1
        }
      }
    }
    assert(checked === got.size)
  }

  test("q_qq_deciles matches the ceil-rank order statistics") {
    val got = q("q_qq_deciles").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    def qs(t: String): Map[Long, Double] = {
      val sorted = daily(t).sortBy(p => (p._2, p._1)).map(_._2)
      val n = sorted.length
      (1L to 9L).map(p =>
        p -> sorted(math.ceil(p * n / 10.0).toInt - 1) / 1e3).toMap
    }
    val qc = qs("click"); val qv = qs("view")
    for (p <- 1L to 9L) {
      val (gc, gv) = got(p)
      assert(math.abs(gc - qc(p)) <= 1e-4)
      assert(math.abs(gv - qv(p)) <= 1e-4)
    }
  }

  test("q_rolling_skew matches the raw-sum central-moment fold") {
    val got = q("q_rolling_skew").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2)))
      .toMap
    var checked = 0
    for ((t, ds) <- daily; i <- 13 until ds.length) {
      val w = ds.slice(i - 13, i + 1).map(_._2)
      val s1 = w.sum; val s2 = w.map(y => y * y).sum
      val s3 = w.map(y => y * y * y).sum
      val m1 = s1.toDouble / 14.0
      val m2 = s2.toDouble / 14.0 - m1 * m1
      val m3 = (s3.toDouble / 14.0 - 3.0 * m1 * (s2.toDouble / 14.0)
        + 2.0 * m1 * m1 * m1)
      assert(math.abs(got((t, ds(i)._1)) - m3 / math.pow(m2, 1.5)) <= 1e-5)
      checked += 1
    }
    assert(checked === got.size)
  }

  test("q_cindex_lifetime matches the grouped-grid pair fold") {
    val users = evs.groupBy(_.user).map { case (u, g) =>
      val days = g.map(_.day)
      (u, g.length.toLong,
        (java.sql.Date.valueOf(days.max).toLocalDate.toEpochDay
          - java.sql.Date.valueOf(days.min).toLocalDate.toEpochDay))
    }.toArray.sortBy(x => (x._2, x._1))
    val n = users.length
    val cells = users.zipWithIndex
      .map { case ((_, _, lt), i) =>
        (math.ceil((i + 1) * 10.0 / n).toLong, lt)
      }
      .groupBy(identity).map { case (k, g) => (k._1, k._2, g.length.toLong) }
      .toArray
    var np = 0L; var conc = 0L; var tied = 0L
    for ((s1, l1, m1) <- cells; (s2, l2, m2) <- cells if s1 < s2) {
      np += m1 * m2
      if (l1 < l2) conc += m1 * m2
      else if (l1 == l2) tied += m1 * m2
    }
    val r = q("q_cindex_lifetime").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((np, conc, tied)))
    assert(math.abs(r.getDouble(3) - (conc + tied / 2.0) / np) <= 1e-6)
  }

  test("q_breusch_godfrey matches the aux-regression fold") {
    val got = q("q_breusch_godfrey").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val n0 = ys.length.toLong
      val ts = (1L to n0).toArray
      val st = ts.sum; val sy = ys.sum
      val sty = ts.zip(ys).map { case (a, b) => a * b }.sum
      val stt = ts.map(a => a * a).sum
      val slope = (n0.toDouble * sty - st.toDouble * sy) /
        (n0.toDouble * stt - st.toDouble * st)
      val icept = (sy - slope * st) / n0
      val e = ys.indices.map(i => rnd((ys(i) - slope * (i + 1) - icept) / 100))
      val tri = (1 until e.length).map(i =>
        (e(i), (i + 1).toLong, e(i - 1)))
      val n = tri.length.toDouble
      def c(f: ((Long, Long, Long)) => Long,
            g: ((Long, Long, Long)) => Long) =
        tri.map(r => f(r) * g(r)).sum -
          tri.map(f).sum.toDouble * tri.map(g).sum / n
      val cyy = c(_._1, _._1); val cy1 = c(_._1, _._2); val cy2 = c(_._1, _._3)
      val c11 = c(_._2, _._2); val c12 = c(_._2, _._3); val c22 = c(_._3, _._3)
      val det = c11 * c22 - c12 * c12
      val b1 = (cy1 * c22 - cy2 * c12) / det
      val b2 = (cy2 * c11 - cy1 * c12) / det
      val (gn, gb2, glm) = got(t)
      assert(gn === tri.length.toLong)
      assert(math.abs(gb2 - b2) <= 1e-6)
      assert(math.abs(glm - tri.length * (b1 * cy1 + b2 * cy2) / cyy)
        <= 1e-4)
    }
  }
}
