package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-2 semantics (queries/StatsR9b.scala): each diagnostic
  * re-derived by a brute-force fold over the collected sf0.001 events.
  */
class R9bOpsSpec extends AnyFunSuite with SparkFixture {

  private case class Ev(typ: String, day: String, vM: Long, vC: Long,
    user: Long, k: Long)

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      floor(col("value") * 1e3).cast("long").as("v_m"),
      round(col("value") * 100).cast("long").as("v_c"),
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))

  /** Day-sorted (day, y) milli means per type. */
  private lazy val daily: Map[String, Array[(String, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_.vM).sum / g.length) }
    }

  /** Exact OLS trend (slope, icept, n, st, stt) per type. */
  private def fit(ys: Array[Long]): (Double, Double, Long, Long, Long) = {
    val n = ys.length.toLong
    val ts = (1L to n).toArray
    val st = ts.sum; val sy = ys.sum
    val sty = ts.zip(ys).map { case (a, b) => a * b }.sum
    val stt = ts.map(a => a * a).sum
    val slope = (n.toDouble * sty - st.toDouble * sy) /
      (n.toDouble * stt - st.toDouble * st)
    (slope, (sy - slope * st) / n, n, st, stt)
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_cooks_distance matches the closed-form leverage fold") {
    val got = q("q_cooks_distance").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val (slope, icept, n, st, stt) = fit(ys)
      val e = ys.indices.map(i => rnd(ys(i) - slope * (i + 1) - icept))
      val see = e.map(x => x * x).sum
      val s2 = see.toDouble / (n - 2)
      val sxx = stt.toDouble - st.toDouble * st / n
      for (i <- ys.indices) {
        val h = 1.0 / n + ((i + 1) - st.toDouble / n) *
          ((i + 1) - st.toDouble / n) / sxx
        val cd = e(i).toDouble * e(i) * h / (2.0 * s2 * (1 - h) * (1 - h))
        val (gh, gcd, gf) = got((t, ds(i)._1))
        assert(math.abs(gh - h) <= 1e-6)
        assert(math.abs(gcd - cd) <= 1e-6)
        assert(gf === (if (cd * n > 4.0) 1L else 0L))
      }
    }
  }

  /** Shared click/view day grid: (y_view, x_click) on common days. */
  private lazy val cv: Array[(Long, Long)] = {
    val c = daily("click").toMap; val v = daily("view").toMap
    (c.keySet intersect v.keySet).toArray.sorted
      .map(d => (v(d), c(d)))
  }

  test("q_granger_lite matches the two-model closed-form fold") {
    val tri = (1 until cv.length).map(i =>
      (cv(i)._1, cv(i - 1)._1, cv(i - 1)._2))
    val n = tri.length.toDouble
    def c(f: ((Long, Long, Long)) => Long, g: ((Long, Long, Long)) => Long) =
      tri.map(r => f(r) * g(r)).sum -
        tri.map(f).sum.toDouble * tri.map(g).sum / n
    val cyy = c(_._1, _._1); val cy1 = c(_._1, _._2); val cy2 = c(_._1, _._3)
    val c11 = c(_._2, _._2); val c12 = c(_._2, _._3); val c22 = c(_._3, _._3)
    val rssR = cyy - cy1 * cy1 / c11
    val det = c11 * c22 - c12 * c12
    val b1 = (cy1 * c22 - cy2 * c12) / det
    val b2 = (cy2 * c11 - cy1 * c12) / det
    val rssU = cyy - b1 * cy1 - b2 * cy2
    val r = q("q_granger_lite").collect()(0)
    assert(r.getLong(0) === tri.length.toLong)
    assert(math.abs(r.getDouble(1) - b2) <= 1e-6)
    assert(math.abs(r.getDouble(2)
      - (rssR - rssU) / (rssU / (n - 3))) <= 1e-4)
  }

  test("q_ccf matches the direct cross-correlation fold") {
    val n = cv.length.toLong
    val sx = cv.map(_._2).sum; val sy = cv.map(_._1).sum
    val ux = cv.map(_._2 * n - sx); val uy = cv.map(_._1 * n - sy)
    val dxx = ux.map(v => v * v).sum; val dyy = uy.map(v => v * v).sum
    val got = q("q_ccf").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    for (k <- -7 to 7) {
      val pairs = cv.indices.filter(i =>
        i + k >= 0 && i + k < cv.length)
      val num = pairs.map(i => ux(i) * uy(i + k)).sum
      val r = rnd(num.toDouble * 1e9 / math.sqrt(dxx.toDouble * dyy)) / 1e9
      val (gn, gc) = got(k.toLong)
      assert(gn === pairs.length.toLong)
      assert(math.abs(gc - r) <= 1e-6, s"lag $k")
    }
  }

  test("q_turning_points matches the strict-extrema count") {
    val got = q("q_turning_points").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val tp = (1 until ys.length - 1).count(i =>
        (ys(i) > ys(i - 1) && ys(i) > ys(i + 1)) ||
          (ys(i) < ys(i - 1) && ys(i) < ys(i + 1))).toLong
      val n = ys.length.toLong
      val (gn, gt, gz) = got(t)
      assert(gn === n && gt === tp)
      assert(math.abs(gz - (tp - 2.0 * (n - 2) / 3.0)
        / math.sqrt((16.0 * n - 29.0) / 90.0)) <= 1e-4)
    }
  }

  test("q_bartels_rank matches the doubled-mid-rank RVN fold") {
    val got = q("q_bartels_rank").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val r2 = ys.map { y =>
        val below = ys.count(_ < y).toLong; val tc = ys.count(_ == y).toLong
        2 * (below + 1) + tc - 1
      }
      val n = ys.length.toLong
      val num2 = (1 until r2.length)
        .map(i => (r2(i) - r2(i - 1)) * (r2(i) - r2(i - 1))).sum
      val den2 = r2.map(v => (v - n - 1) * (v - n - 1)).sum
      val rvn = num2.toDouble / den2
      val z = (rvn - 2.0) / math.sqrt(
        4.0 * (n - 2) * (5.0 * n * n - 2.0 * n - 9.0) /
          (5.0 * n * (n + 1) * (n - 1) * (n - 1)))
      val (gn, gr, gz) = got(t)
      assert(gn === n)
      assert(math.abs(gr - rvn) <= 1e-6)
      assert(math.abs(gz - z) <= 1e-4)
    }
  }

  test("q_cochrans_q matches the exact-total fold") {
    // value > 150 must compare the RAW double (v_c > 15000 differs at
    // the rounding boundary), so collect the raw projection here
    val u = {
      val raw = graft.tables.Tables.events(spark, sf)
        .select(col("user_id"), col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      raw.groupBy(_._1).map { case (_, g) =>
        (if (g.exists(_._2 == "purchase")) 1L else 0L,
          if (g.exists(_._3 > 150.0)) 1L else 0L,
          if (g.exists(_._4 > 90)) 1L else 0L)
      }.toArray
    }
    val g1 = u.map(_._1).sum; val g2 = u.map(_._2).sum; val g3 = u.map(_._3).sum
    val l = u.map(x => x._1 + x._2 + x._3)
    val sl = l.sum; val sll = l.map(v => v * v).sum
    val gb = sl.toDouble / 3.0
    val qStat = 6.0 * ((g1 - gb) * (g1 - gb) + (g2 - gb) * (g2 - gb)
      + (g3 - gb) * (g3 - gb)) / (3.0 * sl - sll)
    val r = q("q_cochrans_q").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((u.length.toLong, g1, g2, g3)))
    assert(math.abs(r.getDouble(4) - qStat) <= 1e-4)
  }

  test("q_fleiss_kappa matches the agreement fold") {
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getString(2)))
    val cats = raw.map { case (v, k, t) =>
      val ra = if (v < 50) 0 else if (v < 150) 1 else 2
      val rb = if (k < 33) 0 else if (k < 66) 1 else 2
      val rc = if (t == "click" || t == "view") 0
        else if (t == "purchase") 1 else 2
      Seq(ra, rb, rc)
    }
    val n = cats.length.toLong
    val ssq = cats.map(cs =>
      cs.groupBy(identity).values.map(g => g.size.toLong * g.size).sum).sum
    val colTot = cats.flatten.groupBy(identity).values
      .map(g => g.size.toLong)
    val scc = colTot.map(c => c * c).sum
    val pBar = (ssq - 3.0 * n) / (6.0 * n)
    val pE = scc.toDouble / (9.0 * n * n)
    val r = q("q_fleiss_kappa").collect()(0)
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(1) - pBar) <= 1e-6)
    assert(math.abs(r.getDouble(2) - pE) <= 1e-6)
    assert(math.abs(r.getDouble(3) - (pBar - pE) / (1.0 - pE)) <= 1e-6)
  }

  test("q_white_test matches the auxiliary-regression fold") {
    val got = q("q_white_test").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- daily) {
      val ys = ds.map(_._2)
      val (slope, icept, _, _, _) = fit(ys)
      val tri = ys.indices.map { i =>
        val e = rnd((ys(i) - slope * (i + 1) - icept) / 100)
        (e * e, (i + 1).toLong, ((i + 1).toLong * (i + 1)))
      }
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
      val r2 = (b1 * cy1 + b2 * cy2) / cyy
      val (gn, gr2, glm) = got(t)
      assert(gn === tri.length.toLong)
      assert(math.abs(gr2 - r2) <= 1e-6)
      assert(math.abs(glm - tri.length * r2) <= 1e-4)
    }
  }

  test("q_l_moments matches the order-statistic B-weight fold") {
    val got = q("q_l_moments").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    for ((t, ds) <- daily) {
      val sorted = ds.sortBy(p => (p._2, p._1)).map(_._2)
      val n = sorted.length.toLong
      val b0n = sorted.sum
      val b1n = sorted.zipWithIndex.map { case (y, i) => i.toLong * y }.sum
      val b2n = sorted.zipWithIndex
        .map { case (y, i) => i.toLong * (i - 1) * y }.sum
      val b3n = sorted.zipWithIndex
        .map { case (y, i) => i.toLong * (i - 1) * (i - 2) * y }.sum
      val b0 = b0n.toDouble / n
      val b1 = b1n.toDouble / (n - 1) / n
      val b2 = b2n.toDouble / (n - 1) / (n - 2) / n
      val b3 = b3n.toDouble / (n - 1) / (n - 2) / (n - 3) / n
      val l2 = 2 * b1 - b0
      val l3 = 6 * b2 - 6 * b1 + b0
      val l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
      val (gn, gl1, gl2, gt3, gt4) = got(t)
      assert(gn === n)
      assert(math.abs(gl1 - b0 / 1e3) <= 1e-4)
      assert(math.abs(gl2 - l2 / 1e3) <= 1e-4)
      assert(math.abs(gt3 - l3 / l2) <= 1e-6)
      assert(math.abs(gt4 - l4 / l2) <= 1e-6)
    }
  }

  test("q_gumbel_fit matches the method-of-moments fold") {
    val got = q("q_gumbel_fit").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, rows) <- evs.groupBy(_.typ)) {
      val mx = rows.groupBy(_.day).toArray.sortBy(_._1)
        .map(_._2.map(_.vC).max)
      val n = mx.length.toLong
      val sm = mx.sum; val sq = mx.map(x => x * x).sum
      val mean = sm.toDouble / n
      val sd = math.sqrt((sq - sm.toDouble * sm / n) / (n - 1))
      val beta = sd * math.sqrt(6.0) / 3.141592653589793
      val mu = mean - 0.5772156649015329 * beta
      val (gn, gmu, gbeta, grl) = got(t)
      assert(gn === n)
      assert(math.abs(gmu - mu / 100.0) <= 1e-4)
      assert(math.abs(gbeta - beta / 100.0) <= 1e-4)
      assert(math.abs(grl
        - (mu - beta * math.log(-math.log(0.9))) / 100.0) <= 1e-4)
    }
  }
}
