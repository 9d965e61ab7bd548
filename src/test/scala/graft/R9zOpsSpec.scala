package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-26 semantics (queries/StatsR9z.scala): brute-force folds
  * over the collected sf0.001 events grid.
  */
class R9zOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (day → y) daily milli-mean series per type, day-sorted. */
  private lazy val daily: Map[String, Array[(String, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).map { case (t, g) =>
        t -> g.groupBy(_._1).map { case (d0, gg) =>
          (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
        }.toArray.sortBy(_._1)
      }

  /** Paired (x, y) day grid for two types (both present). */
  private def wide(tx: String, ty: String): Array[(Long, Long)] = {
    val mx = daily(tx).toMap; val my = daily(ty).toMap
    mx.keySet.intersect(my.keySet).toArray.sorted
      .map(d => (mx(d), my(d)))
  }

  test("q_somers_d matches the pair fold") {
    val w = wide("click", "purchase")
    var c = 0L; var disc = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- w.indices; j <- (i + 1) until w.length) {
      val sx = java.lang.Long.signum(w(j)._1 - w(i)._1)
      val sy = java.lang.Long.signum(w(j)._2 - w(i)._2)
      n0 += 1
      if (sx * sy > 0) c += 1
      if (sx * sy < 0) disc += 1
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    val r = q("q_somers_d").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n0)
    assert(r(0).getLong(1) === c)
    assert(r(0).getLong(2) === disc)
    assert(math.abs(r(0).getDouble(3)
      - rnd((c - disc).toDouble / (n0 - tx), 6)) <= 1e-9)
    assert(math.abs(r(0).getDouble(4)
      - rnd((c - disc).toDouble / (n0 - ty), 6)) <= 1e-9)
  }

  test("q_gk_gamma matches the pair fold") {
    val w = wide("view", "signup")
    var c = 0L; var disc = 0L
    for (i <- w.indices; j <- (i + 1) until w.length) {
      val sx = java.lang.Long.signum(w(j)._1 - w(i)._1)
      val sy = java.lang.Long.signum(w(j)._2 - w(i)._2)
      if (sx * sy > 0) c += 1
      if (sx * sy < 0) disc += 1
    }
    val r = q("q_gk_gamma").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === c)
    assert(r(0).getLong(1) === disc)
    assert(math.abs(r(0).getDouble(2)
      - rnd((c - disc).toDouble / (c + disc), 6)) <= 1e-9)
  }

  test("q_hoeffding_d matches the cleared dominance fold") {
    val w = wide("click", "view")
    val n = w.length
    assert(n >= 5)
    var d1 = 0L; var d2 = 0L; var d3 = 0L
    for (i <- 0 until n) {
      var xl = 0L; var xe = 0L; var yl = 0L; var ye = 0L
      var ql = 0L; var qle = 0L; var qel = 0L; var qee = 0L
      for (j <- 0 until n if j != i) {
        val bx = w(j)._1 < w(i)._1; val ex = w(j)._1 == w(i)._1
        val by = w(j)._2 < w(i)._2; val ey = w(j)._2 == w(i)._2
        if (bx) xl += 1; if (ex) xe += 1
        if (by) yl += 1; if (ey) ye += 1
        if (bx && by) ql += 1
        if (ex && by) qle += 1
        if (bx && ey) qel += 1
        if (ex && ey) qee += 1
      }
      val u = 2 + 2 * xl + xe
      val v = 2 + 2 * yl + ye
      val w4 = 4 + 4 * ql + 2 * qle + 2 * qel + qee
      d1 += (w4 - 4) * (w4 - 8)
      d2 += (u - 2) * (u - 4) * (v - 2) * (v - 4)
      d3 += (u - 4) * (v - 4) * (w4 - 4)
    }
    val nn = n.toLong
    val num = (nn - 2) * (nn - 3) * d1 + d2 - 2 * (nn - 2) * d3
    val den = 16L * nn * (nn - 1) * (nn - 2) * (nn - 3) * (nn - 4)
    val r = q("q_hoeffding_d").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === nn)
    assert(math.abs(r(0).getDouble(1)
      - rnd(num.toDouble * 30 / den.toDouble, 8)) <= 1e-9)
  }

  test("q_brunner_munzel matches the doubled-midrank fold") {
    val xs = daily("click").map(_._2)
    val ys = daily("view").map(_._2)
    val comb = xs ++ ys
    def u2(v: Long, pool: Array[Long]): Long =
      2L * pool.count(_ < v) + pool.count(_ == v) + 1
    val n1 = xs.length.toLong; val n2 = ys.length.toLong
    val ux = xs.map(u2(_, comb)); val uy = ys.map(u2(_, comb))
    val vx = xs.map(u2(_, xs)); val vy = ys.map(u2(_, ys))
    val su1 = ux.sum; val su2 = uy.sum
    val t1 = ux.zip(vx).map { case (a, b) => a - b }
    val t2 = uy.zip(vy).map { case (a, b) => a - b }
    val a1 = n1 * t1.map(t => t * t).sum - t1.sum * t1.sum
    val a2 = n2 * t2.map(t => t * t).sum - t2.sum * t2.sum
    val pHat = (su2 - n2 * (n2 + 1)).toDouble / (2 * n1 * n2)
    val wBm = (n1 * su2 - n2 * su1).toDouble / 2 /
      ((n1 + n2) * math.sqrt(a1.toDouble / (4 * (n1 - 1))
        + a2.toDouble / (4 * (n2 - 1))))
    val r = q("q_brunner_munzel").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n1)
    assert(r(0).getLong(1) === n2)
    assert(math.abs(r(0).getDouble(2) - rnd(pHat, 6)) <= 1e-9)
    assert(math.abs(r(0).getDouble(3) - rnd(wBm, 6)) <= 1e-9)
  }

  test("q_moran_i and q_geary_c match the cleared series folds") {
    val gotI = q("q_moran_i").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val gotC = q("q_geary_c").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((t, ser) <- daily) {
      val ys = ser.map(_._2)
      val n = ys.length.toLong
      val s = ys.sum
      val z = ys.map(y => n * y - s)
      val sz2 = z.map(v => BigInt(v) * BigInt(v)).sum
      if (n >= 3 && sz2 > 0) {
        val sadj = z.sliding(2).map(p => BigInt(p(0)) * BigInt(p(1))).sum
        val sd2 = ys.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0)))
          .sum
        val refI = n * sadj.toDouble / (n - 1) / sz2.toDouble
        val refC = n * n * sd2.toDouble / 2 / sz2.toDouble
        assert(math.abs(gotI(t)._1 - rnd(refI, 6)) <= 1e-9, t)
        assert(math.abs(gotI(t)._2 - rnd(-1.0 / (n - 1), 6)) <= 1e-9, t)
        assert(math.abs(gotC(t) - rnd(refC, 6)) <= 1e-9, t)
      }
    }
  }
}
