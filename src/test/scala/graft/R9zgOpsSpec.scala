package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-33 semantics (queries/StatsR9zg.scala): brute-force folds
  * over the collected sf0.001 click/view daily grid.
  */
class R9zgOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (g, d, y) rows: g=1 click, g=2 view, y daily milli-mean. */
  private lazy val ser: Array[(Long, String, Long)] =
    graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(e => (e._1, e._2)).toArray
      .map { case ((t, d), g) =>
        (if (t == "click") 1L else 2L, d, g.map(_._3).sum / g.length)
      }

  /** total order (y, g, d) positions, 1-based. */
  private lazy val ordered: Array[(Long, String, Long)] =
    ser.sortBy(e => (e._3, e._1, e._2))

  test("q_siegel_tukey matches the alternating-rank fold") {
    val nn = ordered.length
    val kept = if (nn % 2 == 0) ordered
      else ordered.zipWithIndex.filter(_._2 + 1 != (nn + 1) / 2).map(_._1)
    val np = kept.length
    val st = kept.zipWithIndex.map { case (e, i0) =>
      val pp = i0 + 1L
      val k = math.min(pp, np + 1 - pp)
      val bottom = pp <= np / 2
      val r = if (bottom) { if (k % 2 == 1) 2 * k - 1 else 2 * k }
        else { if (k % 2 == 1) 2 * k else 2 * k - 1 }
      (e._1, r)
    }
    val n1 = st.count(_._1 == 1L).toLong
    val n2 = st.count(_._1 == 2L).toLong
    val w1 = st.filter(_._1 == 1L).map(_._2).sum
    val z = (w1 - n1 * (np + 1) / 2.0) /
      math.sqrt(n1.toDouble * n2 * (np + 1) / 12.0)
    val r = q("q_siegel_tukey").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == w1)
    assert(r.getDouble(3) == rnd(z, 6))
  }

  test("q_conover_sqranks matches the squared-midrank fold") {
    val med2 = ser.groupBy(_._1).map { case (g, rows) =>
      val ys = rows.sortBy(e => (e._3, e._2)).map(_._3)
      val ng = ys.length
      (g, ys((ng + 1) / 2 - 1) + ys(ng / 2))
    }
    val dev = ser.map(e => (e._1, math.abs(2 * e._3 - med2(e._1))))
    val r2 = dev.map { case (g, v) =>
      (g, 2L * dev.count(_._2 < v) + dev.count(_._2 == v) + 1L)
    }
    val n1 = r2.count(_._1 == 1L).toLong
    val n2 = r2.count(_._1 == 2L).toLong
    val n = n1 + n2
    val t1 = r2.filter(_._1 == 1L).map(x => x._2 * x._2).sum
    val sq = r2.map(x => x._2 * x._2).sum
    val q4 = r2.map(x => x._2 * x._2 * x._2 * x._2).sum
    val z = (t1 - n1.toDouble * sq / n) /
      math.sqrt(n1.toDouble * n2 / (n.toDouble * (n - 1))
        * (q4 - sq.toDouble * sq / n))
    val r = q("q_conover_sqranks").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == rnd(z, 6))
  }

  test("q_cucconi matches the U/V fold") {
    val ys = ser.map(_._3)
    val r2g2 = ser.filter(_._1 == 2L).map { e =>
      2L * ys.count(_ < e._3) + ys.count(_ == e._3) + 1L
    }
    val n1 = ser.count(_._1 == 1L).toLong
    val n2 = ser.count(_._1 == 2L).toLong
    val n = n1 + n2
    val sr = r2g2.sum; val srr = r2g2.map(x => x * x).sum
    val den = math.sqrt(n1.toDouble * n2 * (n + 1) * (2 * n + 1)
      * (8 * n + 11) / 5)
    val u = (6.0 * srr / 4 - n2.toDouble * (n + 1) * (2 * n + 1)) / den
    val scon = n2.toDouble * (n + 1) * (n + 1) -
      (n + 1).toDouble * sr + srr.toDouble / 4
    val v = (6.0 * scon - n2.toDouble * (n + 1) * (2 * n + 1)) / den
    val rho = 2.0 * (n.toDouble * n - 4) /
      ((2 * n + 1).toDouble * (8 * n + 11)) - 1
    val c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    val r = q("q_cucconi").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == rnd(u, 6))
    assert(r.getDouble(3) == rnd(v, 6))
    assert(r.getDouble(4) == rnd(c, 6))
  }

  test("q_fligner_policello matches the placement fold") {
    val g1 = ser.filter(_._1 == 1L).map(_._3)
    val g2 = ser.filter(_._1 == 2L).map(_._3)
    val p2 = g1.map(x => 2L * g2.count(_ < x) + g2.count(_ == x))
    val q2 = g2.map(y => 2L * g1.count(_ < y) + g1.count(_ == y))
    val (n1, n2) = (g1.length.toLong, g2.length.toLong)
    val sp = p2.sum; val sq = q2.sum
    val spp = p2.map(x => x * x).sum; val sqq = q2.map(x => x * x).sum
    val v1 = (spp - sp.toDouble * sp / n1) / 4
    val v2 = (sqq - sq.toDouble * sq / n2) / 4
    val pq = sp.toDouble / (2 * n1) * sq / (2 * n2)
    val uhat = (sp.toDouble / 2 - sq / 2.0) /
      (2.0 * math.sqrt(v1 + v2 + pq))
    val r = q("q_fligner_policello").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == rnd(uhat, 6))
  }

  test("q_savage_scores matches the harmonic-tail fold") {
    val n = ordered.length
    // descending accumulation, matching the window evaluation order
    var acc = 0.0
    val auByRank = new Array[Long](n + 1)
    (n to 1 by -1).foreach { rk =>
      acc += 1.0 / rk
      auByRank(rk) = rndL(acc * 1e9)
    }
    val rows = ordered.zipWithIndex.map { case (e, i0) =>
      (e._1, auByRank(i0 + 1))
    }
    val n1 = rows.count(_._1 == 1L).toLong
    val n2 = rows.count(_._1 == 2L).toLong
    val s1 = rows.filter(_._1 == 1L).map(_._2).sum
    val sa = rows.map(_._2).sum
    val saa = rows.map(x => BigInt(x._2) * x._2).sum
    val varn = n1.toDouble * n2 / ((n1 + n2).toDouble * (n1 + n2 - 1)) *
      (saa.toDouble - sa.toDouble * sa / (n1 + n2))
    val z = (s1 - n1.toDouble * sa / (n1 + n2)) / math.sqrt(varn)
    val r = q("q_savage_scores").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == rnd(z, 6))
  }

  test("q_ww_runs2 matches the run-count fold") {
    val gs = ordered.map(_._1)
    val runs = 1L + gs.sliding(2).count(a => a(0) != a(1))
    val n1 = gs.count(_ == 1L).toLong
    val n2 = gs.count(_ == 2L).toLong
    val n = n1 + n2
    val tw = 2.0 * n1 * n2
    val z = (runs - tw / n - 1) /
      math.sqrt(tw * (tw - n) / (n.toDouble * n * (n - 1)))
    val r = q("q_ww_runs2").collect()(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == runs)
    assert(r.getDouble(3) == rnd(z, 6))
  }
}
