package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-11 key-level pins (queries/StatsR10j.scala): the
  * nonparametric/robust two-sample family re-derived by brute-force
  * folds over the collected sf0.001 events.
  */
class R10jOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private case class Ev(typ: String, day: String, vM: Long, us: Long,
    id: Long, value: Double, kGt50: Boolean)

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      floor(col("value") * 1e3).cast("long").as("v_m"),
      (unix_micros(col("ts")) % 86400000000L).as("us"),
      col("event_id"), col("value"),
      coalesce(get_json_object(col("props"), "$.k").cast("int") > 50,
        lit(false)).as("k50"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))

  /** Daily milli means per type keyed by day. */
  private lazy val dm: Map[String, Array[(String, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_.vM).sum / g.length) }
    }

  private lazy val types: Array[String] = dm.keys.toArray.sorted

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_lepage matches the doubled-midrank fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val t1 = types(i); val t2 = types(j)
      val ys1 = dm(t1).map(_._2); val ys2 = dm(t2).map(_._2)
      val pool = ys1 ++ ys2
      val nn = pool.length.toLong
      def r2(v: Long): Long =
        2L * (pool.count(_ < v) + 1) + pool.count(_ == v) - 1
      val w2 = ys1.map(r2).sum
      val ab2 = ys1.map { v =>
        val r = r2(v); math.min(r, (nn + 1) * 2 - r)
      }.sum
      val n1 = ys1.length.toLong; val n2 = ys2.length.toLong
      val zw = (w2 - n1 * (nn + 1)) /
        math.sqrt(n1.toDouble * n2 * (nn + 1) / 3.0)
      val za = (ab2 / 2.0 - (if (nn % 2 == 0) n1 * (nn + 2) / 4.0
          else n1 * (nn + 1) * (nn + 1) / (nn * 4.0))) /
        math.sqrt(if (nn % 2 == 0)
            n1 * n2 * (nn + 2) * (nn - 2) / ((nn - 1) * 48.0)
          else n1 * n2 * (nn + 1) * (nn * nn + 3) / (nn * nn * 48.0))
      (t1, t2, n1, n2, rnd(zw, 4), rnd(za, 4), rnd(zw * zw + za * za, 4))
    }).toSeq
    val got = q("q_lepage").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want)
  }

  test("q_kuiper matches the D+ + D- fold") {
    val dayUs = 86400000000L
    val want = evs.groupBy(_.typ).toArray.sortBy(_._1).map {
      case (t, rows) =>
        val us = rows.sortBy(e => (e.us, e.id)).map(_.us)
        val n = us.length.toLong
        val dp = us.zipWithIndex.map { case (u, i) =>
          (i + 1) * dayUs - n * u }.max
        val dmn = us.zipWithIndex.map { case (u, i) =>
          n * u - i.toLong * dayUs }.max
        val v = (dp + dmn).toDouble / (n.toDouble * dayUs)
        (t, n, rnd(v, 6),
          rnd((math.sqrt(n.toDouble) + 0.155
            + 0.24 / math.sqrt(n.toDouble)) * v, 4))
    }
    val got = q("q_kuiper").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_sign_test matches the paired-day fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val m1 = dm(types(i)).toMap; val m2 = dm(types(j)).toMap
      val pairs = m1.keySet.intersect(m2.keySet).toSeq
        .map(d => (m1(d), m2(d))).filter(p => p._1 != p._2)
      val pos = pairs.count(p => p._1 > p._2).toLong
      val n = pairs.length.toLong
      (types(i), types(j), n, pos,
        rnd((pos * 2 - n) / math.sqrt(n.toDouble), 4))
    }).toSeq
    val got = q("q_sign_test").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("q_welch_anova matches the weighted fold") {
    val g = types.map(dm(_)).filter(_.length >= 2).map { rows =>
      val n = rows.length.toLong
      val m = rows.map(_._2).sum
      val ss = rows.map(r => r._2 * r._2).sum
      val s2 = (n.toDouble * ss - m.toDouble * m) / n / (n - 1)
      (n, n / s2, m.toDouble / n)
    }
    val k = g.length.toLong
    val sw = g.map(_._2).sum; val swx = g.map(x => x._2 * x._3).sum
    val xw = swx / sw
    val aNum = g.map(x => x._2 * (x._3 - xw) * (x._3 - xw)).sum
    val lam = g.map(x =>
      (1.0 - x._2 / sw) * (1.0 - x._2 / sw) / (x._1 - 1)).sum
    val want = (k, rnd((aNum / (k - 1))
      / (1.0 + 2.0 * (k - 2) / (k * k - 1) * lam), 4), k - 1,
      rnd((k * k - 1) / (3.0 * lam), 2))
    val r = q("q_welch_anova").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
      == want)
  }

  test("q_yuen_t matches the trimmed/winsorized fold") {
    val pt = types.flatMap { t =>
      val ys = dm(t).sortBy(r => (r._2, r._1)).map(_._2)
      val n = ys.length; val g = n / 5; val h = n - 2 * g
      if (h >= 2) {
        val lo = ys(g); val hi = ys(n - g - 1)
        val st = ys.slice(g, n - g).sum
        val tm = st.toDouble / h
        val wy = ys.map(y => math.min(math.max(y, lo), hi))
        val sw = wy.sum; val sw2 = wy.map(x => x * x).sum
        val vw = (n.toDouble * sw2 - sw.toDouble * sw) / n / (n - 1)
        val dj = (n - 1) * vw / (h.toDouble * (h - 1))
        Some((t, h.toLong, tm, dj))
      } else None
    }
    val want = (for {
      i <- pt.indices; j <- (i + 1) until pt.length
    } yield {
      val a = pt(i); val b = pt(j)
      (a._1, b._1, a._2, b._2,
        rnd((a._3 - b._3) / 1e3, 6),
        rnd((a._3 - b._3) / math.sqrt(a._4 + b._4), 4),
        rnd((a._4 + b._4) * (a._4 + b._4)
          / (a._4 * a._4 / (a._2 - 1) + b._4 * b._4 / (b._2 - 1)), 2))
    }).toSeq
    val got = q("q_yuen_t").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want)
  }

  test("q_relative_risk matches the 2x2 fold") {
    val want = evs.groupBy(_.typ).toArray.sortBy(_._1).map {
      case (t, rows) =>
        val a = rows.count(e => e.value > 100 && e.kGt50).toLong
        val b = rows.count(e => e.value > 100 && !e.kGt50).toLong
        val c = rows.count(e => e.value <= 100 && e.kGt50).toLong
        val dd = rows.count(e => e.value <= 100 && !e.kGt50).toLong
        val p1 = a / (a + b).toDouble; val p0 = c / (c + dd).toDouble
        val rr = p1 / p0
        val se = math.sqrt(1.0 / a - 1.0 / (a + b)
          + 1.0 / c - 1.0 / (c + dd))
        val rrs = math.max(rr, 1.0 / rr)
        (t, a, b, c, dd, rnd(rr, 4),
          rnd(math.exp(math.log(rr) - 1.96 * se), 4),
          rnd(math.exp(math.log(rr) + 1.96 * se), 4),
          rnd(p1 - p0, 6), rnd(rrs + math.sqrt(rrs * (rrs - 1.0)), 4))
    }
    val got = q("q_relative_risk").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8),
      r.getDouble(9)))
    assert(got.toSeq == want.toSeq)
  }
}
