package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-56 semantics (queries/StatsR9zzc.scala): brute-force
  * folds over the collected sf0.001 tables.
  */
class R9zzcOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per-type daily milli-means with days. */
  private lazy val daily: Array[(String, String, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(e => (e._1, e._2)).toArray
      .map { case ((t, d), g) => (t, d, g.map(_._3).sum / g.length) }

  test("q_concentration_index matches the rank fold") {
    val per = graft.tables.Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).toArray
      .map { case (u, g) =>
        (u, g.length.toLong,
          g.filter(_._2 == "purchase").map(e => rndL(e._3 * 100)).sum)
      }
    val sorted = per.sortBy(t => (t._2, t._1))
    val n = sorted.length.toLong
    val sy = sorted.map(_._3).sum
    val sry = sorted.zipWithIndex
      .map { case (t, i) => BigInt(i + 1) * t._3 }.sum
    val r = q("q_concentration_index").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd((2.0 * sry.toDouble
      - (n + 1).toDouble * sy) / (n.toDouble * sy), 6))
  }

  test("q_twoway_fe matches the snapped residual fold") {
    val mt = daily.groupBy(_._1).map { case (t, g) =>
      (t, (g.length.toLong, g.map(_._3).sum)) }
    val md = daily.groupBy(_._2).map { case (d, g) =>
      (d, (g.length.toLong, g.map(_._3).sum)) }
    val n = daily.length.toLong
    val sg = daily.map(_._3).sum
    val sgg = daily.map(y => y._3 * y._3).sum
    val ssres = daily.map { case (t, d, y) =>
      val e = y - mt(t)._2.toDouble / mt(t)._1 -
        md(d)._2.toDouble / md(d)._1 + sg.toDouble / n
      rndL(e * e)
    }.sum
    val sstot = (n * sgg - sg * sg).toDouble / n
    val r = q("q_twoway_fe").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(1.0 - ssres / sstot, 6))
    assert(r.getDouble(2) == rnd(math.sqrt(ssres.toDouble / n) / 1000, 6))
  }

  test("q_james_stein matches the shrinkage fold") {
    val mt = daily.groupBy(_._1).toArray.map { case (t, g) =>
      val nt = g.length.toLong; val st = g.map(_._3).sum
      val stt = g.map(y => y._3 * y._3).sum
      (t, nt, st, (nt * stt - st * st).toDouble / nt)
    }
    val k = mt.length.toLong
    val ntot = mt.map(_._2).sum; val sgAll = mt.map(_._3).sum
    val ssw = mt.map(_._4).sum
    val mbar = sgAll.toDouble / ntot
    val sig2m = ssw / (ntot - k) / (ntot.toDouble / k)
    val sdev = mt.map { case (_, nt, st, _) =>
      val m = st.toDouble / nt
      (m - mbar) * (m - mbar)
    }.sum
    val c = math.max(0.0, 1.0 - (k - 3).toDouble * sig2m / sdev)
    val want = mt.sortBy(_._1).map { case (t, nt, st, _) =>
      val m = st.toDouble / nt
      (t, rnd(m / 1000, 6), rnd((mbar + c * (m - mbar)) / 1000, 6),
        rnd(c, 6))
    }
    val got = q("q_james_stein").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_shift_share matches the within/mix fold") {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val odOf = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bh = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_extendedprice").collect()
      .map(r => (brandOf(r.getLong(1)),
        odOf(r.getLong(0)) < "1998-01-01", rndL(r.getDouble(2) * 100)))
      .groupBy(_._1).toArray
      .map { case (b, g) =>
        (b, g.filter(_._2).map(_._3).sum, g.filter(!_._2).map(_._3).sum)
      }.filter(_._2 > 0)
    val s1 = bh.map(_._2).sum; val s2 = bh.map(_._3).sum
    val sw = bh.map { case (_, r1, r2) =>
      rndL(r1.toDouble / s1 * (r2.toDouble / r1 - 1) * 1e9) }.sum
    val r = q("q_shift_share").collect()(0)
    assert(r.getLong(0) == bh.length.toLong)
    assert(r.getDouble(1) == rnd(s2.toDouble / s1 - 1, 6))
    assert(r.getDouble(2) == rnd(sw / 1e9, 6))
    assert(r.getDouble(3) ==
      rnd((s2.toDouble / s1 - 1) - sw / 1e9, 6))
  }

  test("q_kish_neff matches the weight fold") {
    val ws = graft.tables.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).map(g => rndL(1e9 / g._2.length)).toArray
    val n = ws.length.toLong
    val sw = ws.map(BigInt(_)).sum
    val sww = ws.map(w => BigInt(w) * w).sum
    val r = q("q_kish_neff").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) ==
      rnd(sw.toDouble * sw.toDouble / sww.toDouble, 4))
    assert(r.getDouble(2) ==
      rnd(n * sww.toDouble / (sw.toDouble * sw.toDouble), 6))
  }

  test("q_systematic_share matches the R2 fold") {
    def rets(series: Array[Long]): Array[Long] =
      series.sliding(2)
        .map(a => rndL(math.log(a(1).toDouble / a(0)) * 1e6)).toArray
    val byT = daily.groupBy(_._1).map { case (t, g) =>
      (t, g.sortBy(_._2).map(x => (x._2, x._3))) }
    // recompute market from raw events (per-day milli-mean)
    val market = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e3).toLong))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (d, g) => (d, g.map(_._2).sum / g.length) }
    val mRet = market.drop(1).map(_._1)
      .zip(rets(market.map(_._2))).toMap
    val want = byT.toArray.sortBy(_._1).flatMap { case (t, rows) =>
      val tr = rows.drop(1).map(_._1).zip(rets(rows.map(_._2)))
      val j = tr.flatMap { case (d, r0) => mRet.get(d).map(m => (m, r0)) }
      val n = j.length.toLong
      val sx = j.map(_._1).sum; val sy = j.map(_._2).sum
      val sxy = j.map(p => p._1 * p._2).sum
      val sxx = j.map(p => p._1 * p._1).sum
      val syy = j.map(p => p._2 * p._2).sum
      val cxy = n * sxy - sx * sy
      val cxx = n * sxx - sx * sx; val cyy = n * syy - sy * sy
      if (cxx <= 0 || cyy <= 0) None
      else {
        val r2 = cxy.toDouble * cxy / (cxx.toDouble * cyy)
        Some((t, n, rnd(r2, 6), rnd(1.0 - r2, 6)))
      }
    }
    val got = q("q_systematic_share").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
