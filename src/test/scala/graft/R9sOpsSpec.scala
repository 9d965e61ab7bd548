package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-19 semantics (queries/StatsR9s.scala): folds over the
  * collected sf0.001 tables.
  */
class R9sOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (ts_us, hour_us, day, event_type, value)
  private lazy val evs: Array[(Long, Long, String, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(unix_micros(col("ts")),
        unix_micros(date_trunc("hour", col("ts"))),
        to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4)))

  private def ols(pts: Array[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val n = pts.length.toLong
    (n, pts.map(_._1).sum, pts.map(_._2).sum,
      pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
  }

  test("q_heaps_fit matches the snapped-log OLS over the curve leg") {
    val curve = SparkEntry.queries("q_vocab_growth")(spark, sf)
      .select("cum_tokens", "vocab_size").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 > 0 && p._2 > 0)
    val pts = curve.map { case (x, y) =>
      (rnd(math.log(x.toDouble) * 1e6), rnd(math.log(y.toDouble) * 1e6))
    }
    val (n, sx, sy, sxy, sxx) = ols(pts)
    val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    val k = math.exp((sy.toDouble - beta * sx) / n / 1e6)
    val r = q("q_heaps_fit").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n)
    assert(math.abs(r(0).getDouble(1) - rnd(beta * 1e4) / 1e4) <= 1e-9)
    assert(math.abs(r(0).getDouble(2) - rnd(k * 1e4) / 1e4) <= 1e-9)
  }

  test("q_fano_factor matches the exact-ratio fold") {
    val got = q("q_fano_factor").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, g) <- evs.groupBy(_._4)) {
      val cs = g.groupBy(_._2).map(_._2.length.toLong).toArray
      val n = cs.length.toLong
      val sc = cs.sum; val scc = cs.map(c => c * c).sum
      if (n > 1 && sc > 0) {
        val fano = (n * scc - sc * sc).toDouble / ((n - 1) * sc)
        val sd = math.sqrt((n * scc - sc * sc).toDouble / (n * (n - 1)))
        val mu = sc.toDouble / n
        val b = (sd - mu) / (sd + mu)
        val (gn, gf, gb) = got(t)
        assert(gn === n)
        assert(math.abs(gf - rnd(fano * 1e4) / 1e4) <= 1e-9)
        assert(math.abs(gb - rnd(b * 1e4) / 1e4) <= 1e-9)
      }
    }
  }

  test("q_taylor_law matches the per-day OLS fold") {
    val got = q("q_taylor_law").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, g) <- evs.groupBy(_._4)) {
      val pts = g.groupBy(_._3).toArray.flatMap { case (_, gd) =>
        val cs = gd.groupBy(_._2).map(_._2.length.toLong).toArray
        val nh = cs.length.toLong
        val sc = cs.sum; val scc = cs.map(c => c * c).sum
        if (nh > 1 && nh * scc > sc * sc) Some((
          rnd(math.log(sc.toDouble / nh) * 1e6),
          rnd(math.log((nh * scc - sc * sc).toDouble / (nh * (nh - 1)))
            * 1e6)))
        else None
      }
      if (pts.length > 1) {
        val (n, sx, sy, sxy, sxx) = ols(pts)
        if (n * sxx > sx * sx) {
          val b = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
          val (gn, gb) = got(t)
          assert(gn === n)
          assert(math.abs(gb - rnd(b * 1e4) / 1e4) <= 1e-9)
        }
      }
    }
  }

  test("q_renyi2 matches the histogram fold") {
    val got = q("q_renyi2").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, g) <- evs.groupBy(_._4)) {
      val h = g.groupBy(e => rnd(e._5 * 100)).map(_._2.length.toLong)
      val nn = h.sum; val sn2 = h.map(x => x * x).sum
      val r2 = 2 * math.log(nn.toDouble) - math.log(sn2.toDouble)
      val (gn, gd, gr) = got(t)
      assert(gn === nn)
      assert(gd === h.size.toLong)
      assert(math.abs(gr - rnd(r2 * 1e6) / 1e6) <= 1e-9)
    }
  }

  test("q_arch_lm matches the BigInt moment fold") {
    val got = q("q_arch_lm").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val dmean = evs.groupBy(_._4).map { case (t, g) =>
      t -> g.groupBy(_._3).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._5 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }
    for ((t, ds) <- dmean) {
      val rs = ds.map(_._2).sliding(2).collect { case Array(py, y) =>
        rnd(math.log(y.toDouble / py) * 1e6)
      }.toArray
      val sq = rs.map(r0 => r0 * r0)
      val prs = sq.sliding(2).collect { case Array(a, b) => (a, b) }
        .toArray
      val n = prs.length.toLong
      if (n > 2) {
        val sx = prs.map(p => BigInt(p._1)).sum
        val sy = prs.map(p => BigInt(p._2)).sum
        val sxy = prs.map(p => BigInt(p._1) * BigInt(p._2)).sum
        val sxx = prs.map(p => BigInt(p._1) * BigInt(p._1)).sum
        val syy = prs.map(p => BigInt(p._2) * BigInt(p._2)).sum
        val cxy = (BigInt(n) * sxy - sx * sy).toDouble
        val cxx = (BigInt(n) * sxx - sx * sx).toDouble
        val cyy = (BigInt(n) * syy - sy * sy).toDouble
        if (cxx > 0 && cyy > 0) {
          val r2 = cxy * cxy / (cxx * cyy)
          val (gn, gr, gl) = got(t)
          assert(gn === n)
          assert(math.abs(gr - rnd(r2 * 1e6) / 1e6) <= 1e-9)
          assert(math.abs(gl - rnd(n * r2 * 1e4) / 1e4) <= 1e-9)
        }
      }
    }
  }

  test("q_weighted_kappa matches the cleared fold") {
    val ords = graft.tables.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        col("o_orderdate").cast("date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def ntile3(xs: Array[(Long, Long)]): Map[Long, Long] = {
      val sorted = xs.sortBy(x => (x._2, x._1))
      val n = sorted.length
      val base = n / 3; val extra = n % 3
      var idx = 0
      val out = scala.collection.mutable.Map.empty[Long, Long]
      for (b <- 0 until 3) {
        val sz = base + (if (b < extra) 1 else 0)
        for (_ <- 0 until sz) { out(sorted(idx)._1) = b + 1L; idx += 1 }
      }
      out.toMap
    }
    val h1 = ntile3(ords.filter(_._2 < "1996-01-01").groupBy(_._1)
      .map { case (c, g) => (c, g.length.toLong) }.toArray)
    val h2 = ntile3(ords.filter(_._2 >= "1996-01-01").groupBy(_._1)
      .map { case (c, g) => (c, g.length.toLong) }.toArray)
    val both = h1.keySet.intersect(h2.keySet).toArray
    val m = both.map(c => (h1(c), h2(c)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val nn = both.length.toLong
    val wo = m.map { case ((i, j), c) => math.abs(i - j) * c }.sum
    val rt = m.groupBy(_._1._1).map { case (i, g) => i -> g.values.sum }
    val ct = m.groupBy(_._1._2).map { case (j, g) => j -> g.values.sum }
    val we = (for (i <- rt.keys; j <- ct.keys)
      yield math.abs(i - j) * rt(i) * ct(j)).sum
    val kw = 1.0 - nn.toDouble * wo / we
    val r = q("q_weighted_kappa").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === nn)
    assert(math.abs(r(0).getDouble(1) - rnd(kw * 1e4) / 1e4) <= 1e-9)
  }
}
