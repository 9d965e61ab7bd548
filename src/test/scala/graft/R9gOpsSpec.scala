package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-7 semantics (queries/StatsR9g.scala): each test/metric
  * re-derived by a brute-force fold over the collected sf0.001
  * tables, independent of the join/window shapes under test.
  */
class R9gOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (day, user_id, event_type, value)
  private lazy val evs: Array[(String, Long, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))

  // per-type day-ordered daily milli mean y (exact integer div)
  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._3).map { case (t, g) =>
      t -> g.groupBy(_._1).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._4 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  test("q_cox_stuart matches the half-split sign fold") {
    val got = q("q_cox_stuart").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length
      val h = (n + 1) / 2
      val pairs = (0 until n / 2).map(i => (ys(i), ys(i + h)))
      val plus = pairs.count(p => p._2 > p._1).toLong
      val minus = pairs.count(p => p._2 < p._1).toLong
      val np = plus + minus
      if (np > 0) {
        val (gn, gp, gm, gz) = got(t)
        assert(gn === np)
        assert(gp === plus)
        assert(gm === minus)
        assert(math.abs(gz - rnd((plus * 2 - np) / math.sqrt(np.toDouble)
          * 1e4) / 1e4) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_buishand matches the cleared prefix-deviation fold") {
    val got = q("q_buishand").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length.toLong
      val tot = ys.sum
      var p = 0L
      val nss = ys.zipWithIndex.map { case (y, i) =>
        p += y; n * p - (i + 1).toLong * tot
      }
      val mx = nss.max; val mn = nss.min
      val syy = ys.map(y => y * y).sum
      if (n > 1 && n * syy > tot * tot) {
        val rb = (mx - mn).toDouble / n /
          math.sqrt((n * syy - tot * tot).toDouble / (n * (n - 1))) /
          math.sqrt(n.toDouble)
        val (gn, gr, gs) = got(t)
        assert(gn === n)
        assert(gr === mx - mn)
        assert(math.abs(gs - rnd(rb * 1e6) / 1e6) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_jonckheere matches the doubled pair-count fold") {
    val types = dmean.keys.toArray.sorted
    var j2 = 0L
    for (i <- types.indices; j <- i + 1 until types.length;
         x <- dmean(types(i)).map(_._2); y <- dmean(types(j)).map(_._2)) {
      if (x < y) j2 += 2 else if (x == y) j2 += 1
    }
    val nks = types.map(t => dmean(t).length.toLong)
    val nTot = nks.sum
    val sk2 = nks.map(x => x * x).sum
    val sk23 = nks.map(x => x * x * (x * 2 + 3)).sum
    val z = (j2 / 2.0 - (nTot * nTot - sk2) / 4.0) /
      math.sqrt((nTot * nTot * (nTot * 2 + 3) - sk23).toDouble / 72.0)
    val r = q("q_jonckheere").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === j2)
    assert(r(0).getLong(1) === nTot)
    assert(math.abs(r(0).getDouble(2) - rnd(z * 1e4) / 1e4) <= 1e-9)
  }

  test("q_icc matches the one-way ANOVA fold") {
    val k = dmean.size
    val byDay = dmean.toArray.flatMap { case (t, ds) => ds.map(x => (x._1, x._2)) }
      .groupBy(_._1).filter(_._2.length == k)
    val n = byDay.size.toLong
    val ts = byDay.values.map(_.map(_._2).sum).toArray
    val tt = ts.sum
    val st2 = ts.map(x => x * x).sum
    val syy = byDay.values.flatMap(_.map(x => x._2 * x._2)).sum
    val msb = (st2.toDouble / k - tt.toDouble * tt / (n * k.toDouble)) /
      (n - 1)
    val msw = (syy.toDouble - st2.toDouble / k) / (n * (k - 1))
    val icc = (msb - msw) / (msb + (k - 1).toDouble * msw)
    val r = q("q_icc").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === k.toLong)
    assert(r(0).getLong(1) === n)
    assert(math.abs(r(0).getDouble(2) - rnd(icc * 1e6) / 1e6) <= 1e-9)
  }

  test("q_distinct_n matches the token/bigram set fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val got = q("q_distinct_n").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))).toMap
    for ((src, g) <- docs.groupBy(_._1)) {
      val toks = g.flatMap(_._2)
      val bis = g.flatMap(d => d._2.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
      val (gn, g1, gb, g2) = got(src)
      assert(gn === toks.length.toLong)
      assert(math.abs(g1 - rnd(toks.distinct.length.toDouble
        / toks.length * 1e6) / 1e6) <= 1e-9)
      assert(gb === bis.length.toLong)
      assert(math.abs(g2 - rnd(bis.distinct.length.toDouble
        / bis.length * 1e6) / 1e6) <= 1e-9)
    }
  }

  test("q_assoc_rules matches the per-user set fold") {
    val sets = evs.groupBy(_._2).map { case (u, g) => u -> g.map(_._3).toSet }
    val nUsers = sets.size.toLong
    val types = evs.map(_._3).distinct.sorted
    val got = q("q_assoc_rules").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    var checked = 0
    for (a <- types; b <- types if a != b) {
      val na = sets.values.count(_.contains(a)).toLong
      val nb = sets.values.count(_.contains(b)).toLong
      val nab = sets.values.count(st => st.contains(a) && st.contains(b))
        .toLong
      if (nab > 0) {
        val (gn, gsup, gconf, glift) = got((a, b))
        assert(gn === nab)
        assert(math.abs(gsup - rnd(nab.toDouble / nUsers * 1e6) / 1e6)
          <= 1e-9)
        assert(math.abs(gconf - rnd(nab.toDouble / na * 1e6) / 1e6)
          <= 1e-9)
        assert(math.abs(glift - rnd(nab.toDouble * nUsers
          / (na.toDouble * nb) * 1e4) / 1e4) <= 1e-9)
        checked += 1
      }
    }
    assert(checked === got.size)
  }
}
