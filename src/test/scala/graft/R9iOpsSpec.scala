package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-9 semantics (queries/StatsR9i.scala): each statistic
  * re-derived by a brute-force fold over the collected sf0.001
  * tables, independent of the plans under test.
  */
class R9iOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (event_id, ts_us, day, user_id, event_type, value)
  private lazy val evs: Array[(Long, Long, String, Long, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")),
        to_date(col("ts")).cast("string"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._5).map { case (t, g) =>
      t -> g.groupBy(_._3).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._6 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  private def rets(ds: Array[(String, Long)]): Array[(String, Long)] =
    ds.sliding(2).collect { case Array((_, py), (d1, y)) =>
      (d1, rnd(math.log(y.toDouble / py) * 1e6))
    }.toArray

  test("q_kelly_fraction matches the cleared-sum fold") {
    val got = q("q_kelly_fraction").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val rs = rets(ds).map(_._2)
      val n = rs.length.toLong
      val sr = rs.sum
      val srr = rs.map(r0 => r0 * r0).sum
      val clr = n * srr - sr * sr
      if (n > 1 && clr > 0) {
        val (gn, gmu, gsig, gk) = got(t)
        assert(gn === n)
        assert(math.abs(gmu - rnd(sr.toDouble / n / 1e6 * 1e6) / 1e6)
          <= 1e-9)
        assert(math.abs(gsig - rnd(math.sqrt(clr.toDouble / (n * (n - 1)))
          / 1e6 * 1e6) / 1e6) <= 1e-9)
        assert(math.abs(gk - rnd((sr * (n - 1)).toDouble * 1e6 / clr
          * 1e4) / 1e4) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_information_ratio matches the active-return fold") {
    // market daily milli mean over ALL events, then µ log returns
    val mkt = evs.groupBy(_._3).map { case (d0, g) =>
      (d0, g.map(e => math.floor(e._6 * 1e3).toLong).sum / g.length)
    }.toArray.sortBy(_._1)
    val rm = rets(mkt).toMap
    val got = q("q_information_ratio").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val as = rets(ds).flatMap { case (d0, r0) =>
        rm.get(d0).map(r0 - _)
      }
      val n = as.length.toLong
      val sa = as.sum
      val saa = as.map(a => a * a).sum
      val clr = n * saa - sa * sa
      if (n > 1 && clr > 0) {
        val sd = math.sqrt(clr.toDouble / (n * (n - 1)))
        val (gn, gte, gir) = got(t)
        assert(gn === n)
        assert(math.abs(gte - rnd(sd / 1e6 * 1e6) / 1e6) <= 1e-9)
        assert(math.abs(gir - rnd(sa.toDouble / n / sd * 1e6) / 1e6)
          <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_bowker matches the snapped symmetry fold") {
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, g) <- evs.groupBy(_._4)) {
      val ord = g.sortBy(e => (e._2, e._1)).map(_._5)
      for (Array(a, b) <- ord.sliding(2).map(_.toArray) if a != b)
        trans((a, b)) = trans.getOrElse((a, b), 0L) + 1
    }
    val types = evs.map(_._5).distinct.sorted
    var su = 0L; var df = 0L
    for (i <- types.indices; j <- i + 1 until types.length) {
      val nij = trans.getOrElse((types(i), types(j)), 0L)
      val nji = trans.getOrElse((types(j), types(i)), 0L)
      if (nij + nji > 0) {
        su += rnd((nij - nji).toDouble * (nij - nji) * 1e6 / (nij + nji))
        df += 1
      }
    }
    val r = q("q_bowker").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === df)
    assert(math.abs(r(0).getDouble(1) - rnd(su / 1e6 * 1e4) / 1e4)
      <= 1e-9)
  }

  test("q_cmh matches the snapped stratified fold") {
    val flags = evs.groupBy(e => (e._3, e._4)).map { case ((d0, u), g) =>
      val ts = g.map(_._5).toSet
      (d0, if (ts("click")) 1L else 0L, if (ts("purchase")) 1L else 0L)
    }
    val byDow = flags.groupBy { case (d0, _, _) =>
      java.time.LocalDate.parse(d0).getDayOfWeek.getValue % 7 + 1
    }
    var s1 = 0L; var s2 = 0L; var ns = 0L
    for ((_, g) <- byDow) {
      val nn = g.size.toLong
      if (nn > 1) {
        val r1 = g.map(_._2).sum; val c1 = g.map(_._3).sum
        val a = g.count(x => x._2 == 1 && x._3 == 1).toLong
        s1 += rnd((a.toDouble * nn - r1.toDouble * c1) * 1e6 / nn)
        s2 += rnd(r1.toDouble * c1 * (nn - r1) * (nn - c1) * 1e6 /
          (nn.toDouble * nn * (nn - 1)))
        ns += 1
      }
    }
    val r = q("q_cmh").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === ns)
    assert(math.abs(r(0).getDouble(1)
      - rnd(s1.toDouble * s1 / (s2 * 1e6) * 1e4) / 1e4) <= 1e-9)
  }

  test("q_runs_updown matches the sign-run fold") {
    val got = q("q_runs_updown").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val sgns = ds.map(_._2).sliding(2).collect {
        case Array(a, b) if a != b => if (b > a) 1 else 0
      }.toArray
      val n = sgns.length.toLong + 1
      if (n >= 4) {
        var runs = 0L
        for (i <- sgns.indices)
          if (i == 0 || sgns(i) != sgns(i - 1)) runs += 1
        val z = (runs - (n * 2 - 1) / 3.0) / math.sqrt((n * 16 - 29) / 90.0)
        val (gn, gr, gz) = got(t)
        assert(gn === n)
        assert(gr === runs)
        assert(math.abs(gz - rnd(z * 1e4) / 1e4) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_graph_modularity matches the cleared-Q fold over the legs") {
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lbl = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val m = edges.length.toLong
    val lc = edges.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy { case (a, _) => lbl(a) }.map { case (c, g) =>
        c -> g.length.toLong
      }
    val dc = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(lbl).map { case (c, g) => c -> g.length.toLong }
    val qn = dc.map { case (c, d0) =>
      4 * m * lc.getOrElse(c, 0L) - d0 * d0
    }.sum
    val mod = qn.toDouble / (m.toDouble * m * 4)
    val r = q("q_graph_modularity").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === dc.size.toLong)
    assert(r(0).getLong(1) === m)
    assert(math.abs(r(0).getDouble(2) - rnd(mod * 1e6) / 1e6) <= 1e-9)
  }
}
