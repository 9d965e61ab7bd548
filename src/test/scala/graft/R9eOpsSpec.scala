package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-5 semantics (queries/StatsR9e.scala): risk backtests,
  * drawdown spells, user turnover, tolerance as-of, and ANN recall —
  * each re-derived by a brute-force fold over the collected sf0.001
  * events, independent of the Spark plan under test.
  */
class R9eOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // raw events: (event_id, ts_us, day, user_id, event_type, value)
  private lazy val evs: Array[(Long, Long, String, Long, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")),
        to_date(col("ts")).cast("string"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))

  /** per-type day-ordered µ-snapped log returns: type -> Array of
    * (day, r_u) in day order — the retIdx fold. */
  private lazy val returns: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._5).map { case (t, g) =>
      val daily = g.groupBy(_._3).map { case (d0, gg) =>
        val sm = gg.map(e => math.floor(e._6 * 1e3).toLong).sum
        (d0, sm / gg.length) // exact integer div (all positive)
      }.toArray.sortBy(_._1)
      val rs = daily.sliding(2).collect { case Array((_, py), (d1, y)) =>
        (d1, rnd(math.log(y.toDouble / py) * 1e6))
      }.toArray
      t -> rs
    }

  test("q_var_historical matches the ceil-rank order-statistic fold") {
    val got = q("q_var_historical").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === returns.keySet)
    for ((t, rs) <- returns) {
      val n = rs.length.toLong
      val k = math.ceil(n * 0.05).toLong.toInt
      val tail = rs.sortBy { case (d0, ru) => (ru, d0) }.take(k).map(_._2)
      val (gn, gk, gvar, gcvar) = got(t)
      assert(gn === n)
      assert(gk === k.toLong)
      assert(math.abs(gvar - (-tail.max / 1e6)) <= 1e-9)
      assert(math.abs(gcvar -
        rnd(-tail.sum.toDouble / k / 1e6 * 1e6) / 1e6) <= 1e-9)
    }
  }

  test("q_kupiec_pof matches the train-min threshold LR fold") {
    val got = q("q_kupiec_pof").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, rs) <- returns) {
      val thr = rs.take(14).map(_._2).min
      val test0 = rs.drop(14)
      val nTest = test0.length.toLong
      val x = test0.count(_._2 < thr).toLong
      val fr = x.toDouble / nTest
      val lr = -2.0 * ((nTest - x) * math.log(0.95) + x * math.log(0.05)
        - (if (x == nTest) 0.0 else (nTest - x) * math.log(1.0 - fr))
        - (if (x == 0L) 0.0 else x * math.log(fr)))
      val (gn, gx, glr) = got(t)
      assert(gn === nTest)
      assert(gx === x)
      assert(math.abs(glr - rnd(lr * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_drawdown_duration matches the below-peak island fold") {
    val got = q("q_drawdown_duration").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    for ((t, g) <- evs.groupBy(_._5)) {
      // daily close = v_c of the max (ts_us, event_id) row, day order
      val closes = g.groupBy(_._3).map { case (d0, gg) =>
        val last = gg.maxBy(e => (e._2, e._1))
        (d0, rnd(last._6 * 100))
      }.toArray.sortBy(_._1).map(_._2)
      var peak = Long.MinValue
      val spells = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = 0L
      for (c <- closes) {
        peak = math.max(peak, c)
        if (c < peak) cur += 1
        else if (cur > 0) { spells += cur; cur = 0 }
      }
      if (cur > 0) spells += cur
      if (spells.nonEmpty) {
        val (gd, gs, gm) = got(t)
        assert(gd === spells.sum)
        assert(gs === spells.length.toLong)
        assert(gm === spells.max)
      } else assert(!got.contains(t))
    }
  }

  test("q_user_turnover matches the day-pair set fold") {
    val act: Map[String, Set[Long]] = evs.groupBy(_._3)
      .map { case (d0, g) => d0 -> g.map(_._4).toSet }
    val days = act.keys.toArray.sorted
    val got = q("q_user_turnover").collect()
      .map(r => (r.get(0).toString, (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    var pairs = 0
    for (Array(d1, d2) <- days.sliding(2)) {
      // only consecutive calendar days form a pair
      if (java.time.LocalDate.parse(d1).plusDays(1)
          == java.time.LocalDate.parse(d2)) {
        val a = act(d1); val b = act(d2)
        val ret = (a & b).size.toLong
        val (gr, gl, gn, gj) = got(d2)
        assert(gr === ret)
        assert(gl === a.size - ret)
        assert(gn === b.size - ret)
        assert(math.abs(gj - rnd(ret * 1e6 / (a.size + b.size - ret))
          / 1e6) <= 1e-9)
        pairs += 1
      }
    }
    assert(pairs === got.size)
  }

  test("q_asof_tolerance matches the per-user linear asof fold") {
    val matched = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    for ((_, g) <- evs.filter(e => e._5 == "click" || e._5 == "purchase")
        .groupBy(_._4)) {
      val ord = g.sortBy(e => (e._2, e._1))
      var lastClick = Option.empty[Long]
      for (e <- ord) {
        if (e._5 == "purchase") {
          val ok = lastClick.exists(c => e._2 - c <= 3600000000L)
          val (np, nm, lag) = matched.getOrElse(e._3, (0L, 0L, 0L))
          matched(e._3) = (np + 1,
            nm + (if (ok) 1L else 0L),
            lag + (if (ok) e._2 - lastClick.get else 0L))
        }
        if (e._5 == "click") lastClick = Some(e._2)
      }
    }
    val got = q("q_asof_tolerance").collect()
      .map(r => (r.get(0).toString, (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val expAll = matched.filter(_._2._2 > 0)
    assert(got.keySet === expAll.keySet.toSet)
    for ((d0, (np, nm, lag)) <- expAll) {
      val (gp, gm, glag) = got(d0)
      assert(gp === np)
      assert(gm === nm)
      assert(math.abs(glag - rnd(lag.toDouble / nm / 1e6 * 1e4) / 1e4)
        <= 1e-9)
    }
  }

  test("q_ann_recall equals the leg-intersection over the pinned legs") {
    val ivf = SparkEntry.queries("q_sim_ivf")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val common = (ivf & exact).size.toLong
    val r = q("q_ann_recall").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 10L)
    assert(r(0).getLong(1) === common)
    assert(math.abs(r(0).getDouble(2) - rnd(common / 10.0 * 100) / 100.0)
      <= 1e-9)
  }
}
