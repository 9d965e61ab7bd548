package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 wave-7 semantics, beyond what the DuckDB oracles prove: every
  * technical indicator and classifier metric is re-derived here by a
  * brute-force fold over the collected sf0.001 events and compared
  * row-for-row against the query output.
  */
class R8eOpsSpec extends AnyFunSuite with SparkFixture {

  /** Raw event projection the pins fold over. */
  private case class Ev(typ: String, day: String, vC: Long, tsUs: Long,
    id: Long, k: Long, y: Int)

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      round(col("value") * 100).cast("long").as("v_c"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))

  /** Daily OHLC per type: (day, high, low, close, vol) sorted by day,
    * close = value of the (tsUs, id)-max row. */
  private lazy val ohlc: Map[String, Array[(String, Long, Long, Long, Long)]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1).map { case (d, g) =>
        val last = g.maxBy(e => (e.tsUs, e.id))
        (d, g.map(_.vC).max, g.map(_.vC).min, last.vC, g.length.toLong)
      }
    }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_bollinger matches brute-force rolling close stats") {
    val got = q("q_bollinger").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    var checked = 0
    for ((t, days) <- ohlc; i <- 6 until days.length) {
      val w = days.slice(i - 6, i + 1).map(_._4)
      val sm = w.sum; val sq = w.map(c => c * c).sum
      val mid = sm / 7.0
      val sd = math.sqrt((sq - sm.toDouble * sm / 7.0) / 6.0)
      val (gm, gu, gl, gb) = got((t, days(i)._1))
      assert(math.abs(gm - mid / 100.0) <= 1e-4)
      assert(math.abs(gu - (mid + 2 * sd) / 100.0) <= 1e-4)
      assert(math.abs(gl - (mid - 2 * sd) / 100.0) <= 1e-4)
      val c = days(i)._4
      val expB = if (c > mid + 2 * sd) 1L
        else if (c < mid - 2 * sd) -1L else 0L
      assert(gb === expB)
      checked += 1
    }
    assert(checked === got.size)
  }

  test("q_atr matches brute-force true-range means") {
    val got = q("q_atr").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3)))).toMap
    var checked = 0
    for ((t, days) <- ohlc) {
      val tr = days.indices.map { i =>
        val (_, h, l, _, _) = days(i)
        if (i == 0) h - l
        else {
          val pc = days(i - 1)._4
          math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
        }
      }
      for (i <- 6 until days.length) {
        val (gtr, gatr) = got((t, days(i)._1))
        assert(math.abs(gtr - tr(i) / 100.0) <= 1e-4)
        assert(math.abs(gatr
          - tr.slice(i - 6, i + 1).sum / 7.0 / 100.0) <= 1e-4)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_obv matches the exact sign-volume prefix sum") {
    val got = q("q_obv").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getLong(4)))).toMap
    for ((t, days) <- ohlc) {
      var obv = 0L
      for (i <- days.indices) {
        val dir = if (i == 0) 0L
          else java.lang.Long.signum(days(i)._4 - days(i - 1)._4).toLong
        obv += dir * days(i)._5
        assert(got((t, days(i)._1)) === ((dir, obv)))
      }
    }
  }

  test("q_stochastic matches brute-force %K/%D on the snapped grid") {
    val got = q("q_stochastic").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3)))).toMap
    var checked = 0
    for ((t, days) <- ohlc) {
      val kU = days.indices.map { i =>
        if (i < 13) None
        else {
          val w = days.slice(i - 13, i + 1)
          val h14 = w.map(_._2).max; val l14 = w.map(_._3).min
          if (h14 > l14)
            Some(math.round((days(i)._4 - l14) * 1e8 / (h14 - l14)))
          else None
        }
      }
      for (i <- days.indices
           if kU(i).isDefined && i >= 2
             && kU(i - 1).isDefined && kU(i - 2).isDefined) {
        val (gk, gd) = got((t, days(i)._1))
        assert(math.abs(gk - kU(i).get / 1e6) <= 1e-4)
        val sk = kU(i).get + kU(i - 1).get + kU(i - 2).get
        assert(math.abs(gd - sk / 3.0 / 1e6) <= 1e-4)
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("q_rolling_corr matches brute-force windowed correlation") {
    val dt = (t: String) => evs.filter(_.typ == t).groupBy(_.day)
      .map { case (d, g) => d -> g.map(_.vC).sum }
    val a = dt("click"); val b = dt("view")
    val days = (a.keySet intersect b.keySet).toArray.sorted
    val got = q("q_rolling_corr").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(2))).toMap
    assert(got.size === math.max(0, days.length - 13))
    for (i <- 13 until days.length) {
      val w = days.slice(i - 13, i + 1)
      val xs = w.map(a); val ys = w.map(b)
      val sa = xs.sum; val sb = ys.sum
      val sab = xs.zip(ys).map { case (x, y) => x * y }.sum
      val saa = xs.map(x => x * x).sum; val sbb = ys.map(y => y * y).sum
      val corr = (14.0 * sab - sa.toDouble * sb) /
        math.sqrt((14.0 * saa - sa.toDouble * sa)
          * (14.0 * sbb - sb.toDouble * sb))
      assert(math.abs(got(days(i)) - corr) <= 1e-5)
    }
  }

  test("q_brier_score / q_log_loss match per-day folds") {
    val brier = q("q_brier_score").collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1), r.getDouble(3))))
      .toMap
    val ll = q("q_log_loss").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(2))).toMap
    val byDay = evs.groupBy(_.day)
    assert(brier.keySet === byDay.keySet && ll.keySet === byDay.keySet)
    for ((d, g) <- byDay) {
      val se = g.map(e => { val r = e.k - 100L * e.y; r * r }).sum
      assert(brier(d)._1 === g.length.toLong)
      assert(math.abs(brier(d)._2 - se / (g.length * 1e4)) <= 1e-6)
      val tU = g.map { e =>
        val p = math.max(1L, math.min(99L, e.k)) / 100.0
        math.round(-1.0 * (e.y * math.log(p)
          + (1 - e.y) * math.log(1.0 - p)) * 1e9)
      }.sum
      assert(math.abs(ll(d) - tU.toDouble / g.length / 1e9) <= 1e-6)
    }
  }

  test("q_matthews_corr matches exact confusion-count MCC") {
    val r = q("q_matthews_corr").collect()(0)
    val tp = evs.count(e => e.k >= 50 && e.y == 1).toLong
    val fp = evs.count(e => e.k >= 50 && e.y == 0).toLong
    val fn = evs.count(e => e.k < 50 && e.y == 1).toLong
    val tn = evs.count(e => e.k < 50 && e.y == 0).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((tp, fp, fn, tn)))
    val mcc = (tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp + fp).toDouble * (tp + fn)
        * (tn.toDouble + fp) * (tn + fn))
    assert(math.abs(r.getDouble(4) - mcc) <= 1e-6)
    assert(math.abs(r.getDouble(5)
      - 2.0 * tp / (2.0 * tp + fp + fn)) <= 1e-6)
  }

  test("q_cohens_d matches pooled-sd effect size from exact moments") {
    val r = q("q_cohens_d").collect()(0)
    def mom(t: String) = {
      val v = evs.filter(_.typ == t).map(_.vC)
      (v.length.toLong, v.sum, v.map(x => x * x).sum)
    }
    val (n1, s1, q1) = mom("purchase"); val (n2, s2, q2) = mom("view")
    val m1 = s1.toDouble / n1 / 100.0; val m2 = s2.toDouble / n2 / 100.0
    val sp = math.sqrt(((q1 - s1.toDouble * s1 / n1)
      + (q2 - s2.toDouble * s2 / n2)) / (n1 + n2 - 2)) / 100.0
    assert((r.getLong(0), r.getLong(1)) === ((n1, n2)))
    assert(math.abs(r.getDouble(3) - (m1 - m2) / sp) <= 1e-5)
    assert(math.abs(r.getDouble(4) - (m1 - m2) / sp
      * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))) <= 1e-5)
  }

  test("q_poisson_gof matches exact daily-count dispersion") {
    val got = q("q_poisson_gof").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    for ((t, rows) <- evs.groupBy(_.typ)) {
      val c = rows.groupBy(_.day).map(_._2.length.toLong).toArray
      val k = c.length.toLong; val n = c.sum
      val qq = c.map(x => x * x).sum
      val varD = (qq - n.toDouble * n / k) / (k - 1)
      val (gk, gn, gd) = got(t)
      assert((gk, gn) === ((k, n)))
      assert(math.abs(gd - varD / (n.toDouble / k)) <= 1e-5)
    }
  }
}
