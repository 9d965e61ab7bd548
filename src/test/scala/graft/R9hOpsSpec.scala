package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-8 semantics (queries/StatsR9h.scala): each diagnostic
  * re-derived by a brute-force fold over the collected sf0.001
  * events, independent of the rank/window shapes under test.
  */
class R9hOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val evs: Array[(String, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._2).map { case (t, g) =>
      t -> g.groupBy(_._1).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  /** doubled pooled midranks for a value within a pool */
  private def r2(pool: Array[Long], y: Long): Long = {
    val below = pool.count(_ < y).toLong
    val ties = pool.count(_ == y).toLong
    (below + 1) * 2 + ties - 1
  }

  test("q_ansari_bradley matches the doubled end-score fold") {
    val types = dmean.keys.toArray.sorted
    val got = q("q_ansari_bradley").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    for (i <- types.indices; j <- i + 1 until types.length) {
      val t1 = types(i); val t2 = types(j)
      val y1 = dmean(t1).map(_._2); val y2 = dmean(t2).map(_._2)
      val pool = y1 ++ y2
      val nn = pool.length.toLong
      def s2(y: Long): Long = {
        val r = r2(pool, y); math.min(r, (nn + 1) * 2 - r)
      }
      val ab2 = y1.map(s2).sum
      val n1 = y1.length.toLong; val n2 = y2.length.toLong
      val (e, v) =
        if (nn % 2 == 0)
          (n1 * (nn + 2) / 4.0,
            n1 * n2 * (nn + 2) * (nn - 2) / ((nn - 1) * 48.0))
        else
          (n1 * (nn + 1) * (nn + 1) / (nn * 4.0),
            n1 * n2 * (nn + 1) * (nn * nn + 3) / (nn * nn * 48.0))
      val z = (ab2 / 2.0 - e) / math.sqrt(v)
      val (gn1, gn2, gab, gz) = got((t1, t2))
      assert(gn1 === n1); assert(gn2 === n2); assert(gab === ab2)
      assert(math.abs(gz - rnd(z * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_cuzick_trend matches the doubled-midrank trend fold") {
    val types = dmean.keys.toArray.sorted
    val pool = types.flatMap(t => dmean(t).map(_._2))
    val n = pool.length.toLong
    var t2s = 0L; var sl = 0L; var sl2 = 0L
    for ((t, li) <- types.zipWithIndex; y <- dmean(t).map(_._2)) {
      val l = (li + 1).toLong
      t2s += l * r2(pool, y); sl += l; sl2 += l * l
    }
    val tsum = pool.groupBy(identity).values
      .map(g => { val c = g.length.toLong; c * c * c - c }).sum
    val z = (t2s - (n + 1) * sl) / 2.0 /
      math.sqrt((n + 1) * (n * sl2 - sl * sl) / (n * 12.0) *
        (1.0 - tsum / (n.toDouble * n * n - n)))
    val r = q("q_cuzick_trend").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n)
    assert(r(0).getLong(1) === t2s)
    assert(math.abs(r(0).getDouble(2) - rnd(z * 1e4) / 1e4) <= 1e-9)
  }

  test("q_snht matches the cleared-deviation max fold") {
    val got = q("q_snht").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.get(2).toString,
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length.toLong
      val m = ys.sum
      val ss = ys.map(y => y * y).sum
      if (n * ss > m * m && n > 1) {
        var p = 0L
        val tts = (0 until (n - 1).toInt).map { i0 =>
          p += ys(i0)
          val i = (i0 + 1).toLong
          val dd = n * p - i * m
          dd.toDouble * dd * n / (i * (n - i) * (n * ss - m * m).toDouble)
        }
        val mx = tts.max
        val tStar = ds(tts.indexOf(mx))._1
        val (gn, gt, gk) = got(t)
        assert(gn === n)
        assert(gt === tStar)
        assert(math.abs(gk - rnd(mx * 1e4) / 1e4) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_variance_ratio matches the exact big-sum fold") {
    val got = q("q_variance_ratio").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val rs = ds.map(_._2).sliding(2).collect { case Array(py, y) =>
        rnd(math.log(y.toDouble / py) * 1e6)
      }.toArray
      val n = rs.length.toLong
      val m = rs.sum
      val s1 = rs.map(r0 => BigInt(n * r0 - m) * BigInt(n * r0 - m)).sum
      val qs = rs.sliding(5).filter(_.length == 5).map(_.sum).toArray
      val sq = qs.map(s => BigInt(n * s - m * 5) * BigInt(n * s - m * 5)).sum
      val mo = qs.length.toLong
      if (s1 > 0 && mo > 0) {
        val vr = sq.toDouble * n / (mo * 5.0 * s1.toDouble)
        val (gn, gm, gv) = got(t)
        assert(gn === n)
        assert(gm === mo)
        assert(math.abs(gv - rnd(vr * 1e6) / 1e6) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_dixon_q matches the order-statistic fold") {
    val got = q("q_dixon_q").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2).sorted
      val n = ys.length
      if (n >= 2 && ys.last > ys.head) {
        val qh = (ys(n - 1) - ys(n - 2)).toDouble / (ys.last - ys.head)
        val ql = (ys(1) - ys.head).toDouble / (ys.last - ys.head)
        val (gn, gqh, gql) = got(t)
        assert(gn === n.toLong)
        assert(math.abs(gqh - rnd(qh * 1e6) / 1e6) <= 1e-9)
        assert(math.abs(gql - rnd(ql * 1e6) / 1e6) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_page_trend matches the weekly-block rank fold") {
    val types = dmean.keys.toArray.sorted
    val k = types.length
    // weekly value = sum(y) div count over the ISO week (Mon start)
    val weekly = dmean.toArray.flatMap { case (t, ds) =>
      ds.groupBy { case (d0, _) =>
        val ld = java.time.LocalDate.parse(d0)
        ld.minusDays(ld.getDayOfWeek.getValue - 1L)
      }.map { case (w, g) =>
        (w.toString, t, g.map(_._2).sum / g.length)
      }
    }
    val blocks = weekly.groupBy(_._1).filter(_._2.length == k)
    var lStat = 0L
    for ((_, g) <- blocks) {
      val ranked = g.sortBy(x => (x._3, x._2)).zipWithIndex
      for (((_, t, _), r0) <- ranked)
        lStat += (types.indexOf(t) + 1).toLong * (r0 + 1)
    }
    val b = blocks.size.toLong
    val e = b * (k * (k + 1) * (k + 1)) / 4.0
    val v = b * (k * k * k - k).toDouble * (k * k * k - k) /
      ((k - 1) * 144.0)
    val z = (lStat - e) / math.sqrt(v)
    val r = q("q_page_trend").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === b)
    assert(r(0).getLong(1) === lStat)
    assert(math.abs(r(0).getDouble(2) - rnd(z * 1e4) / 1e4) <= 1e-9)
  }
}
