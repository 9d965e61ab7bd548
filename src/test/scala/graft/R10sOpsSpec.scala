package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-20 key-level pins (queries/StatsR10s.scala): OBF looks,
  * QTE deciles, two-feature Shapley, banded DTW — brute-force folds.
  */
class R10sOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(String, Boolean, Long, Long, Double, Boolean, String)] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string").as("day"),
        (pmod(col("user_id"), lit(2)) === 0).as("tr"),
        floor(col("value") * 1e3).cast("long").as("vm"),
        col("event_id"), col("value"),
        coalesce(get_json_object(col("props"), "$.k").cast("int") > 50,
          lit(false)).as("kb"),
        col("event_type"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5), r.getString(6)))

  test("q_obrien_fleming matches the look fold") {
    val days = ev.map(_._1).distinct.sorted
    val nd = days.length
    val want = (1 to 4).map { look =>
      val cutoff = days.zipWithIndex
        .filter { case (_, i) => (i + 1) * 4 <= look.toLong * nd }
        .map(_._1).toSet
      val rows = ev.filter(e => cutoff.contains(e._1))
      val t = rows.filter(_._2); val c = rows.filterNot(_._2)
      def mom(g: Array[(String, Boolean, Long, Long, Double, Boolean, String)]) = {
        val n = g.length.toLong; val s0 = g.map(_._3).sum
        val q0 = g.map(e => e._3 * e._3).sum
        (n, s0, (n.toDouble * q0 - s0.toDouble * s0) / n / (n - 1))
      }
      val (n1, s1, v1) = mom(t); val (n0, s0, v0) = mom(c)
      val z = (s1.toDouble / n1 - s0.toDouble / n0) /
        math.sqrt(v1 / n1 + v0 / n0)
      val bound = 2.024 * math.sqrt(4.0 / look)
      (look.toLong, n1, n0, rnd(z, 4), rnd(bound, 4),
        if (math.abs(z) > bound) 1L else 0L)
    }
    val got = q("q_obrien_fleming").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getLong(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_qte_deciles matches the order-statistic fold") {
    val vals = graft.tables.Tables.events(spark, sf)
      .select((pmod(col("user_id"), lit(2)) === 0).as("tr"),
        round(col("value") * 100).cast("long").as("vc"), col("event_id"))
      .collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    def qAt(g: Array[(Boolean, Long, Long)], dec: Int): Long = {
      val s = g.sortBy(e => (e._2, e._3)).map(_._2)
      s(math.ceil(dec * s.length / 10.0).toInt - 1)
    }
    val t = vals.filter(_._1); val c = vals.filterNot(_._1)
    val want = (1 to 9).map { dec =>
      val qt = qAt(t, dec); val qc = qAt(c, dec)
      (dec.toLong, rnd(qt / 100.0, 2), rnd(qc / 100.0, 2),
        rnd((qt - qc) / 100.0, 2))
    }
    val got = q("q_qte_deciles").collect().map(r => (r.getLong(0),
      r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_shapley_2f matches the coalition fold") {
    val rows = ev.map(e => (e._5 > 100, e._6,
      if (e._7 == "purchase") 1L else 0L))
    def rate(p: ((Boolean, Boolean, Long)) => Boolean): Double = {
      val g = rows.filter(p)
      g.map(_._3).sum.toDouble / g.length
    }
    val v0 = rate(_ => true)
    val va = rate(_._1); val vb = rate(_._2)
    val vab = rate(r => r._1 && r._2)
    val want = (rnd(v0, 6), rnd(va, 6), rnd(vb, 6), rnd(vab, 6),
      rnd((va - v0 + vab - vb) / 2, 6),
      rnd((vb - v0 + vab - va) / 2, 6),
      rnd(vab - va - vb + v0, 6))
    val r = q("q_shapley_2f").collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      == want)
  }

  test("dtw_dist widens the band for length-mismatched series; empty is the sentinel") {
    graft.expr.Registry.ensure(spark)
    def dtw(a: String, b: String): Long =
      spark.sql(s"SELECT dtw_dist($a, $b)").head().getLong(0)
    // |n-m| = 25 > 10: a fixed w=10 band leaves (n,m) unreachable and
    // could only return the sentinel; the widened band must find the
    // true alignment. Constant zeros vs zeros: true DTW distance = 0.
    val a30 = "array(" + Seq.fill(30)("0L").mkString(",") + ")"
    val b5 = "array(0L, 0L, 0L, 0L, 0L)"
    assert(dtw(a30, b5) === 0L)
    // monotone ramp vs its 3-point subsample: alignment absorbs the
    // length gap; result must be finite and nonnegative, never -1
    val ramp = "array(" + (1 to 20).map(i => s"${i}L").mkString(",") + ")"
    val sub = "array(1L, 10L, 20L)"
    val dRamp = dtw(ramp, sub)
    assert(dRamp >= 0L)
    // the undefined case: empty input returns the -1 sentinel (mapped
    // to null by q_dtw_pairs before any per-step division)
    assert(dtw("CAST(array() AS ARRAY<BIGINT>)", b5) === -1L)
    assert(dtw(b5, "CAST(array() AS ARRAY<BIGINT>)") === -1L)
  }

  test("q_dtw_pairs matches the banded DP fold") {
    val byType = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, g) => g.map(_._3).sum / g.length }
      }
    def dtw(a: Array[Long], b: Array[Long]): Long = {
      val INF = Long.MaxValue / 4
      val w = math.max(10, math.abs(a.length - b.length))
      val prev = Array.fill[Long](b.length + 1)(INF)
      val cur = Array.fill[Long](b.length + 1)(INF)
      prev(0) = 0L
      for (i <- 1 to a.length) {
        java.util.Arrays.fill(cur, INF)
        val lo = math.max(1, i - w); val hi = math.min(b.length, i + w)
        for (j <- lo to hi) {
          val cost = math.abs(a(i - 1) - b(j - 1))
          val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
          cur(j) = if (best >= INF) INF else cost + best
        }
        System.arraycopy(cur, 0, prev, 0, b.length + 1)
      }
      if (prev(b.length) >= INF) -1L else prev(b.length)
    }
    val types = byType.keys.toArray.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val a = byType(types(i)); val b = byType(types(j))
      val dd = dtw(a, b)
      (types(i), types(j), a.length, b.length, dd,
        rnd(dd / 1e3 / (a.length + b.length).toDouble, 4))
    }).toSeq
    val got = q("q_dtw_pairs").collect().map(r => (r.getString(0),
      r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4),
      r.getDouble(5))).toSeq
    assert(got == want)
  }
}
