package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 wave-8 semantics (the nonparametric/diagnostic family in
  * queries/StatsR8f.scala), beyond what the DuckDB oracles prove: each
  * statistic is re-derived by a brute-force fold over the collected
  * sf0.001 events, plus a synthetic EVEN-Walsh-count fixture for
  * q_hodges_lehmann — the case the sf grids never exercise (n=30 days
  * gives 465 Walsh sums for every type, always odd), which is exactly
  * where the r8 middle-rank bug hid.
  */
class R8fOpsSpec extends AnyFunSuite with SparkFixture {

  private case class Ev(typ: String, day: String, vC: Long, vM: Long,
    user: Long)

  /** Spark round() semantics: HALF_UP on the BigDecimal of the double. */
  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private lazy val evs: Array[Ev] = graft.tables.Tables.events(spark, sf)
    .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
      round(col("value") * 100).cast("long").as("v_c"),
      floor(col("value") * 1e3).cast("long").as("v_m"),
      col("user_id"))
    .collect()
    .map(r => Ev(r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))

  /** Daily centi totals of one type, keyed by day. */
  private def dtot(t: String): Map[String, Long] =
    evs.filter(_.typ == t).groupBy(_.day)
      .map { case (d, g) => d -> g.map(_.vC).sum }

  /** Per-type day-ordered daily centi totals. */
  private lazy val dailyTot: Map[String, Array[Long]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1).map(_._2.map(_.vC).sum)
    }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_wilcoxon_signrank matches the brute-force signed-rank fold") {
    val a = dtot("click"); val b = dtot("view")
    val diffs = (a.keySet intersect b.keySet).toArray
      .map(d => a(d) - b(d)).filter(_ != 0L)
    val n = diffs.length.toLong
    // average tie rank in exact half-units: 2*min_rank + t - 1
    val ads = diffs.map(math.abs)
    def halfRank(ad: Long): Long = {
      val below = ads.count(_ < ad).toLong
      val t = ads.count(_ == ad).toLong
      2 * (below + 1) + t - 1
    }
    val wHalf = diffs.filter(_ > 0).map(d => halfRank(math.abs(d))).sum
    val tsum = ads.groupBy(identity).values
      .map { g => val t = g.length.toLong; t * t * t - t }.sum
    val z = (wHalf / 2.0 - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0 - tsum / 48.0)
    val r = q("q_wilcoxon_signrank").collect()(0)
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(1) - wHalf / 2.0) <= 1e-9)
    assert(math.abs(r.getDouble(2) - z) <= 1e-6)
  }

  test("q_ljung_box matches direct autocorrelation sums") {
    val got = q("q_ljung_box").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === dailyTot.keySet)
    for ((t, xs) <- dailyTot) {
      val n = xs.length.toLong
      val sx = xs.sum
      val u = xs.map(x => x * n - sx) // exact n-scaled centering
      val duu = u.map(v => v * v).sum
      val qStat = (1 to 7).map { k =>
        val num = (0 until (xs.length - k)).map(i => u(i) * u(i + k)).sum
        val rho = rnd(num.toDouble * 1e9 / duu) / 1e9
        rho * rho / (n - k)
      }.sum * n * (n + 2.0)
      val (gn, gq) = got(t)
      assert(gn === n)
      assert(math.abs(gq - qStat) <= 1e-4, s"type $t")
    }
  }

  test("q_durbin_watson matches the sum-of-squared-lag-diffs identity") {
    val got = q("q_durbin_watson").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ys) <- dailyTot) {
      val n = ys.length.toLong
      val ts = (1L to n).toArray
      val st = ts.sum; val sy = ys.sum
      val sty = ts.zip(ys).map { case (a, b) => a * b }.sum
      val stt = ts.map(a => a * a).sum
      val slope = (n.toDouble * sty - st.toDouble * sy) /
        (n.toDouble * stt - st.toDouble * st)
      val e = ts.zip(ys).map { case (tt, y) =>
        rnd(y - slope * tt - (sy - slope * st) / n)
      }
      val num = (1 until e.length)
        .map(i => (e(i) - e(i - 1)).toDouble * (e(i) - e(i - 1))).sum
      val den = e.map(v => v.toDouble * v).sum
      val (gn, gdw) = got(t)
      assert(gn === n)
      assert(math.abs(gdw - num / den) <= 1e-6, s"type $t")
    }
  }

  /** Brute-force Hodges-Lehmann over day-ordered milli means:
    * median of all i<=j Walsh averages (y_i+y_j)/2, middle-two rule. */
  private def hlBrute(ys: Array[Long]): (Long, Double) = {
    val walsh = (for {
      i <- ys.indices; j <- i until ys.length
    } yield ys(i) + ys(j)).sorted.toArray
    val nw = walsh.length
    val p1 = (nw + 1) / 2; val p2 = nw / 2 + 1 // integer division
    (nw.toLong, (walsh(p1 - 1) + walsh(p2 - 1)) / 4.0 / 1e3)
  }

  private def dailyMilliMeans: Map[String, Array[Long]] =
    evs.groupBy(_.typ).map { case (t, rows) =>
      t -> rows.groupBy(_.day).toArray.sortBy(_._1)
        .map { case (_, g) => g.map(_.vM).sum / g.length } // positive: div == /
    }

  test("q_hodges_lehmann matches the brute pairwise-mean median") {
    val got = q("q_hodges_lehmann").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val means = dailyMilliMeans
    assert(got.keySet === means.keySet)
    for ((t, ys) <- means) {
      val (nw, hl) = hlBrute(ys)
      assert(got(t)._1 === nw)
      assert(math.abs(got(t)._2 - hl) <= 1e-4, s"type $t")
    }
  }

  test("q_hodges_lehmann averages BOTH middle rows on an even Walsh count") {
    // n=4 days -> 10 Walsh sums (even): the middle-two rows differ, so
    // the r8 double-division bug (x.5 rank never matching) and the
    // odd-count half-value bug are both visible here.
    val dir = Files.createTempDirectory("graft_hl_even").toString
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, "t", 1.0, "2024-01-01 00:00:00"),
      (2L, 10L, "t", 2.0, "2024-01-02 00:00:00"),
      (3L, 10L, "t", 5.0, "2024-01-03 00:00:00"),
      (4L, 10L, "t", 11.0, "2024-01-04 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz"))
      .withColumn("props", lit("{}"))
      .drop("ts_s")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_hodges_lehmann")(spark, dir).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 10L)
    // Walsh sums of (1000,2000,5000,11000): sorted middle two are
    // 7000 and 10000 -> HL = (7000+10000)/4/1e3 = 4.25
    assert(got(0).getDouble(2) === 4.25)
    val (nw, hl) = hlBrute(Array(1000L, 2000L, 5000L, 11000L))
    assert(nw === 10L && math.abs(hl - 4.25) < 1e-12)
  }

  test("q_nelson_aalen matches the running sum(d/n) hazard") {
    val lt = evs.groupBy(_.user).map { case (_, g) =>
      val ds = g.map(_.day)
      (java.sql.Date.valueOf(ds.max).toLocalDate.toEpochDay
        - java.sql.Date.valueOf(ds.min).toLocalDate.toEpochDay)
    }
    val ended = lt.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val grid = ended.keys.toArray.sorted
    val total = ended.values.sum
    var seen = 0L; var cumU = 0L
    val exp = grid.map { l =>
      val atRisk = total - seen
      val hU = rnd(ended(l).toDouble * 1e9 / atRisk)
      cumU += hU; seen += ended(l)
      (l, ended(l), atRisk, cumU / 1e9)
    }
    val got = q("q_nelson_aalen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === exp.length)
    got.zip(exp).foreach { case ((gl, ge, ga, gc), (el, ee, ea, ec)) =>
      assert(gl === el && ge === ee && ga === ea)
      assert(math.abs(gc - ec) <= 1e-6)
    }
  }
}
