package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-20 semantics (queries/StatsR9t.scala): forecast-eval
  * folds over the collected sf0.001 events.
  */
class R9tOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val dmean: Map[String, Array[Long]] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).map { case (t, g) =>
        t -> g.groupBy(_._1).map { case (d0, gg) =>
          (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
        }.toArray.sortBy(_._1).map(_._2)
      }

  test("q_crps_naive matches the ensemble fold") {
    val got = q("q_crps_naive").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ys) <- dmean) {
      var su = 0L; var n = 0L
      for (i <- 7 until ys.length) {
        val w = ys.slice(i - 7, i)
        val s1 = w.map(x => math.abs(x - ys(i))).sum
        val s2 = (for (a <- w; b <- w) yield math.abs(a - b)).sum
        su += 14 * s1 - s2; n += 1
      }
      if (n > 0) {
        val (gn, gc) = got(t)
        assert(gn === n)
        assert(math.abs(gc - rnd(su.toDouble / (n * 98.0 * 1000) * 1e6)
          / 1e6) <= 1e-9)
      }
    }
  }

  test("q_pinball_loss matches the order-statistic fold") {
    val got = q("q_pinball_loss").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ys) <- dmean) {
      var s2 = 0L; var s10 = 0L; var n = 0L
      for (i <- 7 until ys.length) {
        val w = ys.slice(i - 7, i).sorted
        val f50 = w(3); val f90 = w(6)
        s2 += math.abs(ys(i) - f50)
        s10 += math.max((ys(i) - f90) * 9, f90 - ys(i))
        n += 1
      }
      if (n > 0) {
        val (gn, g50, g90) = got(t)
        assert(gn === n)
        assert(math.abs(g50 - rnd(s2.toDouble / (n * 2.0 * 1000) * 1e6)
          / 1e6) <= 1e-9)
        assert(math.abs(g90 - rnd(s10.toDouble / (n * 10.0 * 1000)
          * 1e6) / 1e6) <= 1e-9)
      }
    }
  }

  test("q_diebold_mariano matches the cleared fold") {
    val got = q("q_diebold_mariano").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ys) <- dmean) {
      val ds = (7 until ys.length).map(i =>
        math.abs(ys(i) - ys(i - 1)) - math.abs(ys(i) - ys(i - 7)))
      val n = ds.length.toLong
      val sd = ds.sum
      val sdd = ds.map(x => x * x).sum
      val clr = n * sdd - sd * sd
      if (n > 1 && clr > 0) {
        val dm = sd.toDouble * math.sqrt((n - 1).toDouble) /
          math.sqrt(clr.toDouble)
        val (gn, gd) = got(t)
        assert(gn === n)
        assert(math.abs(gd - rnd(dm * 1e4) / 1e4) <= 1e-9)
      }
    }
  }

  test("q_theil_u matches the squared-error fold") {
    val got = q("q_theil_u").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ys) <- dmean) {
      val rows = (7 until ys.length).map(i =>
        ((ys(i) - ys(i - 7)).toDouble, (ys(i) - ys(i - 1)).toDouble))
      val sfv = rows.map(r0 => (r0._1 * r0._1).toLong).sum
      val snv = rows.map(r0 => (r0._2 * r0._2).toLong).sum
      if (snv > 0) {
        val (gn, gu) = got(t)
        assert(gn === rows.length.toLong)
        assert(math.abs(gu - rnd(math.sqrt(sfv.toDouble / snv) * 1e4)
          / 1e4) <= 1e-9)
      }
    }
  }

  test("q_tracking_signal matches the cleared fold") {
    val got = q("q_tracking_signal").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ys) <- dmean) {
      val es = (7 until ys.length).map(i =>
        ys(i) * 7 - ys.slice(i - 7, i).sum)
      val n = es.length.toLong
      val se = es.sum; val sae = es.map(math.abs).sum
      if (sae > 0 && n > 0) {
        val (gn, gt) = got(t)
        assert(gn === n)
        assert(math.abs(gt - rnd(n.toDouble * se / sae * 1e4) / 1e4)
          <= 1e-9)
      }
    }
  }

  test("q_mincer_zarnowitz matches the cleared OLS fold") {
    val got = q("q_mincer_zarnowitz").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, ys) <- dmean) {
      val pairs = (1 until ys.length).map(i => (ys(i - 1), ys(i)))
      val n = pairs.length.toLong
      if (n > 2) {
        val sfv = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sfy = pairs.map(p => p._1 * p._2).sum
        val sff = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val cfy = n * sfy - sfv * sy
        val cff = n * sff - sfv * sfv
        val cyy = n * syy - sy * sy
        if (cff > 0 && cyy > 0) {
          val beta = cfy.toDouble / cff
          val alpha = (sy.toDouble - beta * sfv) / n / 1000
          val r2 = cfy.toDouble * cfy / (cff.toDouble * cyy)
          val (gn, ga, gb, gr) = got(t)
          assert(gn === n)
          assert(math.abs(ga - rnd(alpha * 1e4) / 1e4) <= 1e-9)
          assert(math.abs(gb - rnd(beta * 1e4) / 1e4) <= 1e-9)
          assert(math.abs(gr - rnd(r2 * 1e6) / 1e6) <= 1e-9)
        }
      }
    }
  }
}
