package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-17 key-level pins (queries/StatsR10p.scala): TOST,
  * Hedges' g, median CI, Sn/Qn — brute-force folds over sf0.001.
  */
class R10pOpsSpec extends AnyFunSuite with SparkFixture {

  private val z975 = 1.959963984540054

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Daily milli means per type, day-sorted (y values + day keys). */
  private lazy val dm: Map[String, Array[Long]] = {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    ev.groupBy(_._1).map { case (t, rows) =>
      t -> rows.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (_, g) => g.map(_._3).sum / g.length }
    }
  }

  private lazy val types: Array[String] = dm.keys.toArray.sorted

  private def moments(ys: Array[Long]): (Long, Double, Double) = {
    val n = ys.length.toLong
    val m = ys.sum; val ss = ys.map(y => y * y).sum
    ((n), (n.toDouble * ss - m.toDouble * m) / n / (n - 1),
      m.toDouble / n)
  }

  test("q_tost_equivalence matches the Welch fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (n1, v1, x1) = moments(dm(types(i)))
      val (n2, v2, x2) = moments(dm(types(j)))
      val se = math.sqrt(v1 / n1 + v2 / n2)
      val sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
        / (n1 + n2 - 2))
      val delta = 0.2 * sp; val diff = x1 - x2
      val tl = (diff + delta) / se; val tu = (delta - diff) / se
      (types(i), types(j), n1, n2, rnd(diff / 1e3, 4),
        rnd(delta / 1e3, 4), rnd(tl, 4), rnd(tu, 4),
        if (tl > 1.645 && tu > 1.645) 1L else 0L)
    }).toSeq
    val got = q("q_tost_equivalence").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getLong(8)))
      .toSeq
    assert(got == want)
  }

  test("q_hedges_g matches the corrected-d fold") {
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (n1, v1, x1) = moments(dm(types(i)))
      val (n2, v2, x2) = moments(dm(types(j)))
      val sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
        / (n1 + n2 - 2))
      val dd = (x1 - x2) / sp
      val gg = dd * (1.0 - 3.0 / ((n1 + n2) * 4 - 9))
      (types(i), types(j), n1, n2, rnd(dd, 6), rnd(gg, 6),
        rnd((n1 + n2).toDouble / (n1 * n2) + gg * gg / ((n1 + n2) * 2),
          6))
    }).toSeq
    val got = q("q_hedges_g").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want)
  }

  test("q_median_ci matches the order-statistic fold") {
    val want = types.map { t =>
      val ys = dm(t).sorted
      val n = ys.length
      val med = if (n % 2 == 1) ys((n + 1) / 2 - 1).toDouble
        else (ys(n / 2 - 1) + ys(n / 2)) / 2.0
      val lo = math.max(1L,
        math.floor((n - z975 * math.sqrt(n.toDouble)) / 2).toLong)
      val hi = math.min(n.toLong,
        math.ceil((n + z975 * math.sqrt(n.toDouble)) / 2 + 1).toLong)
      (t, n.toLong, rnd(med / 1e3, 4),
        rnd(ys(lo.toInt - 1) / 1e3, 4), rnd(ys(hi.toInt - 1) / 1e3, 4))
    }
    val got = q("q_median_ci").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_sn_qn_scale matches the pairwise-diff fold") {
    def medAt(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs((n + 1) / 2 - 1)
      else (xs(n / 2 - 1) + xs(n / 2)) / 2
    }
    val want = types.map { t =>
      val ys = dm(t)
      val n = ys.length
      val inner = (0 until n).map { i =>
        medAt((0 until n).filter(_ != i)
          .map(j => math.abs(ys(i) - ys(j)).toDouble).sorted.toArray)
      }.sorted.toArray
      val sn0 = medAt(inner)
      val ads = (for {
        i <- 0 until n; j <- (i + 1) until n
      } yield math.abs(ys(i) - ys(j))).sorted.toArray
      val h = n / 2 + 1
      val qn0 = ads(h * (h - 1) / 2 - 1).toDouble
      val (_, v, _) = moments(ys)
      (t, n.toLong, rnd(1.1926 * sn0 / 1e3, 4),
        rnd(2.2219 * qn0 / 1e3, 4), rnd(math.sqrt(v) / 1e3, 4))
    }
    val got = q("q_sn_qn_scale").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }
}
