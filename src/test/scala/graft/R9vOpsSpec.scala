package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-22 semantics (queries/StatsR9v.scala): folds over the
  * collected sf0.001 events.
  */
class R9vOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).map { case (t, g) =>
        t -> g.groupBy(_._1).map { case (d0, gg) =>
          (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
        }.toArray.sortBy(_._1)
      }

  test("q_quantile_normalize matches the rank-reference fold") {
    val k = dmean.size
    val ranked = dmean.map { case (t, ds) =>
      t -> ds.sortBy(x => (x._2, x._1)).zipWithIndex
        .map { case ((d0, y), i) => (i + 1, d0, y) }
    }
    val refs = ranked.values.flatten.groupBy(_._1)
      .filter(_._2.size == k)
      .map { case (r, g) => r -> g.map(_._3).sum }
    val got = q("q_quantile_normalize").collect()
      .map(r => ((r.getString(0), r.get(1).toString),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    var checked = 0
    for ((t, rs) <- ranked; (r, d0, y) <- rs if refs.contains(r)) {
      val (gr, graw, gq) = got((t, d0))
      assert(gr === r.toLong)
      assert(math.abs(graw - rnd(y / 1e3 * 1e4) / 1e4) <= 1e-9)
      assert(math.abs(gq - rnd(refs(r).toDouble / (k * 1000.0) * 1e4)
        / 1e4) <= 1e-9)
      checked += 1
    }
    assert(checked === got.size)
  }

  test("q_cliff_delta matches the dominance fold") {
    val types = dmean.keys.toArray.sorted
    val got = q("q_cliff_delta").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    for (i <- types.indices; j <- i + 1 until types.length) {
      val xs = dmean(types(i)).map(_._2)
      val ys = dmean(types(j)).map(_._2)
      var dom = 0L
      for (x <- xs; y <- ys) {
        if (x > y) dom += 1 else if (x < y) dom -= 1
      }
      val np = xs.length.toLong * ys.length
      val (gn, gd) = got((types(i), types(j)))
      assert(gn === np)
      assert(math.abs(gd - rnd(dom.toDouble / np * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_process_capability matches the cleared fold") {
    val got = q("q_process_capability").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length.toLong
      val sy = ys.sum; val syy = ys.map(y => y * y).sum
      val clr = n * syy - sy * sy
      if (n > 1 && clr > 0) {
        val sd = math.sqrt(clr.toDouble / (n * (n - 1)))
        val mu = sy.toDouble / n
        val cp = 400000.0 / (6.0 * sd)
        val cpk = math.min(400000.0 - mu, mu) / (3.0 * sd)
        val (gn, gcp, gcpk) = got(t)
        assert(gn === n)
        assert(math.abs(gcp - rnd(cp * 1e4) / 1e4) <= 1e-9)
        assert(math.abs(gcpk - rnd(cpk * 1e4) / 1e4) <= 1e-9)
      }
    }
  }

  test("q_mmd_cauchy matches the snapped rational-kernel fold") {
    val types = dmean.keys.toArray.sorted
    def kern(a: Long, b: Long): Long = {
      val d = (a - b).toDouble
      rnd(1e19 / (1e10 + d * d))
    }
    val got = q("q_mmd_cauchy").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    def within(t: String): (Long, Long) = {
      val ys = dmean(t).map(_._2)
      ((for (a <- ys; b <- ys) yield kern(a, b)).sum,
        ys.length.toLong * ys.length)
    }
    for (i <- types.indices; j <- i + 1 until types.length) {
      val (sw1, nn1) = within(types(i))
      val (sw2, nn2) = within(types(j))
      val xs = dmean(types(i)).map(_._2)
      val ys = dmean(types(j)).map(_._2)
      val sx = (for (a <- xs; b <- ys) yield kern(a, b)).sum
      val nc = xs.length.toLong * ys.length
      val mmd = (sw1.toDouble / nn1 + sw2.toDouble / nn2
        - 2.0 * sx / nc) / 1e9
      assert(math.abs(got((types(i), types(j))) - rnd(mmd * 1e6) / 1e6)
        <= 1e-9)
    }
  }

  test("q_energy_distance matches the exact pair fold") {
    val types = dmean.keys.toArray.sorted
    val got = q("q_energy_distance").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    for (i <- types.indices; j <- i + 1 until types.length) {
      val xs = dmean(types(i)).map(_._2)
      val ys = dmean(types(j)).map(_._2)
      val sw1 = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val sw2 = (for (a <- ys; b <- ys) yield math.abs(a - b)).sum
      val sx = (for (a <- xs; b <- ys) yield math.abs(a - b)).sum
      val e = (2.0 * sx / (xs.length.toLong * ys.length)
        - sw1.toDouble / (xs.length.toLong * xs.length)
        - sw2.toDouble / (ys.length.toLong * ys.length)) / 1e3
      assert(math.abs(got((types(i), types(j))) - rnd(e * 1e4) / 1e4)
        <= 1e-9)
    }
  }

  test("q_binseg2 matches the two-level segmentation fold") {
    val got = q("q_binseg2").collect()
      .map(r => (r.getString(0),
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length.toLong
      val p = ys.scanLeft(0L)(_ + _).tail // prefix sums, 1-based
      def bestSplit(lo: Int, hi: Int): Option[Long] = {
        // segment [lo, hi] 1-based; split t in [lo, hi-1]
        if (hi - lo < 1) return None
        val pLo = if (lo == 1) 0L else p(lo - 2)
        val pHi = p(hi - 1)
        val m = (hi - lo + 1).toLong
        var best = Long.MinValue; var bi = -1L
        for (i <- lo until hi) {
          val tt = (i - lo + 1).toLong
          val dd = math.abs((p(i - 1) - pLo) * m - (pHi - pLo) * tt)
          if (dd > best) { best = dd; bi = i.toLong }
        }
        Some(bi)
      }
      val t1 = bestSplit(1, n.toInt).get
      val tl = bestSplit(1, t1.toInt).getOrElse(-1L)
      val tr0 = bestSplit(t1.toInt + 1, n.toInt)
      val (gl, gm, gr) = got(t)
      assert(gm === t1)
      assert(gl === tl)
      assert(gr === tr0.getOrElse(-1L))
    }
  }
}
