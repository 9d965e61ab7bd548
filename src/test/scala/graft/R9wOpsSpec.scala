package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-23 semantics (queries/StatsR9w.scala): signal-complexity
  * folds over the collected sf0.001 events.
  */
class R9wOpsSpec extends AnyFunSuite with SparkFixture {

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

  test("q_haar_energy matches the pair fold") {
    val got = q("q_haar_energy").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ys) <- dmean) {
      val pairs = ys.grouped(2).filter(_.length == 2).toArray
      if (pairs.nonEmpty) {
        val ea = pairs.map(p => { val a = p(0) + p(1); a * a }).sum
        val ed = pairs.map(p => { val d = p(0) - p(1); d * d }).sum
        if (ea + ed > 0) {
          val (gn, gs) = got(t)
          assert(gn === pairs.length.toLong)
          assert(math.abs(gs - rnd(ed.toDouble / (ea + ed) * 1e6) / 1e6)
            <= 1e-9)
        }
      }
    }
  }

  test("q_variogram matches the lag fold") {
    val got = q("q_variogram").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    for ((t, ys) <- dmean; h <- Seq(1, 2, 3, 7)) {
      val diffs = (h until ys.length).map(i => ys(i) - ys(i - h))
      if (diffs.nonEmpty) {
        val ss = diffs.map(d => d * d).sum
        val (gn, gg) = got((t, h.toLong))
        assert(gn === diffs.length.toLong)
        assert(math.abs(gg - rnd(ss.toDouble / (diffs.length * 2.0 * 1e6)
          * 1e6) / 1e6) <= 1e-9)
      }
    }
  }

  test("q_permutation_entropy matches the ordinal fold") {
    val got = q("q_permutation_entropy").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ys) <- dmean if ys.length >= 3) {
      val pats = (0 until ys.length - 2).map { i =>
        val (a, b, c) = (ys(i), ys(i + 1), ys(i + 2))
        val r1 = 1 + (if (b < a) 1 else 0) + (if (c < a) 1 else 0)
        val r2 = 1 + (if (a <= b) 1 else 0) + (if (c < b) 1 else 0)
        val r3 = 1 + (if (a <= c) 1 else 0) + (if (b <= c) 1 else 0)
        r1 * 100 + r2 * 10 + r3
      }
      val n = pats.length.toLong
      val hU = pats.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / n
        rnd(p * math.log(p) * -1e9)
      }.sum
      val (gn, gp, gh) = got(t)
      assert(gn === n)
      assert(gp === pats.distinct.length.toLong)
      assert(math.abs(gh - rnd(hU / 1e9 * 1e6) / 1e6) <= 1e-9)
    }
  }

  test("q_sample_entropy matches the template fold") {
    val r0 = 20000L
    val got = q("q_sample_entropy").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ys) <- dmean if ys.length >= 4) {
      val n = ys.length
      var b = 0L; var a = 0L
      for (i <- 0 until n - 1; j <- i + 1 until n - 1)
        if (math.abs(ys(i) - ys(j)) <= r0
          && math.abs(ys(i + 1) - ys(j + 1)) <= r0) b += 1
      for (i <- 0 until n - 2; j <- i + 1 until n - 2)
        if (math.abs(ys(i) - ys(j)) <= r0
          && math.abs(ys(i + 1) - ys(j + 1)) <= r0
          && math.abs(ys(i + 2) - ys(j + 2)) <= r0) a += 1
      if (a > 0 && b > 0) {
        val (gb, ga, gs) = got(t)
        assert(gb === b)
        assert(ga === a)
        assert(math.abs(gs - rnd(-math.log(a.toDouble / b) * 1e4) / 1e4)
          <= 1e-9)
      }
    }
  }

  test("q_visibility_graph matches the clearance fold") {
    val got = q("q_visibility_graph").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ys) <- dmean) {
      val n = ys.length
      var edges = 0L
      for (i <- 0 until n; j <- i + 1 until math.min(n, i + 21)) {
        val visible = (i + 1 until j).forall { k =>
          (ys(k) - ys(i)).toDouble * (j - i) <
            (ys(j) - ys(i)).toDouble * (k - i)
        }
        if (visible) edges += 1
      }
      val (gn, ge, gd) = got(t)
      assert(gn === n.toLong)
      assert(ge === edges)
      assert(math.abs(gd - rnd(edges * 2.0 / n * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_poincare matches the cleared fold") {
    val got = q("q_poincare").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ys) <- dmean if ys.length > 2) {
      val nAll = ys.length.toLong
      val sy = ys.sum; val syy = ys.map(y => y * y).sum
      val ds = ys.sliding(2).map(p => p(1) - p(0)).toArray
      val nd = ds.length.toLong
      val sd = ds.sum; val sdd = ds.map(d => d * d).sum
      val vard = (nd * sdd - sd * sd).toDouble / (nd * (nd - 1))
      val vary = (nAll * syy - sy * sy).toDouble / (nAll * (nAll - 1))
      if (vard > 0 && 4.0 * vary > vard) {
        val sd1 = math.sqrt(vard / 2) / 1e3
        val sd2 = math.sqrt((4.0 * vary - vard) / 2) / 1e3
        val (gn, g1, g2) = got(t)
        assert(gn === nd)
        assert(math.abs(g1 - rnd(sd1 * 1e4) / 1e4) <= 1e-9)
        assert(math.abs(g2 - rnd(sd2 * 1e4) / 1e4) <= 1e-9)
      }
    }
  }
}
