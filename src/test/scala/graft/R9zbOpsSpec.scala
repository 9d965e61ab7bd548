package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-28 semantics (queries/StatsR9zb.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zbOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (custkey, brand, orderdate-as-iso-date) */
  private lazy val li: Array[(Long, String, String)] = {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ordOf = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map { r =>
        val (c, od) = ordOf(r.getLong(0))
        (c, brandOf(r.getLong(1)), od)
      }
  }

  private lazy val train: Map[(Long, String), Long] =
    li.filter(_._3 < "1998-01-01").groupBy(t => (t._1, t._2))
      .map { case (k, v) => (k, v.length.toLong) }

  private lazy val test_ : Set[(Long, String)] =
    li.filter(_._3 >= "1998-01-01").map(t => (t._1, t._2)).toSet

  /** Per eval user: train brands ranked by (cnt desc, brand asc). */
  private lazy val rankedByUser: Map[Long, Array[String]] = {
    val byC = train.groupBy(_._1._1)
    byC.map { case (c, m) =>
      (c, m.toArray.map { case ((_, b), n) => (b, n) }
        .sortBy { case (b, n) => (-n, b) }.map(_._1))
    }
  }

  private lazy val evalUsers: Array[Long] =
    rankedByUser.keySet.intersect(test_.map(_._1)).toArray.sorted

  /** (value-centi, is-purchase, user) per event. */
  private lazy val ev: Array[(Long, Boolean, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select("value", "event_type", "user_id").collect()
      .map(r => (rndL(r.getDouble(0) * 100),
        r.getString(1) == "purchase", r.getLong(2)))

  test("q_mrr matches the first-hit reciprocal fold") {
    val rrs = evalUsers.map { c =>
      val ranks = rankedByUser(c)
      val hit = ranks.indexWhere(b => test_((c, b)))
      if (hit < 0) 0.0 else 1.0 / (hit + 1)
    }
    val nHit = rrs.count(_ > 0.0)
    val r = q("q_mrr").collect()(0)
    assert(r.getLong(0) == evalUsers.length.toLong)
    assert(r.getLong(1) == nHit.toLong)
    assert(r.getDouble(2) == rnd(rrs.sum / evalUsers.length, 6))
  }

  test("q_map_at_k matches the 2520-cleared AP fold") {
    val aps = evalUsers.map { c =>
      val top10 = rankedByUser(c).take(10)
      var hits = 0L; var num = 0L
      top10.zipWithIndex.foreach { case (b, i) =>
        if (test_((c, b))) { hits += 1; num += hits * (2520L / (i + 1)) }
      }
      val nRel = test_.count(_._1 == c)
      num.toDouble / (2520.0 * math.min(10, nRel))
    }
    val r = q("q_map_at_k").collect()(0)
    assert(r.getLong(0) == evalUsers.length.toLong)
    assert(r.getDouble(1) == rnd(aps.sum / evalUsers.length, 6))
  }

  test("q_ks_classifier matches the long-numerator sweep") {
    val p = ev.count(_._2).toLong
    val n = ev.length - p
    val grid = ev.groupBy(_._1).toArray.sortBy(_._1)
    var cp = 0L; var cn = 0L
    var best = -1L; var bestV = Long.MaxValue
    grid.foreach { case (v, g) =>
      cp += g.count(_._2); cn += g.count(!_._2)
      val d = math.abs(cp * n - cn * p)
      if (d > best || (d == best && v < bestV)) { best = d; bestV = v }
    }
    val r = q("q_ks_classifier").collect()(0)
    assert(r.getLong(0) == p && r.getLong(1) == n)
    assert(r.getDouble(2) == rnd(best.toDouble / (p * n), 6))
    assert(r.getDouble(3) == rnd(bestV / 100.0, 2))
  }

  test("q_confusion_costs matches the cost sweep fold") {
    val p = ev.count(_._2).toLong
    val n = ev.length - p
    val grid = ev.groupBy(_._1).toArray.sortBy(_._1)
    var posBelow = 0L; var negBelow = 0L
    var bestCost = Long.MaxValue; var bestV = 0L
    var bestFp = 0L; var bestFn = 0L
    grid.foreach { case (v, g) =>
      val fp = n - negBelow; val fn = posBelow
      val cost = fp + 5 * fn
      if (cost < bestCost || (cost == bestCost && v < bestV)) {
        bestCost = cost; bestV = v; bestFp = fp; bestFn = fn
      }
      posBelow += g.count(_._2); negBelow += g.count(!_._2)
    }
    val r = q("q_confusion_costs").collect()(0)
    assert(r.getDouble(0) == rnd(bestV / 100.0, 2))
    assert(r.getLong(1) == bestFp && r.getLong(2) == bestFn)
    assert(r.getLong(3) == bestCost)
    assert(r.getLong(4) == 5 * p)
  }

  test("q_brier_decomp matches the Murphy fold") {
    val evPm = graft.tables.Tables.events(spark, sf)
      .select("value", "event_type").collect()
      .map(r => (math.min(rndL(r.getDouble(0) * 5), 999L),
        if (r.getString(1) == "purchase") 1L else 0L))
    val bins = evPm.groupBy(_._1 / 100)
    val nTot = evPm.length.toLong
    val pTot = evPm.map(_._2).sum
    val ybar = pTot.toDouble / nTot
    val rel = bins.values.map { g =>
      val nk = g.length; val sp = g.map(_._1).sum; val sy = g.map(_._2).sum
      nk * math.pow(sp.toDouble / (nk * 1000.0) - sy.toDouble / nk, 2)
    }.sum / nTot
    val res = bins.values.map { g =>
      val nk = g.length; val sy = g.map(_._2).sum
      nk * math.pow(sy.toDouble / nk - ybar, 2)
    }.sum / nTot
    val unc = ybar * (1.0 - ybar)
    val r = q("q_brier_decomp").collect()(0)
    assert(r.getLong(0) == nTot)
    assert(math.abs(r.getDouble(1) - rel) < 1e-6)
    assert(math.abs(r.getDouble(2) - res) < 1e-6)
    assert(r.getDouble(3) == rnd(unc, 6))
    assert(r.getDouble(4) == rnd(rnd(rel, 6) - rnd(res, 6) + rnd(unc, 6), 6))
  }

  test("q_delta_method matches the clustered-moments fold") {
    val byU = ev.groupBy(_._3).map { case (_, g) =>
      (g.filter(_._2).map(_._1).sum, g.length.toLong)
    }.toArray
    val m = byU.length.toLong
    val sx = byU.map(_._1).sum.toDouble
    val sn = byU.map(_._2).sum.toDouble
    val sxx = byU.map(t => t._1.toDouble * t._1).sum
    val snn = byU.map(t => t._2.toDouble * t._2).sum
    val sxn = byU.map(t => t._1.toDouble * t._2).sum
    val r0 = sx / sn
    val vx = (sxx - sx * sx / m) / (m - 1)
    val vn = (snn - sn * sn / m) / (m - 1)
    val vxn = (sxn - sx * sn / m) / (m - 1)
    val nbar = sn / m
    val se = math.sqrt((vx - 2.0 * r0 * vxn + r0 * r0 * vn)
      / (m * nbar * nbar))
    val r = q("q_delta_method").collect()(0)
    assert(r.getLong(0) == m)
    assert(r.getDouble(1) == rnd(r0 / 100.0, 6))
    assert(r.getDouble(2) == rnd(se / 100.0, 6))
    assert(r.getDouble(3) == rnd((r0 - 1.96 * se) / 100.0, 6))
    assert(r.getDouble(4) == rnd((r0 + 1.96 * se) / 100.0, 6))
  }
}
