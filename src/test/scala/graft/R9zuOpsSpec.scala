package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-48 semantics (queries/StatsR9zu.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zuOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (custkey, revenue_cents). */
  private lazy val cust: Array[(Long, Long)] = {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
      .groupBy(_._1).toArray
      .map { case (c, g) => (c, g.map(_._2).sum) }.filter(_._2 > 0)
  }

  test("q_ht_estimator matches the expansion fold") {
    val nn = cust.length.toLong; val tx = cust.map(_._2).sum
    val smp = cust.filter(_._1 % 17 == 0).map(_._2)
    val n = smp.length.toLong; val sx = smp.sum
    val sxx = smp.map(x => BigInt(x) * x).sum
    val s2 = (n * sxx.toDouble - sx.toDouble * sx) /
      (n.toDouble * (n - 1))
    val r = q("q_ht_estimator").collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == nn)
    assert(r.getDouble(2) == rnd(17.0 * sx / 100, 2))
    assert(r.getDouble(3) == rnd(tx / 100.0, 2))
    assert(r.getDouble(4) == rnd(math.abs(17.0 * sx - tx) / tx, 6))
    assert(r.getDouble(5) == rnd(nn * math.sqrt(
      (1.0 - n.toDouble / nn) * s2 / n) / 100, 2))
  }

  test("q_neyman_alloc matches the Nh*Sh fold") {
    val natOf = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val st = cust.groupBy(c => natOf(c._1)).toArray
      .flatMap { case (nk, g) =>
        val nh = g.length.toLong
        if (nh <= 1) None
        else {
          val sx = g.map(_._2).sum
          val sxx = g.map(x => BigInt(x._2) * x._2).sum
          val sh = math.sqrt((nh * sxx.toDouble - sx.toDouble * sx)
            / (nh.toDouble * (nh - 1)))
          Some((nk, nh, nh * sh))
        }
      }
    val sw = st.map(_._3).sum
    val want = st.sortBy(_._1).map { case (nk, nh, w) =>
      (nk.toLong, nh, rnd(w / sw, 6), rndL(w / sw * 1000))
    }
    val got = q("q_neyman_alloc").collect().map(r =>
      (r.getInt(0).toLong, r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_design_effect matches the ANOVA-ICC fold") {
    val per = graft.tables.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1) == "purchase"))
      .groupBy(_._1).toArray
      .map { case (_, g) => (g.length.toLong, g.count(_._2).toLong) }
    val k = per.length.toLong
    val nn = per.map(_._1).sum; val sy = per.map(_._2).sum
    val sm2 = per.map(p => p._1 * p._1).sum
    val ssbPart = per.map(p => p._2.toDouble * p._2 / p._1).sum
    val msb = (ssbPart - sy.toDouble * sy / nn) / (k - 1)
    val msw = (sy.toDouble - ssbPart) / (nn - k)
    val m0 = (nn.toDouble - sm2.toDouble / nn) / (k - 1)
    val icc = (msb - msw) / (msb + (m0 - 1) * msw)
    val r = q("q_design_effect").collect()(0)
    assert(r.getLong(0) == k && r.getLong(1) == nn)
    assert(r.getDouble(2) == rnd(m0, 6))
    assert(r.getDouble(3) == rnd(icc, 6))
    assert(r.getDouble(4) == rnd(1.0 + (m0 - 1) * icc, 6))
  }

  test("q_capture_recapture matches the modular fold") {
    val n1 = cust.count(_._1 % 17 == 0).toLong
    val n2 = cust.count(_._1 % 13 == 0).toLong
    val m = cust.count(c => c._1 % 17 == 0 && c._1 % 13 == 0).toLong
    val nTrue = cust.length.toLong
    val chapman = (n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1
    val r = q("q_capture_recapture").collect()(0)
    assert(r.getLong(0) == nTrue && r.getLong(1) == n1)
    assert(r.getLong(2) == n2 && r.getLong(3) == m)
    assert(r.getDouble(4) == rnd(n1.toDouble * n2 / m, 4))
    assert(r.getDouble(5) == rnd(chapman, 4))
    assert(r.getDouble(6) == rnd(math.abs(chapman - nTrue) / nTrue, 6))
  }

  test("q_raking matches the one-step IPF fold") {
    val base = graft.tables.Tables.events(spark, sf)
      .select(dayofweek(col("ts")), col("event_type"), col("event_id"))
      .collect()
      .map(r => (if (Set(1, 7)(r.getInt(0))) 1L else 0L,
        r.getString(1), r.getLong(2)))
    val full = base.groupBy(b => (b._1, b._2))
      .map { case (k, g) => (k, g.length.toLong) }
    val smp = base.filter(_._3 % 7 == 0).groupBy(b => (b._1, b._2))
      .map { case (k, g) => (k, g.length.toLong) }
    val cells = full.keySet.intersect(smp.keySet).toArray
      .map(k => (k, full(k), smp(k)))
    val ff = cells.map(_._2).sum; val ss = cells.map(_._3).sum
    val rowT = cells.groupBy(_._1._1).map { case (we, g) =>
      (we, (g.map(_._2).sum, g.map(_._3).sum)) }
    val w1 = cells.map { case ((we, t), f, s0) =>
      val (fr, sr) = rowT(we)
      ((we, t), s0, s0 * (fr * ss.toDouble / ff) / sr)
    }
    val colT = w1.groupBy(_._1._2).map { case (t, g) =>
      (t, g.map(_._3).sum) }
    val colF = cells.groupBy(_._1._2).map { case (t, g) =>
      (t, g.map(_._2).sum) }
    val want = w1.map { case ((we, t), s0, v1) =>
      (we, t, s0, rnd(v1 * (colF(t) * ss.toDouble / ff) / colT(t), 4))
    }.sortBy(x => (x._1, x._2))
    val got = q("q_raking").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_post_strat matches the weighted fold") {
    val base = graft.tables.Tables.events(spark, sf)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val w = base.groupBy(_._1).map { case (t, g) => (t, g.length.toLong) }
    val smp = base.filter(_._2 % 7 == 0).groupBy(_._1)
      .map { case (t, g) => (t, (g.length.toLong, g.map(_._3).sum)) }
    val wsum = smp.map { case (t, (sn, sv)) =>
      w(t).toDouble * (sv.toDouble / sn) }.sum
    val fsum = smp.keys.map(w(_)).sum
    val ssn = smp.values.map(_._1).sum; val ssv = smp.values.map(_._2).sum
    val r = q("q_post_strat").collect()(0)
    assert(r.getLong(0) == fsum)
    assert(r.getDouble(1) == rnd(ssv.toDouble / ssn / 1000, 6))
    assert(r.getDouble(2) == rnd(wsum / fsum / 1000, 6))
    assert(r.getDouble(3) ==
      rnd(base.map(_._3).sum.toDouble / base.length / 1000, 6))
  }
}
