package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-42 semantics (queries/StatsR9zo.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zoOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per user: (t0, tl, firstPurchase?, firstError?, nPurchases). */
  private lazy val users: Array[(Long, Long, Option[Long], Option[Long], Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toArray.map { case (u, g) =>
        val ts = g.map(_._3)
        val tp = g.filter(_._2 == "purchase").map(_._3)
        val te = g.filter(_._2 == "error").map(_._3)
        (ts.min, ts.max, tp.minOption, te.minOption,
          tp.length.toLong, u)
      }

  /** KM machinery over (t, isEvent) day rows. */
  private def km(rows: Array[(Long, Boolean)]): Array[(Long, Long, Long, Double, Double)] = {
    // returns per distinct t: (t, dd, y, s_prev, s_incl)
    val grid = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (t, g) => (t, g.count(_._2).toLong, g.length.toLong) }
    val n = rows.length.toLong
    var dropped = 0L; var cumLn = 0.0
    grid.map { case (t, dd, allT) =>
      val y = n - dropped
      val sPrev = math.exp(cumLn)
      cumLn += math.log(math.max(1.0 - dd.toDouble / y, 1e-300))
      dropped += allT
      (t, dd, y, sPrev, math.exp(cumLn))
    }
  }

  test("q_rmst matches the KM interval fold") {
    val rows = users.map { u =>
      u._3 match {
        case Some(tp) => ((tp - u._1) / 86400000000L, true)
        case None => ((u._2 - u._1) / 86400000000L, false)
      }
    }
    val steps = km(rows).filter(s => s._2 > 0 && s._1 <= 14)
    var prev = 0L
    val su = steps.map { case (t, _, _, sPrev, _) =>
      val v = rndL(sPrev * (t - prev) * 1e6); prev = t; v
    }.sum
    val tail = if (steps.isEmpty) 14000000L
    else {
      val (t, _, _, _, sIncl) = steps.last
      rndL(sIncl * (14 - t) * 1e6)
    }
    val r = q("q_rmst").collect()(0)
    assert(r.getLong(0) == users.length.toLong)
    assert(r.getLong(1) == users.count(_._3.isDefined).toLong)
    assert(r.getDouble(2) == rnd((su + tail) / 1e6, 6))
  }

  test("q_cuminc_competing matches the CIF fold") {
    val rows = users.map { u =>
      (u._3, u._4) match {
        case (Some(tp), te) if te.isEmpty || tp <= te.get =>
          ((tp - u._1) / 86400000000L, 1)
        case (_, Some(te)) => ((te - u._1) / 86400000000L, 2)
        case _ => ((u._2 - u._1) / 86400000000L, 0)
      }
    }
    val grid = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (t, g) => (t, g.count(_._2 == 1).toLong,
        g.count(_._2 == 2).toLong, g.length.toLong) }
    val n = rows.length.toLong
    var dropped = 0L; var cumLn = 0.0
    var c1 = 0L; var c2 = 0L
    grid.foreach { case (t, d1, d2, allT) =>
      val y = n - dropped
      val sPrev = math.exp(cumLn)
      if (t <= 14) {
        c1 += rndL(sPrev * d1 / y * 1e9)
        c2 += rndL(sPrev * d2 / y * 1e9)
      }
      cumLn += math.log(math.max(1.0 - (d1 + d2).toDouble / y, 1e-300))
      dropped += allT
    }
    val r = q("q_cuminc_competing").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == rows.count(_._2 == 1).toLong)
    assert(r.getLong(2) == rows.count(_._2 == 2).toLong)
    assert(r.getDouble(3) == rnd(c1 / 1e9, 6))
    assert(r.getDouble(4) == rnd(c2 / 1e9, 6))
  }

  test("q_mcf_recurrent matches the d/Y step fold") {
    val f = users.map(u => (u._6, u._1, (u._2 - u._1) / 86400000000L))
    val fOf = f.map(t => (t._1, (t._2, t._3))).toMap
    val offs = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(1) - fOf(r.getLong(0))._1) / 86400000000L)
      .groupBy(identity).map { case (s0, g) => (s0, g.length.toLong) }
    val want = Seq(7L, 14L, 21L).map { tau =>
      val steps = offs.filter(_._1 <= tau)
      val mu = steps.map { case (s0, ds) =>
        val ys = f.count(_._3 >= s0).toLong
        rndL(ds.toDouble / ys * 1e9)
      }.sum
      (tau, steps.values.sum, rnd(mu / 1e9, 6))
    }
    val got = q("q_mcf_recurrent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want)
  }

  test("q_backlog_aging matches the snapshot fold") {
    val maxShip = graft.tables.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(max(col("l_shipdate")).cast("date").cast("string").as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val open = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(o => o._2 <= "1997-01-01"
        && maxShip.get(o._1).exists(_ > "1997-01-01"))
      .map { o =>
        val ageDays = LocalDate.parse("1997-01-01").toEpochDay -
          LocalDate.parse(o._2).toEpochDay
        val b = if (ageDays <= 30) "000-030"
          else if (ageDays <= 90) "031-090"
          else if (ageDays <= 180) "091-180" else "180+"
        (b, rndL(o._3 * 100))
      }
    val tv = open.map(_._2).sum
    val want = open.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (b, g) =>
        (b, g.length.toLong, rnd(g.map(_._2).sum.toDouble / tv, 6))
      }
    val got = q("q_backlog_aging").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_perfect_order matches the per-order fold") {
    val ord = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    val per = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        col("l_shipdate").cast("date").cast("string"),
        col("l_returnflag")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(_._1).toArray.map { case (ok, g) =>
        val (od, prio) = ord(ok)
        val maxLag = g.map(l => LocalDate.parse(l._2).toEpochDay
          - LocalDate.parse(od).toEpochDay).max
        val ret = g.count(_._3 == "R")
        (prio, maxLag <= 30 && ret == 0)
      }
    val want = per.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (p, g) =>
        val np = g.count(_._2).toLong
        (p, g.length.toLong, np, rnd(np.toDouble / g.length, 6))
      }
    val got = q("q_perfect_order").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_incidence_rate_ratio matches the person-time fold") {
    val per = users.map(u =>
      (u._6 % 2, (u._2 - u._1) / 86400000000L, u._5))
    val g1 = per.filter(_._1 == 1L); val g0 = per.filter(_._1 == 0L)
    val e1 = g1.map(_._3).sum; val pt1 = g1.map(_._2).sum
    val e0 = g0.map(_._3).sum; val pt0 = g0.map(_._2).sum
    val irr = (e1.toDouble / pt1) / (e0.toDouble / pt0)
    val sel = math.sqrt(1.0 / e1 + 1.0 / e0)
    val r = q("q_incidence_rate_ratio").collect()(0)
    assert(r.getLong(0) == e1 && r.getLong(1) == pt1)
    assert(r.getLong(2) == e0 && r.getLong(3) == pt0)
    assert(r.getDouble(4) == rnd(irr, 6))
    assert(r.getDouble(5) == rnd(math.exp(math.log(irr) - 1.96 * sel), 6))
    assert(r.getDouble(6) == rnd(math.exp(math.log(irr) + 1.96 * sel), 6))
  }
}
