package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-50 semantics (queries/StatsR9zw.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zwOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val orders: Array[(Long, Long, String, Long)] =
    graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        rndL(r.getDouble(3) * 100)))

  test("q_clv_simple matches the run-rate fold") {
    val segOf = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val perCust = orders.groupBy(_._2).toArray.map { case (c, g) =>
      val life = math.max(
        LocalDate.parse(g.map(_._3).max).toEpochDay
          - LocalDate.parse(g.map(_._3).min).toEpochDay, 1L)
      (segOf(c), g.map(_._4).sum, g.length.toLong, life)
    }
    val want = perCust.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (seg, g) =>
        val nc = g.length.toLong
        val srev = g.map(_._2).sum; val sord = g.map(_._3).sum
        val slife = g.map(_._4).sum
        (seg, nc, rnd(srev.toDouble / sord / 100, 2),
          rnd(sord.toDouble / nc, 6), rnd(slife.toDouble / nc, 6),
          rnd(365.0 * (srev.toDouble / nc) / (slife.toDouble / nc)
            / 100, 2))
      }
    val got = q("q_clv_simple").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_catalog_profile matches the brand fold") {
    val parts = graft.tables.Tables.part(spark, sf)
      .select("p_brand", "p_type", "p_size", "p_retailprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        rndL(r.getDouble(3) * 100)))
    val want = parts.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (b, g) =>
        (b, g.length.toLong, g.map(_._2).distinct.length.toLong,
          g.map(_._3).distinct.length.toLong,
          rnd(g.map(_._4).sum.toDouble / g.length / 100, 2))
      }
    val got = q("q_catalog_profile").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_lead_lag_matrix matches the snapped argmax fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, rows) => rows.map(_._3).sum / rows.length })
      }
    val ts = daily.keys.toArray.sorted
    val want = (for {
      t1 <- ts; t2 <- ts if t1 != t2
    } yield {
      val a = daily(t1); val b = daily(t2)
      val cands = (-3 to 3).flatMap { lag =>
        val pairs = a.indices.flatMap { i0 =>
          val j0 = i0 + lag
          if (j0 >= 0 && j0 < b.length) Some((a(i0), b(j0))) else None
        }
        val n = pairs.length.toLong
        if (n <= 2) None
        else {
          val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
          val sab = pairs.map(p => p._1 * p._2).sum
          val saa = pairs.map(p => p._1 * p._1).sum
          val sbb = pairs.map(p => p._2 * p._2).sum
          if (n * saa <= sa * sa || n * sbb <= sb * sb) None
          else Some((lag.toLong,
            rndL((n * sab - sa * sb).toDouble
              / math.sqrt((n * saa - sa * sa).toDouble
                * (n * sbb - sb * sb)) * 1e6)))
        }
      }
      val best = cands.minBy(c => (-c._2, c._1))
      (t1, t2, best._1, rnd(best._2 / 1e6, 6))
    }).sortBy(x => (x._1, x._2))
    val got = q("q_lead_lag_matrix").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_suppliers_per_order matches the distribution fold") {
    val per = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, g) =>
        g.map(_._2).distinct.length.toLong }
      .toArray
    val n = per.length.toLong; val sk = per.sum
    val want = per.groupBy(identity).toArray.sortBy(_._1)
      .map { case (k, g) =>
        (k, g.length.toLong, rnd(g.length.toDouble / n, 6),
          rnd(sk.toDouble / n, 6))
      }
    val got = q("q_suppliers_per_order").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_returns_by_lag matches the bucket fold") {
    val odOf = orders.map(o => (o._1, o._3)).toMap
    val rows = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        col("l_shipdate").cast("date").cast("string"),
        col("l_returnflag")).collect()
      .map { r =>
        val lag = LocalDate.parse(r.getString(1)).toEpochDay -
          LocalDate.parse(odOf(r.getLong(0))).toEpochDay
        val b = if (lag <= 15) "00-15" else if (lag <= 30) "16-30"
          else "31+"
        (b, r.getString(2) == "R")
      }
    val want = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (b, g) =>
        val nr = g.count(_._2).toLong
        (b, g.length.toLong, nr, rnd(nr.toDouble / g.length, 6))
      }
    val got = q("q_returns_by_lag").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_reorder_acceleration matches the pooled OLS fold") {
    val gaps = orders.groupBy(_._2).values.flatMap { g =>
      val sorted = g.sortBy(o => (o._3, o._1))
      sorted.zip(sorted.drop(1)).zipWithIndex.map { case ((a, b), j0) =>
        (LocalDate.parse(b._3).toEpochDay
          - LocalDate.parse(a._3).toEpochDay, (j0 + 1).toLong)
      }
    }.toArray
    val n = gaps.length.toLong
    val sx = gaps.map(_._2).sum; val sy = gaps.map(_._1).sum
    val sxy = gaps.map(p => p._1 * p._2).sum
    val sxx = gaps.map(p => p._2 * p._2).sum
    val r = q("q_reorder_acceleration").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(sy.toDouble / n, 6))
    assert(r.getDouble(2) ==
      rnd((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx), 6))
  }
}
