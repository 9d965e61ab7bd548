package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-47 semantics (queries/StatsR9zt.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9ztOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Symmetrized handoff adjacency + degrees. */
  private lazy val (undEdges, degOf) = {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getLong(2), r.getLong(3)))
    val edges = li.filter(_._1 % 10 == 0).groupBy(_._1).values
      .flatMap { g =>
        // total order (r11): (orderkey, linenumber) ties exist at
        // every SF — tiebreak by (suppkey, partkey) like the query
        val sorted = g.sortBy(e => (e._2, e._3, e._4)).map(_._3)
        sorted.zip(sorted.drop(1)).filter(p => p._1 != p._2)
      }.toSet
    val adj = edges ++ edges.map(e => (e._2, e._1))
    val deg = adj.groupBy(_._1).map { case (u, g) =>
      (u, g.size.toLong) }
    (adj.filter(p => p._1 < p._2), deg)
  }

  test("q_benford_second matches the digit fold") {
    val digs = graft.tables.Tables.orders(spark, sf)
      .select("o_totalprice").collect()
      .map(r => rndL(r.getDouble(0) * 100))
      .filter(_ >= 10)
      .map(x => x.toString.charAt(1).asDigit.toLong)
    val cnt = digs.groupBy(identity)
      .map { case (k, g) => (k, g.length.toLong) }
    val n = digs.length.toLong
    val ef = (0 to 9).map { k =>
      (k.toLong, (1 to 9).map(j =>
        math.log10(1.0 + 1.0 / (10 * j + k))).sum)
    }.toMap
    val chi2 = cnt.map { case (k, o) =>
      math.pow(o - n * ef(k), 2) / (n * ef(k))
    }.sum
    val want = cnt.toArray.sortBy(_._1).map { case (k, o) =>
      (k, o, rnd(o.toDouble / n, 6), rnd(ef(k), 6), rnd(chi2, 6))
    }
    val got = q("q_benford_second").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_rich_club matches the deg>k fold") {
    val want = Seq(2L, 4L, 8L).flatMap { k =>
      val nodes = degOf.filter(_._2 > k).keySet
      if (nodes.size <= 1) None
      else {
        val ek = undEdges.count(e => nodes(e._1) && nodes(e._2)).toLong
        Some((k, nodes.size.toLong, ek,
          rnd(2.0 * ek / (nodes.size.toDouble * (nodes.size - 1)), 6)))
      }
    }
    val got = q("q_rich_club").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
  }

  test("q_pass_at_k matches the unrolled product fold") {
    val per = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).toArray.map { case (_, g) =>
        val first10 = g.sortBy(e => (e._2, e._3)).take(10)
        (first10.length.toLong,
          first10.count(_._4 == "purchase").toLong)
      }
    val want = Seq(1, 3, 5).map { k =>
      val ps = per.map { case (n, c) =>
        val fail = if (n - c >= k)
          (0 until k).map(i => (n - c - i).toDouble / (n - i)).product
        else 0.0
        rndL((1.0 - fail) * 1e9)
      }
      (k, per.length.toLong, rnd(ps.sum / per.length.toDouble / 1e9, 6))
    }
    val got = q("q_pass_at_k").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want)
  }

  test("q_bradley_terry matches the one-step MM fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(e => (e._2, e._1))
      .map { case ((dd, t), g) => (dd, t, g.map(_._3).sum / g.length) }
      .toArray
    val byDay = daily.groupBy(_._1)
    val st = daily.groupBy(_._2).map { case (t, g) =>
      var w = 0L; var c = 0L
      g.foreach { case (dd, _, y) =>
        byDay(dd).filter(o => o._2 != t && o._3 != y).foreach { o =>
          c += 1; if (y > o._3) w += 1
        }
      }
      (t, w, c, w.toDouble / (c / 2.0))
    }.toArray
    val sp = st.map(_._4).sum
    val want = st.sortBy(_._1).map { case (t, w, c, p) =>
      (t, w, c, rnd(p / sp, 6))
    }
    val got = q("q_bradley_terry").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_forecast_combo matches the 3-model fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, rows) => rows.map(_._3).sum / rows.length })
      }
    val want = daily.toArray.sortBy(_._1).map { case (t, ys) =>
      val rows = (7 until ys.length).map { i0 =>
        val i = i0 + 1L
        val p1 = ys(i0 - 1); val p7 = ys(i0 - 7); val y1 = ys(0)
        val drift = p1 + (p1 - y1).toDouble / (i - 2)
        val combo = (p1 + p7 + drift) / 3.0
        (math.abs(ys(i0) - p1), math.abs(ys(i0) - p7),
          rndL(math.abs(ys(i0) - drift) * 1e6),
          rndL(math.abs(ys(i0) - combo) * 1e6))
      }
      val n = rows.length.toLong
      (t, n, rnd(rows.map(_._1).sum.toDouble / n / 1000, 6),
        rnd(rows.map(_._2).sum.toDouble / n / 1000, 6),
        rnd(rows.map(_._3).sum.toDouble / n / 1e6 / 1000, 6),
        rnd(rows.map(_._4).sum.toDouble / n / 1e6 / 1000, 6))
    }
    val got = q("q_forecast_combo").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_degree_gini matches the sorted-degree fold") {
    val degs = degOf.toArray.sortBy(t => (t._2, t._1)).map(_._2)
    val n = degs.length.toLong
    val sd = degs.sum
    val sid = degs.zipWithIndex.map { case (d0, i0) =>
      (i0 + 1L) * d0 }.sum
    val r = q("q_degree_gini").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(sd.toDouble / n, 6))
    assert(r.getDouble(2) ==
      rnd(2.0 * sid / (n.toDouble * sd) - (n + 1).toDouble / n, 6))
  }
}
