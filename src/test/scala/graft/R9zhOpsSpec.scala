package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-35 semantics (queries/StatsR9zh.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zhOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Distinct handoff edges (the wave-27 fixture fold). */
  private lazy val edges: Set[(Long, Long)] = {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2), r.getLong(3)))
    li.filter(_._1 % 10 == 0).groupBy(_._1).values.flatMap { g =>
      // total order (r11): (orderkey, linenumber) ties exist at
      // every SF — tiebreak by (suppkey, partkey) like the query
      val sorted = g.sortBy(e => (e._2, e._3, e._4)).map(_._3)
      sorted.zip(sorted.drop(1)).filter(p => p._1 != p._2)
    }.toSet
  }

  test("q_hits matches the two-hop fold") {
    val a1 = edges.groupBy(_._2).map { case (n, g) => (n, g.size.toLong) }
    val h1 = edges.groupBy(_._1).map { case (u, g) =>
      (u, g.toSeq.map(e => a1(e._2)).sum)
    }
    val a2 = edges.groupBy(_._2).map { case (v, g) =>
      (v, g.toSeq.flatMap(e => h1.get(e._1)).sum)
    }
    val want = a2.toArray.sortBy { case (v, a) => (-a, v) }.take(20)
      .map { case (v, a) => (v, a, h1.getOrElse(v, 0L)) }
    val got = q("q_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_closeness_sampled matches the BFS fold") {
    val adj = edges.groupBy(_._1)
      .map { case (u, g) => (u, g.map(_._2).toSet) }
    val seeds = edges.map(_._1).toArray.distinct.sorted.take(5)
    val want = seeds.map { s0 =>
      val d1 = adj.getOrElse(s0, Set.empty) - s0
      val d2 = d1.flatMap(n => adj.getOrElse(n, Set.empty)) -- d1 - s0
      val d3 = d2.flatMap(n =>
        adj.getOrElse(n, Set.empty)) -- d1 -- d2 - s0
      (s0, d1.size.toLong, d2.size.toLong, d3.size.toLong,
        rnd((6L * d1.size + 3L * d2.size + 2L * d3.size) / 6.0, 6))
    }
    val got = q("q_closeness_sampled").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_edge_jaccard matches the wedge fold") {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).toSet) }
    val und = adj.toArray.flatMap { case (u, ns) =>
      ns.filter(_ > u).map(v => (u, v))
    }
    val want = und.map { case (u, v) =>
      val c = (adj(u) intersect adj(v)).size.toLong
      val jac = c.toDouble / (adj(u).size + adj(v).size - c)
      (u, v, rnd(jac, 6))
    }.sortBy { case (u, v, j) => (-j, u, v) }.take(20)
    val got = q("q_edge_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_class_weights matches the weight fold") {
    val cnt = graft.tables.Tables.events(spark, sf)
      .select("event_type").collect().map(_.getString(0))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
    val n = cnt.values.sum; val k = cnt.size.toLong
    val want = cnt.toArray.sortBy(_._1).map { case (t, nc) =>
      (t, nc, rnd(n.toDouble / (k * nc), 6),
        rnd((1.0 - 0.999) / (1.0 - math.pow(0.999, nc.toDouble)), 6))
    }
    val got = q("q_class_weights").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_pad_waste matches the bucket fold") {
    val ns = graft.tables.Tables.documents(spark, sf)
      .select("text").collect()
      .map(r => r.getString(0).split(" ", -1).length.toLong)
    val caps = ns.map(n => ((n + 31) / 32) * 32)
    val maxlen = ns.max
    val wasteB = caps.zip(ns).map { case (c, n) => c - n }.sum
    val wasteU = ns.length * maxlen - ns.sum
    val r = q("q_pad_waste").collect()(0)
    assert(r.getLong(0) == ns.length.toLong)
    assert(r.getLong(1) == ns.sum)
    assert(r.getLong(2) == wasteB)
    assert(r.getLong(3) == wasteU)
    assert(r.getDouble(4) == rnd(1.0 - wasteB.toDouble / wasteU, 6))
  }

  test("q_truncation_loss matches the cap fold") {
    val rows = graft.tables.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ", -1).length.toLong))
    val want = rows.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (l, g) =>
        val tot = g.map(_._2).sum
        val lost = g.map(x => math.max(x._2 - 128, 0L)).sum
        (l, g.length.toLong, tot, lost,
          g.count(_._2 > 128).toLong, rnd(lost.toDouble / tot, 6))
      }
    val got = q("q_truncation_loss").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }
}
