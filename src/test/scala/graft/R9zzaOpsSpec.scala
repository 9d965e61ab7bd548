package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-54 semantics (queries/StatsR9zza.scala): brute-force
  * folds over the collected sf0.001 tables.
  */
class R9zzaOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val edges: Set[(Long, Long)] = {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getLong(2), r.getLong(3)))
    li.filter(_._1 % 10 == 0).groupBy(_._1).values.flatMap { g =>
      // total order (r11): (orderkey, linenumber) ties exist at every
      // SF — tiebreak by (suppkey, partkey) like the query
      val sorted = g.sortBy(e => (e._2, e._3, e._4)).map(_._3)
      sorted.zip(sorted.drop(1)).filter(p => p._1 != p._2)
    }.toSet
  }

  private lazy val adj: Set[(Long, Long)] =
    edges ++ edges.map(e => (e._2, e._1))

  test("q_homophily matches the configuration-null fold") {
    val natOf = graft.tables.Tables.supplier(spark, sf)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val ee = edges.size.toLong
    val same = edges.count(e => natOf(e._1) == natOf(e._2)).toLong
    val outs = edges.toSeq.groupBy(e => natOf(e._1))
      .map { case (n, g) => (n, g.size.toLong) }
    val ins = edges.toSeq.groupBy(e => natOf(e._2))
      .map { case (n, g) => (n, g.size.toLong) }
    val oi = outs.map { case (n, o) => o * ins.getOrElse(n, 0L) }.sum
    val obs = same.toDouble / ee
    val exp0 = oi.toDouble / (ee * ee)
    val r = q("q_homophily").collect()(0)
    assert(r.getLong(0) == ee && r.getLong(1) == same)
    assert(r.getDouble(2) == rnd(obs, 6))
    assert(r.getDouble(3) == rnd(exp0, 6))
    assert(r.getDouble(4) == rnd((obs - exp0) / (1.0 - exp0), 6))
  }

  test("q_triad_census matches the two-hop fold") {
    val eSeq = edges.toSeq
    val byV = eSeq.groupBy(_._1)
    val two = eSeq.flatMap { case (u, v) =>
      byV.getOrElse(v, Nil).map { case (_, w) => (u, v, w) }
    }.filter(t => t._1 != t._3)
    val ffl = two.count(t => edges((t._1, t._3))).toLong
    val cyc = two.count(t => edges((t._3, t._1))).toLong / 3
    val r = q("q_triad_census").collect()(0)
    assert(r.getLong(0) == ffl && r.getLong(1) == cyc)
    assert(r.getDouble(2) ==
      rnd(ffl.toDouble / math.max(ffl + 3 * cyc, 1L), 6))
  }

  /** Connected components via BFS over an undirected adjacency. */
  private def ccSizes(nodes: Set[Long],
      a: Set[(Long, Long)]): Seq[Int] = {
    val nb = a.groupBy(_._1).map { case (u, g) => (u, g.map(_._2)) }
    var seen = Set.empty[Long]
    nodes.toSeq.sorted.flatMap { s0 =>
      if (seen(s0)) None
      else {
        var frontier = Set(s0); var comp = Set(s0)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(n =>
            nb.getOrElse(n, Set.empty)).diff(comp)
          comp ++= frontier
        }
        seen ++= comp
        Some(comp.size)
      }
    }
  }

  test("q_percolation matches the BFS fold") {
    val nodes = adj.map(_._1)
    val hubs = adj.groupBy(_._1).map { case (u, g) =>
      (u, g.size.toLong) }.toArray
      .sortBy { case (u, d0) => (-d0, u) }.take(3).map(_._1).toSet
    val before = ccSizes(nodes, adj)
    val nodesA = nodes.diff(hubs)
    val adjA = adj.filter(e => !hubs(e._1) && !hubs(e._2))
    val after = ccSizes(nodesA, adjA)
    val r = q("q_percolation").collect()(0)
    assert(r.getLong(0) == nodes.size.toLong)
    assert(r.getLong(1) == before.size.toLong)
    assert(r.getLong(2) == before.max.toLong)
    assert(r.getLong(3) == after.size.toLong)
    assert(r.getLong(4) == after.max.toLong)
  }

  test("q_hub_dominance matches the ceil cut fold") {
    val deg = adj.groupBy(_._1).map { case (u, g) =>
      (u, g.size.toLong) }.toArray
    val n = deg.length.toLong
    val k = (n + 19) / 20
    val hubs = deg.sortBy { case (u, d0) => (-d0, u) }
      .take(k.toInt).map(_._1).toSet
    val touched = edges.count(e => hubs(e._1) || hubs(e._2)).toLong
    val r = q("q_hub_dominance").collect()(0)
    assert(r.getLong(0) == k)
    assert(r.getLong(1) == edges.size.toLong)
    assert(r.getLong(2) == touched)
    assert(r.getDouble(3) == rnd(touched.toDouble / edges.size, 6))
  }

  test("q_brand_seasonality matches the HHI fold") {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bm = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date")
          .cast("string"), col("l_extendedprice")).collect()
      .map(r => ((brandOf(r.getLong(0)), r.getString(1)),
        rndL(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val want = bm.toArray.groupBy(_._1._1).toArray
      .flatMap { case (b, g) =>
        val tot = g.map(_._2).sum
        if (tot <= 0) None
        else Some((b, g.length.toLong,
          rnd(g.map(x => BigInt(x._2) * x._2).sum.toDouble
            / (tot.toDouble * tot), 6)))
      }.sortBy { case (b, _, h) => (-h, b) }.take(10)
    val got = q("q_brand_seasonality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_gateway_parts matches the first-order fold") {
    val brandOf = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ords = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val firsts = ords.groupBy(_._2).map { case (_, g) =>
      val f = g.minBy(o => (o._3, o._1))
      (f._1, g.length >= 2)
    }
    val liBr = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), brandOf(r.getLong(1))))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).toSet) }
    val ovR = firsts.values.count(identity).toLong
    val ovN = firsts.size.toLong
    val fb = firsts.toArray.flatMap { case (fok, rep) =>
      liBr.getOrElse(fok, Set.empty).map(b => (b, rep))
    }
    val want = fb.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (b, g) =>
        val nr = g.count(_._2).toLong
        (b, g.length.toLong, rnd(nr.toDouble / g.length, 6),
          rnd((nr.toDouble / g.length) / (ovR.toDouble / ovN), 6))
      }
    val got = q("q_gateway_parts").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
