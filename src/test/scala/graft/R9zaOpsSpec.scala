package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-27 semantics (queries/StatsR9za.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zaOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val brandOf: Map[Long, String] =
    graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap

  /** (partkey, qty, price_cents, shipdate, orderkey, linenumber,
    * suppkey) */
  private lazy val li: Array[(Long, Long, Long, String, Long, Long,
      Long)] =
    graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"),
        col("l_shipdate").cast("date").cast("string"),
        col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong,
        rndL(r.getDouble(2) * 100), r.getString(3), r.getLong(4),
        r.getAs[Number](5).longValue, r.getLong(6)))

  private lazy val custOf: Map[Long, Long] =
    graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  /** Distinct handoff edges from the sampled orders. */
  private lazy val edges: Set[(Long, Long)] =
    li.filter(_._5 % 10 == 0)
      .groupBy(_._5).values.flatMap { g =>
        // total order (r11): (orderkey, linenumber) ties exist at
        // every SF — tiebreak by (suppkey, partkey) like the query
        val sorted = g.sortBy(e => (e._6, e._7, e._1)).map(_._7)
        sorted.zip(sorted.drop(1)).filter(p => p._1 != p._2)
      }.toSet

  test("q_paasche_fisher matches the snapped index fold") {
    val byBH = li.groupBy(l => (brandOf(l._1),
      if (l._4 < "1996-01-01") 0 else 1))
    val brands = byBH.keys.map(_._1).toSet.filter(b =>
      byBH.contains((b, 0)) && byBH.contains((b, 1))
        && byBH((b, 0)).map(_._2).sum > 0
        && byBH((b, 1)).map(_._2).sum > 0)
    var denL = 0L; var numL = 0L; var numP = 0L; var denP = 0L
    for (b <- brands) {
      val s0 = byBH((b, 0)).map(_._3).sum
      val q0 = byBH((b, 0)).map(_._2).sum
      val s1 = byBH((b, 1)).map(_._3).sum
      val q1 = byBH((b, 1)).map(_._2).sum
      denL += s0; numL += rndL(s1.toDouble * q0 / q1)
      numP += s1; denP += rndL(s0.toDouble * q1 / q0)
    }
    val r = q("q_paasche_fisher").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === brands.size.toLong)
    assert(math.abs(r(0).getDouble(1)
      - rnd(numP.toDouble / denP, 6)) <= 1e-9)
    assert(math.abs(r(0).getDouble(2)
      - rnd(math.sqrt((numL.toDouble / denL) * (numP.toDouble / denP)),
        6)) <= 1e-9)
  }

  test("q_newsvendor matches the order-statistic fold") {
    val dd = li.groupBy(l => (brandOf(l._1), l._4))
      .map { case ((b, day), g) => (b, day, g.map(_._2).sum) }
    val got = q("q_newsvendor").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    for ((b, g) <- dd.groupBy(_._1)) {
      val sorted = g.toArray.sortBy(x => (x._3, x._2))
      val n = sorted.length
      val idx = math.ceil(0.8 * n).toLong.toInt
      val qs = sorted(idx - 1)._3
      val svc = sorted.count(_._3 <= qs).toDouble / n
      val (gn, gq, gs) = got(b)
      assert(gn === n.toLong, b)
      assert(gq === qs, b)
      assert(math.abs(gs - rnd(svc, 6)) <= 1e-9, b)
    }
  }

  test("q_slope_one matches the deviation-matrix fold") {
    val ratings = li.groupBy(l => (custOf(l._5), brandOf(l._1)))
      .map { case ((c, b), g) =>
        (c, b) -> g.map(_._2 * 1000L).sum / g.length
      }
    val byCust = ratings.keys.groupBy(_._1)
      .map { case (c, ks) => c -> ks.map(_._2).toSet }
    val devs = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)]
    for ((c, bs) <- byCust; b1 <- bs; b2 <- bs if b1 != b2) {
      val (n, sd) = devs.getOrElse((b1, b2), (0L, 0L))
      devs((b1, b2)) = (n + 1, sd + ratings((c, b1)) - ratings((c, b2)))
    }
    val allB = ratings.keys.map(_._2).toSet
    val expect = for {
      c <- byCust.keys.toArray.sorted if c % 97 == 0
      b <- (allB -- byCust(c)).toArray.sorted
      terms = byCust(c).toArray.flatMap { b2 =>
        devs.get((b, b2)).map { case (n, sd) =>
          (ratings((c, b2)) * n + sd, n)
        }
      } if terms.nonEmpty
    } yield {
      val num = terms.map(_._1).sum; val den = terms.map(_._2).sum
      (c, b, rndL(num.toDouble / den), den)
    }
    val got = q("q_slope_one").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === expect.toSeq)
  }

  test("q_katz_centrality matches the three-hop vector fold") {
    val out = edges.groupBy(_._1).map { case (s, g) =>
      s -> g.map(_._2)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    def hop(v: Map[Long, Long]): Map[Long, Long] = {
      val m = scala.collection.mutable.Map.empty[Long, Long]
      for ((src, c) <- v; d <- out.getOrElse(src, Nil))
        m(d) = m.getOrElse(d, 0L) + c
      m.toMap
    }
    val c1 = edges.groupBy(_._2).map { case (v, g) =>
      v -> g.size.toLong
    }
    val c2 = hop(c1); val c3 = hop(c2)
    val got = q("q_katz_centrality").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === verts)
    for (v <- verts) {
      val (g1, g2, g3, gk) = got(v)
      assert(g1 === c1.getOrElse(v, 0L), v)
      assert(g2 === c2.getOrElse(v, 0L), v)
      assert(g3 === c3.getOrElse(v, 0L), v)
      assert(math.abs(gk - rnd((100 * c1.getOrElse(v, 0L)
        + 10 * c2.getOrElse(v, 0L) + c3.getOrElse(v, 0L)) / 1000.0, 3))
        <= 1e-9, v)
    }
  }

  test("q_reciprocity matches the reverse-edge fold") {
    val recip = edges.count(e => edges.contains((e._2, e._1)))
    val r = q("q_reciprocity").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === edges.size.toLong)
    assert(r(0).getLong(1) === recip.toLong / 2)
    assert(math.abs(r(0).getDouble(2)
      - rnd(recip.toDouble / edges.size, 6)) <= 1e-9)
  }

  test("q_bass_diffusion matches the Cramer fold") {
    val fw = graft.tables.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(date_trunc("week", min(col("o_orderdate")).cast("date"))
        .cast("date").cast("string").as("w"))
      .collect().map(_.getString(1))
    val wk = fw.groupBy(identity).map { case (w, g) =>
      (w, g.length.toLong)
    }.toArray.sortBy(_._1)
    var cum = 0L
    val pts = wk.map { case (w, y) =>
      val x = cum / 10; cum += y; (x, y)
    }
    val n = pts.length.toLong
    def bi(vs: Array[BigInt]) = vs.sum.toDouble
    val dx = bi(pts.map(p => BigInt(p._1)))
    val dx2 = bi(pts.map(p => BigInt(p._1) * p._1))
    val dx3 = bi(pts.map(p => BigInt(p._1) * p._1 * p._1))
    val dx4 = bi(pts.map(p => BigInt(p._1) * p._1 * p._1 * p._1))
    val dy = bi(pts.map(p => BigInt(p._2)))
    val dxy = bi(pts.map(p => BigInt(p._1) * p._2))
    val dx2y = bi(pts.map(p => BigInt(p._1) * p._1 * p._2))
    val dn = n.toDouble
    val det = dn * (dx2 * dx4 - dx3 * dx3) -
      dx * (dx * dx4 - dx2 * dx3) + dx2 * (dx * dx3 - dx2 * dx2)
    assert(det != 0.0)
    val a = (dy * (dx2 * dx4 - dx3 * dx3)
      - dx * (dxy * dx4 - dx2y * dx3)
      + dx2 * (dxy * dx3 - dx2y * dx2)) / det
    val b = (dn * (dxy * dx4 - dx2y * dx3)
      - dy * (dx * dx4 - dx2 * dx3)
      + dx2 * (dx * dx2y - dxy * dx2)) / det
    val c = (dn * (dx2 * dx2y - dx3 * dxy)
      - dx * (dx * dx2y - dx3 * dy)
      + dy * (dx * dx3 - dx2 * dx2)) / det
    val r = q("q_bass_diffusion").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n)
    assert(math.abs(r(0).getDouble(1) - rnd(a, 6)) <= 1e-9)
    assert(math.abs(r(0).getDouble(2) - rnd(b, 6)) <= 1e-9)
    assert(math.abs(r(0).getDouble(3) - rnd(c, 6)) <= 1e-9)
    val disc = b * b - 4 * a * c
    if (c < 0 && disc > 0) {
      val m = (-b - math.sqrt(disc)) / (2 * c)
      assert(math.abs(r(0).getDouble(4) - rnd(m, 3)) <= 1e-9)
      assert(math.abs(r(0).getDouble(5) - rnd(-c * m, 6)) <= 1e-9)
      assert(math.abs(r(0).getDouble(6) - rnd(a / m, 6)) <= 1e-9)
    } else {
      assert(r(0).isNullAt(4) && r(0).isNullAt(5) && r(0).isNullAt(6))
    }
  }
}
