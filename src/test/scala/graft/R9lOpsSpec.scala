package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-12 semantics (queries/StatsR9l.scala): each statistic
  * re-derived by a brute-force fold over the collected sf0.001
  * tables, independent of the plans under test.
  */
class R9lOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (event_id, ts_us, day, user_id, event_type, value)
  private lazy val evs: Array[(Long, Long, String, Long, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")),
        to_date(col("ts")).cast("string"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._5).map { case (t, g) =>
      t -> g.groupBy(_._3).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._6 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  private def rets(ds: Array[(String, Long)]): Array[(String, Long)] =
    ds.sliding(2).collect { case Array((_, py), (d1, y)) =>
      (d1, rnd(math.log(y.toDouble / py) * 1e6))
    }.toArray

  test("q_bfs_layers matches the BFS fold over the memo edges") {
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, g) => n -> g.map(_._2).toSet }
    val deg = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, g) => n -> g.length }
    val hub = deg.toArray.minBy { case (n, d0) => (-d0, n) }._1
    var visited = Set(hub); var frontier = Set(hub)
    val exp = scala.collection.mutable.ArrayBuffer((0L, 1L))
    for (depth <- 1 to 4) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(visited)
      if (frontier.nonEmpty) exp += ((depth.toLong, frontier.size.toLong))
      visited ++= frontier
    }
    val got = q("q_bfs_layers").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === exp.toSeq)
  }

  test("q_dup_gini matches the run-length Gini fold") {
    val sizes = graft.operators.EdgeGraph.components(spark, sf, "bigram", 0.3)
      .groupBy("label").agg(count(lit(1)).as("sz")).collect()
      .map(_.getLong(1)).sorted
    val n = sizes.length.toLong
    val sx = sizes.sum
    val twoIx = sizes.zipWithIndex.map { case (x, i) =>
      2L * (i + 1) * x
    }.sum
    val gini = twoIx.toDouble / (n * sx) - (n + 1.0) / n
    val r = q("q_dup_gini").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n)
    assert(r(0).getLong(1) === sx)
    assert(math.abs(r(0).getDouble(2) - rnd(gini * 1e4) / 1e4) <= 1e-9)
  }

  test("q_amihud matches the snapped per-day fold") {
    val got = q("q_amihud").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((t, ds) <- dmean) {
      val vol = evs.filter(_._5 == t).groupBy(_._3)
        .map { case (d0, g) => d0 -> g.length.toLong }
      val terms = rets(ds).map { case (d0, r0) =>
        rnd(math.abs(r0).toDouble * 1e6 / vol(d0))
      }
      val (gn, ga) = got(t)
      assert(gn === terms.length.toLong)
      assert(math.abs(ga - rnd(terms.sum.toDouble / terms.length / 1e12
        * 1e10) / 1e10) <= 1e-12)
    }
  }

  test("q_cornish_fisher matches the exact-moment fold") {
    val z = -1.6448536269514722
    val got = q("q_cornish_fisher").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val rs = rets(ds).map(_._2)
      val n = rs.length
      if (n > 3) {
        val s1 = rs.map(BigInt(_)).sum
        val s2 = rs.map(r0 => BigInt(r0) * BigInt(r0)).sum
        val s3 = rs.map(r0 => BigInt(r0).pow(3)).sum
        val s4 = rs.map(r0 => BigInt(r0).pow(4)).sum
        val mu = s1.toDouble / n
        val m2 = s2.toDouble / n - mu * mu
        if (m2 > 0) {
          val m3 = s3.toDouble / n - mu * s2.toDouble / n * 3 +
            mu * mu * mu * 2
          val m4 = s4.toDouble / n - mu * s3.toDouble / n * 4 +
            mu * mu * s2.toDouble / n * 6 - mu * mu * mu * mu * 3
          val sk = m3 / (m2 * math.sqrt(m2))
          val ku = m4 / (m2 * m2) - 3
          val zcf = z + (z * z - 1) * sk / 6 +
            (z * z * z - 3 * z) * ku / 24 -
            (2 * z * z * z - 5 * z) * sk * sk / 36
          val mvar = -(mu + zcf * math.sqrt(m2)) / 1e6
          val (gn, gsk, gku, gmv) = got(t)
          assert(gn === n.toLong)
          assert(math.abs(gsk - rnd(sk * 1e4) / 1e4) <= 1e-9)
          assert(math.abs(gku - rnd(ku * 1e4) / 1e4) <= 1e-9)
          assert(math.abs(gmv - rnd(mvar * 1e6) / 1e6) <= 1e-9)
        }
      }
    }
  }

  test("q_ks_uniform matches the cleared D fold") {
    val dayUs = 86400000000L
    val got = q("q_ks_uniform").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, g) <- evs.groupBy(_._5)) {
      val us = g.map(e => (e._2 % dayUs, e._1)).sortBy(identity)
      val n = us.length.toLong
      var dp = Long.MinValue; var dm = Long.MinValue
      for (((u, _), idx) <- us.zipWithIndex) {
        val i = (idx + 1).toLong
        dp = math.max(dp, i * dayUs - n * u)
        dm = math.max(dm, n * u - (i - 1) * dayUs)
      }
      val dStat = math.max(dp, dm).toDouble / (n.toDouble * dayUs.toDouble)
      val (gn, gd, gk) = got(t)
      assert(gn === n)
      assert(math.abs(gd - rnd(dStat * 1e6) / 1e6) <= 1e-9)
      assert(math.abs(gk - rnd(math.sqrt(n.toDouble) * dStat * 1e4)
        / 1e4) <= 1e-9)
    }
  }

  test("q_logrank matches the snapped per-time fold") {
    val hz = evs.map(_._2).max
    // per user: signup -> first purchase strictly after, else censored
    val durs = evs.groupBy(_._4).flatMap { case (u, g) =>
      val su = g.filter(_._5 == "signup").map(_._2).sorted.headOption
      su.map { s0 =>
        val fp = g.filter(e => e._5 == "purchase" && e._2 > s0)
          .map(_._2).sorted.headOption
        (u % 2, fp.map(f => (f - s0) / 86400000000L)
          .getOrElse((hz - s0) / 86400000000L), fp.isDefined)
      }
    }.toArray
    val grid = durs.groupBy(_._2).toArray.sortBy(_._1)
    val nAll = durs.length.toLong
    val nG1 = durs.count(_._1 == 1).toLong
    var cumA = 0L; var cumA1 = 0L
    var nTimes = 0L; var o1 = 0L; var se = 0L; var sv = 0L
    for ((_, g) <- grid) {
      val nj = nAll - cumA; val n1j = nG1 - cumA1
      val dj = g.count(_._3).toLong
      val d1j = g.count(x => x._3 && x._1 == 1).toLong
      if (dj > 0 && nj > 1) {
        nTimes += 1; o1 += d1j
        se += rnd(dj.toDouble * n1j * 1e9 / nj)
        sv += rnd(dj.toDouble * n1j * (nj - n1j) * (nj - dj) * 1e9 /
          (nj.toDouble * nj * (nj - 1)))
      }
      cumA += g.length; cumA1 += g.count(_._1 == 1)
    }
    val chi = (o1 * 1e9 - se) * (o1 * 1e9 - se) / (sv.toDouble * 1e9)
    val r = q("q_logrank").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === nTimes)
    assert(r(0).getLong(1) === o1)
    assert(math.abs(r(0).getDouble(2) - rnd(se / 1e9 * 1e4) / 1e4)
      <= 1e-9)
    assert(math.abs(r(0).getDouble(3) - rnd(chi * 1e4) / 1e4) <= 1e-9)
  }
}
