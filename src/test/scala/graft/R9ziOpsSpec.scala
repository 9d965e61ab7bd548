package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-36 semantics (queries/StatsR9zi.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9ziOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (cn, sn, rev_cents) flows. */
  private lazy val flows: Map[(Int, Int), Long] = {
    val custNat = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val suppNat = graft.tables.Tables.supplier(spark, sf)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val ordCust = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => ((custNat(ordCust(r.getLong(0))),
        suppNat(r.getLong(1))), rndL(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
  }

  private lazy val natName: Map[Int, String] =
    graft.tables.Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap

  test("q_nation_flow_matrix matches the rollup fold") {
    val want = flows.toArray.map { case ((cn, sn), rev) =>
      (natName(cn), natName(sn), rnd(rev / 100.0, 2))
    }.sortBy { case (c, s0, r) => (-r, c, s0) }.take(20)
    val got = q("q_nation_flow_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_flow_balance matches the export/import fold") {
    val exp = flows.toArray.groupBy(_._1._2)
      .map { case (n, g) => (n, g.map(_._2).sum) }
    val imp = flows.toArray.groupBy(_._1._1)
      .map { case (n, g) => (n, g.map(_._2).sum) }
    val want = (exp.keySet ++ imp.keySet).toArray
      .map { n =>
        val e = exp.getOrElse(n, 0L); val i = imp.getOrElse(n, 0L)
        (natName(n), rnd(e / 100.0, 2), rnd(i / 100.0, 2),
          rnd((e - i) / 100.0, 2))
      }.sortBy(_._1)
    val got = q("q_flow_balance").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_ransac_lite matches the exact inlier fold") {
    val day = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e3).toLong))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, g) => g.map(_._2).sum / g.length }
    val n = day.length
    val pairs = Seq((1, 8), (1, 15), (8, 22), (15, 29), (1, 29),
      (8, 15), (15, 22), (22, 29)).filter(p => p._1 <= n && p._2 <= n)
    val cands = pairs.map { case (ai, aj) =>
      val yi = day(ai - 1); val yj = day(aj - 1)
      val inl = day.indices.count { k0 =>
        val k = k0 + 1L
        math.abs((day(k0) - yi) * (aj - ai) - (k - ai) * (yj - yi)) <=
          5000L * (aj - ai)
      }
      (ai.toLong, aj.toLong, inl.toLong, yi, yj)
    }
    val best = cands.minBy(c => (-c._3, c._1, c._2))
    val r = q("q_ransac_lite").collect()(0)
    assert(r.getLong(0) == best._1 && r.getLong(1) == best._2)
    assert(r.getLong(2) == best._3)
    assert(r.getDouble(3) == rnd((best._5 - best._4).toDouble
      / (best._2 - best._1) / 1000.0, 6))
  }

  test("q_eom_effect matches the month-length fold") {
    val rows = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date").cast("string")).collect()
      .map { r =>
        val d = LocalDate.parse(r.getString(0))
        (d.getDayOfMonth.toLong, d.lengthOfMonth.toLong)
      }
    val n = rows.length.toLong
    val eom = rows.count { case (dom, dim) => dom > dim - 3 }.toLong
    val exp = rows.groupBy(_._2).map { case (dim, g) =>
      g.length * 3.0 / dim
    }.sum
    val chi2 = math.pow(eom - exp, 2) / exp +
      math.pow((n - eom) - (n - exp), 2) / (n - exp)
    val r = q("q_eom_effect").collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == eom)
    assert(r.getDouble(2) == rnd(eom / n.toDouble, 6))
    assert(math.abs(r.getDouble(3) - chi2) < 1e-6)
  }

  test("q_burrows_delta matches the snapped z fold") {
    val toks = graft.tables.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1)
        .map(w => (r.getString(0), w)))
    val top = toks.groupBy(_._2).toArray
      .map { case (w, g) => (w, g.length.toLong) }
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1)
    val srcTot = toks.groupBy(_._1)
      .map { case (s0, g) => (s0, g.length.toLong) }
    val sources = srcTot.keySet.toArray.sorted
    val cnt = toks.filter(t => top.contains(t._2))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val fu = (for (s0 <- sources; w <- top) yield
      ((s0, w), rndL(cnt.getOrElse((s0, w), 0L) * 1e9 / srcTot(s0))))
      .toMap
    val zs = top.flatMap { w =>
      val vals = sources.map(s0 => fu((s0, w)))
      val ns = vals.length
      val mean = vals.sum.toDouble / ns
      val sd = math.sqrt(
        vals.map(v => BigInt(v) * v).sum.toDouble / ns - mean * mean)
      if (sd <= 0) None
      else Some((w, sources.map(s0 =>
        (s0, rndL((fu((s0, w)) - mean) / sd * 1e6))).toMap))
    }
    val want = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield {
      val (s1, s2) = (sources(i), sources(j))
      val diffs = zs.map { case (_, m) => math.abs(m(s1) - m(s2)) }
      (s1, s2, rnd(diffs.sum / diffs.length.toDouble / 1e6, 6))
    }).sortBy { case (s1, s2, del) => (del, s1, s2) }.take(5)
    val got = q("q_burrows_delta").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_chao1_vocab matches the richness fold") {
    val wc = graft.tables.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1)
        .map(w => (r.getString(0), w)))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val want = wc.toArray.groupBy(_._1._1).toArray.sortBy(_._1)
      .map { case (l, g) =>
        val v = g.length.toLong
        val f1 = g.count(_._2 == 1L).toLong
        val f2 = g.count(_._2 == 2L).toLong
        val chao = if (f2 > 0) v + f1.toDouble * f1 / (2 * f2)
          else v + f1.toDouble * (f1 - 1) / 2
        (l, v, f1, f2, rnd(chao, 6))
      }
    val got = q("q_chao1_vocab").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }
}
