package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-15 semantics (queries/StatsR9o.scala): folds over the
  * collected sf0.001 tables.
  */
class R9oOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val evs: Array[(Long, String, Double, String)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._2).map { case (t, g) =>
      t -> g.groupBy(_._4).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  test("q_blocking_quality matches the blocked-truth fold") {
    val parts = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // same jaro-winkler as the engine's expression, via the SQL fn
    import spark.implicits._
    graft.expr.Registry.ensure(spark)
    val jwPairs = parts.toSeq.toDF("id", "name")
    val truth = jwPairs.as("a").crossJoin(jwPairs.as("b"))
      .filter(col("a.id") < col("b.id")
        && concat_ws(" ", slice(split(col("a.name"), " "), 1, 3))
          === concat_ws(" ", slice(split(col("b.name"), " "), 1, 3)))
      .filter(round(expr("jaro_winkler(a.name, b.name)"), 6) >= 0.92)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("q_sorted_neighborhood")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val blocks = parts.groupBy(_._2.split(" ").take(3).mkString(" ")).map(_._2.length.toLong)
    val universe = blocks.map(nb => nb * (nb - 1) / 2).sum
    val hit = (cand & truth).size.toLong
    val r = q("q_blocking_quality").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === truth.size.toLong)
    assert(r(0).getLong(1) === cand.size.toLong)
    assert(math.abs(r(0).getDouble(2)
      - rnd(hit.toDouble / truth.size * 1e4) / 1e4) <= 1e-9)
    assert(math.abs(r(0).getDouble(3)
      - rnd((1.0 - cand.size.toDouble / universe) * 1e6) / 1e6) <= 1e-9)
  }

  test("q_qini_curve matches the cumulative uplift fold") {
    val users = evs.groupBy(_._1).toArray.map { case (u, g) =>
      val ne = g.length.toLong
      val nc = g.count(_._2 == "click").toLong
      val np = g.count(_._2 == "purchase").toLong
      (u, ne, if (nc * 1000 / ne >= 200) 1L else 0L, np * 1000 / ne)
    }.sortBy(x => (-x._2, x._1))
    val n = users.length
    val base = n / 10; val extra = n % 10
    var idx = 0
    val got = q("q_qini_curve").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    var cnt = 0L; var cnc = 0L; var cy1 = 0L; var cy0 = 0L
    for (b <- 0 until 10) {
      val sz = base + (if (b < extra) 1 else 0)
      for (_ <- 0 until sz) {
        val (_, _, t, ym) = users(idx); idx += 1
        if (t == 1) { cnt += 1; cy1 += ym } else { cnc += 1; cy0 += ym }
      }
      if (cnc > 0) {
        val qini = (cy1.toDouble - cy0.toDouble * cnt / cnc) / 1000.0
        val (gt, gc, gq) = got((b + 1).toLong)
        assert(gt === cnt)
        assert(gc === cnc)
        assert(math.abs(gq - rnd(qini * 1e4) / 1e4) <= 1e-9)
      }
    }
  }

  test("q_sentence_stats matches the split fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = q("q_sentence_stats").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((lang, g) <- docs.groupBy(_._1)) {
      val ns = g.map(d => d._2.split("\\. ", -1).length.toLong).sum
      val nt = g.map(d => d._2.split(" ", -1).length.toLong).sum
      val (gd, gs, gsp, gtp) = got(lang)
      assert(gd === g.length.toLong)
      assert(gs === ns)
      assert(math.abs(gsp - rnd(ns.toDouble / g.length * 1e4) / 1e4)
        <= 1e-9)
      assert(math.abs(gtp - rnd(nt.toDouble / ns * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_percentile_interp matches the x4-cleared fold") {
    val got = q("q_percentile_interp").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2).sorted
      val n = ys.length.toLong
      def v(q4: Int): Long = {
        val pos4 = (n - 1) * q4
        val lo = (pos4 / 4).toInt
        val f = pos4 % 4
        ys(lo) * (4 - f) + (if (f > 0) ys(lo + 1) * f else 0L)
      }
      val (gn, g25, g50, g75) = got(t)
      assert(gn === n)
      assert(math.abs(g25 - rnd(v(1) / 4000.0 * 1e6) / 1e6) <= 1e-9)
      assert(math.abs(g50 - rnd(v(2) / 4000.0 * 1e6) / 1e6) <= 1e-9)
      assert(math.abs(g75 - rnd(v(3) / 4000.0 * 1e6) / 1e6) <= 1e-9)
    }
  }

  test("q_tail_ratio matches the ceil-rank fold") {
    val got = q("q_tail_ratio").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val rs = ds.map(_._2).sliding(2).collect { case Array(py, y) =>
        rnd(math.log(y.toDouble / py) * 1e6)
      }.toArray.sorted
      val n = rs.length.toLong
      if (n > 0) {
        val x95 = rs(math.ceil(n * 0.95).toInt - 1)
        val x5 = rs(math.ceil(n * 0.05).toInt - 1)
        if (x5 < 0 && x95 > 0) {
          val (gn, gr) = got(t)
          assert(gn === n)
          assert(math.abs(gr - rnd(x95.toDouble / -x5 * 1e4) / 1e4)
            <= 1e-9)
        } else assert(!got.contains(t))
      }
    }
  }

  test("q_ab_srm matches the parity fold") {
    val users = evs.map(_._1).distinct
    val a0 = users.count(_ % 2 == 0).toLong
    val a1 = users.count(_ % 2 == 1).toLong
    val n = users.length.toLong
    val chi = (a0 - a1).toDouble * (a0 - a1) / n
    val r = q("q_ab_srm").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n)
    assert(r(0).getLong(1) === a0)
    assert(r(0).getLong(2) === a1)
    assert(math.abs(r(0).getDouble(3) - rnd(chi * 1e6) / 1e6) <= 1e-9)
    assert(r(0).getBoolean(4) === (chi > 3.84))
  }
}
