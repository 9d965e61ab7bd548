package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-41 semantics (queries/StatsR9zn.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9znOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_densify_days matches the calendar fold") {
    val act = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (t, g) => (t, g.map(_._2).toSet) }
    val want = act.toArray.sortBy(_._1).map { case (t, days) =>
      val lo = LocalDate.parse(days.min); val hi = LocalDate.parse(days.max)
      val all = Iterator.iterate(lo)(_.plusDays(1))
        .takeWhile(!_.isAfter(hi)).map(_.toString).toArray
      val missing = all.filterNot(days)
      val maxGap = if (missing.isEmpty) 0L
      else missing.map(LocalDate.parse(_).toEpochDay)
        .zipWithIndex.map { case (e, i) => e - i }
        .groupBy(identity).values.map(_.length.toLong).max
      (t, all.length.toLong, missing.length.toLong, maxGap)
    }
    val got = q("q_densify_days").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_fd_check matches the fan-out fold") {
    def fd(pairs: Array[(Long, Any)], name: String) = {
      val byK = pairs.groupBy(_._1)
        .map { case (_, g) => g.map(_._2).distinct.length.toLong }
      (name, byK.size.toLong, byK.count(_ > 1).toLong, byK.max)
    }
    val cust = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1): Any))
    val part = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1): Any))
    val ord = graft.tables.Tables.orders(spark, sf)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1): Any))
    val want = Array(fd(cust, "custkey_to_nationkey"),
      fd(ord, "custkey_to_orderpriority"),
      fd(part, "partkey_to_brand")).sortBy(_._1)
    val got = q("q_fd_check").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_grouping_id matches the rollup fold") {
    val rows = graft.tables.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2).toLong))
    val lvl0 = rows.groupBy(r => (r._1, r._2)).toArray
      .map { case ((rf, ls), g) =>
        (rf, ls, 0L, g.length.toLong, g.map(_._3).sum) }
    val lvl1 = rows.groupBy(_._1).toArray
      .map { case (rf, g) =>
        (rf, "ALL", 1L, g.length.toLong, g.map(_._3).sum) }
    val lvl3 = Array(("ALL", "ALL", 3L, rows.length.toLong,
      rows.map(_._3).sum))
    val want = (lvl0 ++ lvl1 ++ lvl3)
      .sortBy(t => (t._3, t._1, t._2))
    val got = q("q_grouping_id").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_explode_outer matches the row accounting fold") {
    val arrs = graft.tables.Tables.documents(spark, sf)
      .select("text").collect()
      .map(_.getString(0).split(" ", -1).filter(_.length > 8))
    val r = q("q_explode_outer").collect()(0)
    assert(r.getLong(0) == arrs.length.toLong)
    assert(r.getLong(1) == arrs.count(_.isEmpty).toLong)
    assert(r.getLong(2) == arrs.map(_.length.toLong).sum)
    assert(r.getLong(3) == arrs.map(a =>
      math.max(a.length, 1).toLong).sum)
    assert(r.getLong(4) == arrs.count(_.isEmpty).toLong)
  }

  test("q_lang_purity matches the top-100 fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1)))
    val want = docs.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (l, g) =>
        val counts = g.flatMap(_._3).groupBy(identity)
          .map { case (w, ws) => (w, ws.length.toLong) }
        val top = counts.toArray.sortBy { case (w, c) => (-c, w) }
          .take(100).map(_._1).toSet
        val ps = g.map { case (_, _, ws) =>
          rndL(ws.count(top).toDouble * 1e6 / ws.length)
        }
        (l, g.length.toLong, rnd(ps.sum / ps.length.toDouble / 1e6, 6),
          rnd(ps.min / 1e6, 6))
      }
    val got = q("q_lang_purity").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_rolling_p90 matches the trailing-window fold") {
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
      val evals = ys.indices.filter(_ >= 14).map { i =>
        val p90 = ys.slice(i - 14, i).sorted.apply(12)
        (ys(i) > p90, p90)
      }
      (t, evals.length.toLong, evals.count(_._1).toLong,
        rnd(evals.last._2 / 1000.0, 6))
    }
    val got = q("q_rolling_p90").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
