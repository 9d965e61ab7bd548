package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-16 key-level pins (queries/StatsR10o.scala): frequent
  * triples, EOQ, Siegel slope, u-chart, win-rate matrix — brute-force
  * folds over collected sf0.001 tables.
  */
class R10oOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_freq_triples matches the basket fold") {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brand = graft.tables.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ob = li.map(l => (l._1, brand(l._2))).distinct
    val nOrders = ob.map(_._1).distinct.length.toLong
    val singles = ob.groupBy(_._2).map { case (b, g) =>
      b -> g.length.toLong }
    val triples = scala.collection.mutable.Map
      .empty[(String, String, String), Long]
    ob.groupBy(_._1).values.foreach { g =>
      val bs = g.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length;
           k <- (j + 1) until bs.length)
        triples((bs(i), bs(j), bs(k))) =
          triples.getOrElse((bs(i), bs(j), bs(k)), 0L) + 1
    }
    val want = triples.toArray
      .sortBy { case ((b1, b2, b3), c) => (-c, b1, b2, b3) }.take(20)
      .map { case ((b1, b2, b3), c) =>
        val no = nOrders.toDouble
        (b1, b2, b3, c, rnd(c / no, 6),
          rnd((c / no) / ((singles(b1) / no) * (singles(b2) / no)
            * (singles(b3) / no)), 4))
      }
    val got = q("q_freq_triples").collect().map(r => (r.getString(0),
      r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_eoq matches the closed-form fold") {
    val dem = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (pk, g) => pk -> g.map(_._2).sum }
    val price = graft.tables.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val want = dem.toArray.map { case (pk, dm) =>
      val h = 0.2 * price(pk)
      val eoq = math.sqrt(2.0 * dm * 100.0 / h)
      (pk, dm, rnd(h, 4), rnd(eoq, 4), rnd(dm / eoq, 4))
    }.sortBy(x => (-x._2, x._1)).take(25)
    val got = q("q_eoq").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  private def medAt(xs: Array[Double]): Double = {
    val n = xs.length
    if (n % 2 == 1) xs((n + 1) / 2 - 1)
    else (xs(n / 2 - 1) + xs(n / 2)) / 2
  }

  test("q_siegel_slope matches the repeated-median fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).map {
      case (t, rows) =>
        val ys = rows.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, g) => g.map(_._3).sum / g.length }
        val n = ys.length
        val meds = (0 until n).map { i =>
          medAt((0 until n).filter(_ != i).map(j =>
            (ys(j) - ys(i)).toDouble / (j - i)).sorted.toArray)
        }.sorted.toArray
        val b = medAt(meds)
        val ics = (0 until n)
          .map(i => ys(i) - b * (i + 1)).sorted.toArray
        (t, n.toLong, rnd(b / 1e3, 6), rnd(medAt(ics) / 1e3, 4))
    }
    val got = q("q_siegel_slope").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_u_chart matches the varying-n fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string").as("d"),
        (col("event_type") === "error").as("e")).collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    val daily = ev.groupBy(_._1).toArray.sortBy(_._1).map {
      case (d, g) => (d, g.length.toLong, g.count(_._2).toLong) }
    val tx = daily.map(_._3).sum; val tn = daily.map(_._2).sum
    val ubar = tx.toDouble / tn
    val want = daily.map { case (d, n, x) =>
      val u = x.toDouble / n
      val hw = 3.0 * math.sqrt(ubar / n)
      val lcl = math.max(ubar - hw, 0.0)
      (d, n, x, rnd(u, 6), rnd(ubar + hw, 6), rnd(lcl, 6),
        if (u > ubar + hw) 1L else if (u < lcl) -1L else 0L)
    }
    val got = q("q_u_chart").collect().map(r => (r.getDate(0).toString,
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_winrate_matrix matches the matched-rank fold") {
    val z = 1.959963984540054
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("l"))
      .collect()
      .map { r =>
        val l = r.getSeq[String](2)
        (r.getString(0), r.getLong(1),
          rndL(l.distinct.length * 1e6 / l.length))
      }
    val bySrc = docs.groupBy(_._1).map { case (s0, g) =>
      s0 -> g.sortBy(_._2).map(_._3) }
    val srcs = bySrc.keys.toArray.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
    } yield {
      val a = bySrc(srcs(i)); val b = bySrc(srcs(j))
      val m = math.min(a.length, b.length)
      val w1 = (0 until m).count(r => a(r) > b(r)).toLong
      val w2 = (0 until m).count(r => a(r) < b(r)).toLong
      val t = (0 until m).count(r => a(r) == b(r)).toLong
      if (w1 + w2 > 0) {
        val nd = (w1 + w2).toDouble
        val p = w1 / nd
        val wl = (p + z * z / (nd * 2) - z * math.sqrt(p * (1.0 - p)
          / nd + z * z / (nd * nd * 4.0))) / (1.0 + z * z / nd)
        Some((srcs(i), srcs(j), w1, w2, t, rnd(p, 6), rnd(wl, 6)))
      } else None
    }).flatten.toSeq
    val got = q("q_winrate_matrix").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want)
  }
}
