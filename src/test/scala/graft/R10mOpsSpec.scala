package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-14 key-level pins (queries/StatsR10m.scala): ERR, RBP,
  * personalization, and the EWMA chart re-derived by brute-force
  * folds over collected sf0.001 tables.
  */
class R10mOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** The 1-in-17 top-10 neighbor ranking, folded from raw vectors. */
  private lazy val ranking: Array[(Long, Int, Array[(Int, Int)])] = {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    e.filter(_._1 % 17 == 0).map { case (aId, aLab, aEmb) =>
      val top = e.filter(_._1 != aId)
        .map { case (bId, bLab, bEmb) =>
          (rnd(cos(aEmb, bEmb), 6), bId, bLab) }
        .sortBy(t => (-t._1, t._2)).take(10).zipWithIndex
        .map { case ((_, _, bLab), idx) => (idx + 1, bLab) }
      (aId, aLab, top)
    }
  }

  test("q_err_at_k matches the cascade fold") {
    val perQ = ranking.map { case (_, aLab, top) =>
      var cum = 0L; var errU = 0L
      top.foreach { case (rn, bLab) =>
        if (bLab == aLab) {
          errU += rndL(1e9 * math.pow(0.5, cum + 1) / rn)
          cum += 1
        }
      }
      (aLab, errU)
    }
    val want = perQ.groupBy(_._1).toArray.sortBy(_._1).map {
      case (lab, g) => (lab, g.length.toLong,
        rnd(g.map(_._2).sum.toDouble / g.length / 1e9, 6))
    }
    val got = q("q_err_at_k").collect().map(r => (r.getInt(0),
      r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_rbp matches the snapped-coefficient fold") {
    val cs = (1 to 10).map(i => math.round(1e9 * math.pow(0.8, i - 1)))
    val perQ = ranking.map { case (_, aLab, top) =>
      (aLab, top.filter(_._2 == aLab).map(t => cs(t._1 - 1)).sum)
    }
    val want = perQ.groupBy(_._1).toArray.sortBy(_._1).map {
      case (lab, g) => (lab, g.length.toLong,
        rnd(0.2 * g.map(_._2).sum / g.length / 1e9, 6))
    }
    val got = q("q_rbp").collect().map(r => (r.getInt(0),
      r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_personalization agrees with a Jaccard fold over q_recs_topn") {
    val recs = q("q_recs_topn").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val act = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("act"))
      .orderBy(col("act").desc, col("cust")).limit(50)
      .collect().map(_.getLong(0)).toSet
    val lists = recs.filter(r => act.contains(r._1)).groupBy(_._1)
      .map { case (c, g) => c -> g.map(_._2).toSet }.toArray
    val js = for {
      i <- lists.indices; j <- (i + 1) until lists.length
    } yield {
      val (a, b) = (lists(i)._2, lists(j)._2)
      rndL(a.intersect(b).size * 1e6 / a.union(b).size)
    }
    val want = (js.length.toLong,
      rnd(js.sum.toDouble / js.length / 1e6, 6),
      rnd(1.0 - js.sum.toDouble / js.length / 1e6, 6))
    val r = q("q_personalization").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) == want)
  }

  test("q_ewma_chart matches the closed-form recursion fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = q("q_ewma_chart").collect().map(r => ((r.getString(0),
      r.getDate(1).toString), (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getLong(5)))).toMap
    var checked = 0
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val days = rows.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_._3).sum / g.length) }
      val n = days.length
      if (n >= 2) {
        val sm = days.map(_._2).sum
        val ss = days.map(x => x._2 * x._2).sum
        val mu = sm.toDouble / n
        val sd = math.sqrt((n.toDouble * ss - sm.toDouble * sm)
          / n / (n - 1))
        var run = 0.0
        days.zipWithIndex.foreach { case ((d, y), idx) =>
          val t1 = idx + 1L
          run += 0.2 * y * math.pow(0.8, -t1)
          val z = math.pow(0.8, t1) * (mu + run)
          val hw = 3.0 * sd * math.sqrt(0.2 / 1.8
            * (1.0 - math.pow(0.8, t1 * 2)))
          val g = got((t, d))
          val flag = if (z > mu + hw) 1L else if (z < mu - hw) -1L else 0L
          assert(g == (rnd(z / 1e3, 4), rnd((mu + hw) / 1e3, 4),
            rnd((mu - hw) / 1e3, 4), flag))
          checked += 1
        }
      }
    }
    assert(checked == got.size && checked > 0)
  }
}
