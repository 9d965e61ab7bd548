package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-4 semantics (queries/StatsR9d.scala): each corpus/behavior
  * statistic re-derived by a brute-force fold over the collected
  * sf0.001 tables.
  */
class R9dOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private lazy val docs: Array[(String, Array[String], String)] =
    graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1).split(" "), r.getString(2)))

  private lazy val evs: Array[(Long, String)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_kl_sources matches the smoothed top-30 Jeffreys fold") {
    val all = docs.flatMap(d => d._2.map(t => (d._1, t)))
    val top = all.groupBy(_._2).map { case (t, g) => (t, g.length) }
      .toArray.sortBy { case (t, c) => (-c, t) }.take(30).map(_._1).toSet
    val bySrc = all.filter(p => top.contains(p._2)).groupBy(_._1)
      .map { case (s0, g) =>
        s0 -> ((g.groupBy(_._2).map { case (t, gg) => t -> gg.length.toLong },
          g.length.toLong))
      }
    val srcs = bySrc.keys.toArray.sorted
    val got = q("q_kl_sources").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    var checked = 0
    for (i <- srcs.indices; j <- i + 1 until srcs.length) {
      val (c1, n1) = bySrc(srcs(i))
      val (c2, n2) = bySrc(srcs(j))
      val termU = top.toArray.map { t =>
        val p1 = (c1.getOrElse(t, 0L) + 1).toDouble / (n1 + 30)
        val p2 = (c2.getOrElse(t, 0L) + 1).toDouble / (n2 + 30)
        rnd((p1 - p2) * math.log(p1 / p2) * 1e12)
      }.sum
      assert(math.abs(got((srcs(i), srcs(j))) - termU / 1e12) <= 1e-6)
      checked += 1
    }
    assert(checked === got.size)
  }

  test("q_lexical_density matches the stop-token fold") {
    val stop = Set("the", "a", "of", "and", "in")
    val got = q("q_lexical_density").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((lang, g) <- docs.groupBy(_._3)) {
      val dens = g.map { d =>
        val n = d._2.length.toLong
        val ns = d._2.count(stop.contains).toLong
        rnd((n - ns).toDouble * 1e6 / n)
      }
      val (gn, gavg, gmin) = got(lang)
      assert(gn === g.length.toLong)
      assert(math.abs(gavg - dens.map(_ / 1e6).sum / dens.length) <= 1e-6)
      assert(math.abs(gmin - dens.min / 1e6) <= 1e-6)
    }
  }

  test("q_cf_user_topk matches the top-50 cosine fold") {
    val types = Array("click", "view", "purchase", "signup", "error")
    val vec = evs.groupBy(_._1).map { case (u, g) =>
      (u, g.length.toLong, types.map(t => g.count(_._2 == t).toLong))
    }.toArray.sortBy(x => (-x._2, x._1)).take(50)
    val got = q("q_cf_user_topk").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    for ((u, _, v) <- vec) {
      val nrm = v.map(x => x * x).sum
      val nbrs = vec.filter(_._1 != u).map { case (w, _, vw) =>
        val dot = v.zip(vw).map { case (a, b) => a * b }.sum
        val nrm2 = vw.map(x => x * x).sum
        (rnd(dot.toDouble * 1e6 / math.sqrt(nrm.toDouble * nrm2)), w)
      }.sortBy { case (c, w) => (-c, w) }.take(3)
      for ((exp, rank) <- nbrs.zipWithIndex) {
        val (gn, gc) = got((u, rank + 1L))
        assert(gn === exp._2, s"user $u rank ${rank + 1}")
        assert(math.abs(gc - exp._1 / 1e6) <= 1e-6)
      }
    }
  }

  test("q_session_entropy matches the exact-count entropy fold") {
    val hU = evs.groupBy(_._1).map { case (_, g) =>
      val n = g.length.toLong
      val clnc = g.groupBy(_._2).values
        .map(gg => gg.size.toDouble * math.log(gg.size.toDouble)).sum
      rnd((math.log(n.toDouble) - clnc / n) * 1e9)
    }.toArray
    val exp = hU.groupBy(h => h / 250000000L) // positive: / == div
      .toArray.map { case (b, g) =>
        (b, g.length.toLong, g.sum.toDouble / g.length / 1e9)
      }
    val got = q("q_session_entropy").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === exp.map(_._1).toSet)
    for ((b, n, h) <- exp) {
      val (gn, gh) = got(b)
      assert(gn === n)
      assert(math.abs(gh - h) <= 1e-6)
    }
  }
}
