package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-15 key-level pins (queries/StatsR10n.scala): ROUGE-N,
  * BLEU-2, Passing-Bablok, Dunn post-hoc, and effect sizes re-derived
  * by brute-force folds over collected sf0.001 tables.
  */
class R10nOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Map[Long, Array[String]] =
    graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("l")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap

  private def grams(t: Array[String], n: Int): Array[String] =
    if (n == 1) t
    else (0 until t.length - 1).map(i => t(i) + " " + t(i + 1)).toArray

  private def clipStats(a: Array[String], b: Array[String])
      : (Long, Long, Long) = {
    val ca = a.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cb = b.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val clip = (ca.keySet ++ cb.keySet).toSeq
      .map(k => math.min(ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))).sum
    (ca.values.sum, cb.values.sum, clip)
  }

  private lazy val pairs: Array[(Long, Array[String], Array[String])] =
    docs.keys.filter(_ % 2 == 0).toArray.sorted.flatMap(id =>
      docs.get(id + 1).map(r => (id, docs(id), r)))

  test("q_rouge_n matches the clipped-count fold") {
    val want = pairs.flatMap { case (id, c, r) =>
      val (tc1, tr1, cl1) = clipStats(grams(c, 1), grams(r, 1))
      val (tc2, tr2, cl2) = clipStats(grams(c, 2), grams(r, 2))
      if (tc1 > 0 && tr1 > 0 && tc2 > 0 && tr2 > 0)
        Some((id, rnd(cl1.toDouble / tc1, 6), rnd(cl1.toDouble / tr1, 6),
          rnd(if (cl1 > 0) 2.0 * cl1 / (tc1 + tr1).toDouble else 0.0, 6),
          rnd(cl2.toDouble / tc2, 6), rnd(cl2.toDouble / tr2, 6),
          rnd(if (cl2 > 0) 2.0 * cl2 / (tc2 + tr2).toDouble else 0.0, 6)))
      else None
    }
    val got = q("q_rouge_n").collect().map(r => (r.getLong(0),
      r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_bleu_lite matches the smoothed-precision fold") {
    val want = pairs.flatMap { case (id, c, r) =>
      val (tc1, _, cl1) = clipStats(grams(c, 1), grams(r, 1))
      val (tc2, _, cl2) = clipStats(grams(c, 2), grams(r, 2))
      if (tc1 > 0 && tc2 > 0) {
        val p1 = cl1.toDouble / tc1
        val p2 = (cl2 + 1) / (tc2 + 1).toDouble
        val bp = math.min(1.0,
          math.exp(1.0 - r.length / c.length.toDouble))
        Some((id, c.length, r.length, rnd(p1, 6), rnd(p2, 6),
          rnd(bp * math.sqrt(p1 * p2), 6)))
      } else None
    }
    val got = q("q_bleu_lite").collect().map(r => (r.getLong(0),
      r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  private lazy val dm: Map[String, Array[(String, Long)]] = {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    ev.groupBy(_._1).map { case (t, rows) =>
      t -> rows.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (d, g) => (d, g.map(_._3).sum / g.length) }
    }
  }

  test("q_passing_bablok matches the K-shifted median fold") {
    val types = dm.keys.toArray.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val m1 = dm(types(i)).toMap; val m2 = dm(types(j)).toMap
      val days = m1.keySet.intersect(m2.keySet).toArray.sorted
      val pts = days.map(d => (m1(d), m2(d)))
      val sls = (for {
        a <- pts.indices; b <- (a + 1) until pts.length
        if pts(a)._1 != pts(b)._1
      } yield (pts(b)._2 - pts(a)._2).toDouble / (pts(b)._1 - pts(a)._1))
        .filter(_ != -1.0).sorted.toArray
      val n = sls.length; val k = sls.count(_ < -1.0)
      val b0 =
        if (n % 2 == 1) sls((n + 1) / 2 + k - 1)
        else (sls(n / 2 + k - 1) + sls(n / 2 + k)) / 2
      val ics = pts.map(p => p._2 - b0 * p._1).sorted
      val m = ics.length
      val ic =
        if (m % 2 == 1) ics((m + 1) / 2 - 1)
        else (ics(m / 2 - 1) + ics(m / 2)) / 2
      (types(i), types(j), n.toLong, rnd(b0, 6), rnd(ic / 1e3, 4))
    }).toSeq
    val got = q("q_passing_bablok").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("q_dunn_test matches the doubled-midrank fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val all = ev.map(_._2)
    def r2(v: Double): Long =
      2L * (all.count(_ < v) + 1) + all.count(_ == v) - 1
    val grp = ev.groupBy(_._1).map { case (t, g) =>
      t -> (g.length.toLong, g.map(e => r2(e._2)).sum)
    }
    val nn = all.length.toLong
    val t3 = all.groupBy(identity).values
      .map(g => { val c = g.length.toLong; c * c * c - c }).sum
    val types = grp.keys.toArray.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (n1, s1) = grp(types(i)); val (n2, s2) = grp(types(j))
      val z = ((s1 / n1.toDouble - s2 / n2.toDouble) / 2.0) /
        math.sqrt((nn.toDouble * (nn + 1) / 12.0
          - t3.toDouble / (nn - 1) / 12.0) * (1.0 / n1 + 1.0 / n2))
      (types(i), types(j), n1, n2, rnd(z, 4))
    }).toSeq
    val got = q("q_dunn_test").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("q_effect_sizes matches the moment fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val g = ev.groupBy(_._1).values.map { rows =>
      (rows.length.toLong, rows.map(_._2).sum,
        rows.map(e => e._2 * e._2).sum)
    }.toArray
    val k = g.length.toLong; val nn = g.map(_._1).sum
    val tm = g.map(_._2).sum; val tss = g.map(_._3).sum
    val sb = g.map(x => x._2.toDouble * x._2 / x._1).sum
    val sst = tss - tm.toDouble * tm / nn
    val ssb = sb - tm.toDouble * tm / nn
    val msw = (sst - ssb) / (nn - k)
    val eta2 = ssb / sst
    val want = (k, nn, rnd(eta2, 6),
      rnd((ssb - (k - 1) * msw) / sst, 6),
      rnd((ssb - (k - 1) * msw) / (sst + msw), 6),
      rnd(math.sqrt(eta2 / (1.0 - eta2)), 6))
    val r = q("q_effect_sizes").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5)) == want)
  }
}
