package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-18 key-level pins (queries/StatsR10q.scala): semantic
  * diversity, DFA, SLO burn, k-center — brute-force folds.
  */
class R10qOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val emb: Array[(Long, Int, Array[Float])] =
    graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))

  test("q_semantic_diversity matches the centroid-identity fold") {
    val want = emb.groupBy(_._2).toArray.sortBy(_._1).map {
      case (lab, g) =>
        val n = g.length
        val dims = g.head._3.length
        val sd = new Array[Double](dims)
        var sn2 = 0.0
        g.foreach { case (_, _, v) =>
          var a = 0.0; var i = 0
          while (i < dims) {
            sd(i) += v(i).toDouble
            a += v(i).toDouble * v(i).toDouble; i += 1
          }
          sn2 += a
        }
        val c2 = sd.map(x => (x / n) * (x / n)).sum
        val m2 = sn2 / n
        (lab, n.toLong, rnd(m2, 6), rnd(c2, 6),
          rnd(2.0 * n / (n - 1) * (m2 - c2), 6))
    }
    val got = q("q_semantic_diversity").collect().map(r => (r.getInt(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_dfa matches the integer-profile fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).map {
      case (t, rows) =>
        val ys = rows.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, g) => g.map(_._3).sum / g.length }
        val n = ys.length.toLong
        val m = ys.sum
        val p = ys.scanLeft(0L)(_ + _).tail.zipWithIndex
          .map { case (cum, idx) => n * cum - (idx + 1) * m }
        def fAt(s: Int): Double = {
          val nb = (n / s).toInt
          val rvs = (0 until nb).map { b =>
            val seg = p.slice(b * s, b * s + s).map(_.toDouble)
            val sp = seg.sum
            val spp = seg.map(x => x * x).sum
            val sjp = seg.zipWithIndex
              .map { case (x, j) => (j + 1) * x }.sum
            val sxx = s * (s.toLong * s - 1) / 12.0
            val sxy = sjp - (s + 1) / 2.0 * sp
            val syy = spp - sp * sp / s.toDouble
            (syy - sxy * sxy / sxx) / s.toDouble
          }
          math.sqrt(math.max(rvs.sum / nb, 0.0)) / n
        }
        val (f4, f8, f16) = (fAt(4), fAt(8), fAt(16))
        (t, n, rnd(f4 / 1e3, 6), rnd(f8 / 1e3, 6), rnd(f16 / 1e3, 6),
          rnd((math.log(f16) - math.log(f4)) / (2.0 * math.log(2.0)), 4))
    }
    val got = q("q_dfa").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_slo_burn matches the multiwindow fold") {
    // trailing TIME windows on the hour epoch (RANGE, not ROWS): a
    // missing hour leaves a gap, it never stitches non-adjacent hours
    val ev = graft.tables.Tables.events(spark, sf)
      .select((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
          .cast("long").as("he"),
        (col("event_type") === "error").as("e")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val hourly = ev.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (h, g) => (h, g.length.toLong, g.count(_._2).toLong) }
    val want = hourly.indices.map { i =>
      val (h, n, x) = hourly(i)
      def tw(k: Int) = {
        val s = hourly.filter(e => e._1 <= h && e._1 >= h - (k - 1))
        (s.map(_._2).sum, s.map(_._3).sum)
      }
      val (n6, x6) = tw(6); val (n24, x24) = tw(24)
      val b1 = x.toDouble / n / 0.01
      val b6 = x6.toDouble / n6 / 0.01
      val b24 = x24.toDouble / n24 / 0.01
      (h, n, x, rnd(b1, 4), rnd(b6, 4), rnd(b24, 4),
        if (b1 > 14.4 && b6 > 14.4) 1L else 0L,
        if (b6 > 6.0 && b24 > 6.0) 1L else 0L)
    }
    val got = q("q_slo_burn").collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq ==
      want.map(x => (x._2, x._3, x._4, x._5, x._6, x._7, x._8)).toSeq)
  }

  test("q_kcenter_greedy matches the brute greedy fold") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = emb.map(e => e._1 -> e._3).toMap
    var chosen = Vector(0L)
    (1 to 3).foreach { _ =>
      val next = emb.filter(e => !chosen.contains(e._1))
        .map { e =>
          (chosen.map(c => cos(e._3, byId(c))).min, e._1)
        }.minBy(identity)._2
      chosen = chosen :+ next
    }
    val radius = 1.0 - emb.filter(e => !chosen.contains(e._1))
      .map(e => chosen.map(c => cos(e._3, byId(c))).min).min
    val want = chosen.zipWithIndex
      .map { case (id, i) => (i + 1L, id, rnd(radius, 6)) }
    val got = q("q_kcenter_greedy").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
