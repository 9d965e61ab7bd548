package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-19 key-level pins (queries/StatsR10r.scala +
  * s_stream_slo): AR(2) Yule-Walker fold, mutual-kNN fold, and the
  * streaming SLO batch-twin equality.
  */
class R10rOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_ar2_yw matches the Yule-Walker fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).flatMap {
      case (t, rows) =>
        val ys = rows.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, g) => g.map(_._3).sum / g.length }
        val xs = (1 until ys.length).map(i =>
          rndL(math.log(ys(i).toDouble / ys(i - 1)) * 1e6)).toArray
        val n = xs.length
        if (n >= 4) {
          val ss = xs.sum; val s2 = xs.map(x => x * x).sum
          val xb = ss.toDouble / n
          val c0 = (s2 - ss.toDouble * ss / n) / n
          def cv(k: Int): Double = {
            val a = (0 until n - k).map(i => xs(i) * xs(i + k)).sum
            val b = (0 until n - k).map(xs(_)).sum
            val c = (k until n).map(xs(_)).sum
            (a - xb * (b + c) + (n - k) * xb * xb) / n
          }
          val r1 = cv(1) / c0; val r2 = cv(2) / c0
          val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
          val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
          Some((t, n.toLong, rnd(r1, 6), rnd(r2, 6), rnd(phi1, 6),
            rnd(phi2, 6), rnd(1.0 - phi1 * r1 - phi2 * r2, 6)))
        } else None
    }
    val got = q("q_ar2_yw").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_mutual_knn matches the ranking fold") {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val sample = e.filter(_._1 % 17 == 0)
    val tops = sample.map { case (aId, aEmb) =>
      aId -> e.filter(_._1 != aId)
        .map { case (bId, bEmb) => (rnd(cos(aEmb, bEmb), 6), bId) }
        .sortBy(t => (-t._1, t._2)).take(10).map(_._2).toSet
    }.toMap
    val within = tops.toSeq.flatMap { case (a, bs) =>
      bs.filter(_ % 17 == 0).map(b => (a, b)) }
    val mutual = within.count { case (a, b) =>
      a < b && tops(b).contains(a) }
    val want = (sample.length.toLong, within.length.toLong,
      mutual.toLong,
      rnd(mutual * 2 / within.length.toDouble, 6))
    val r = q("q_mutual_knn").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      == want)
  }

  test("s_stream_slo equals the q_slo_burn batch twin") {
    val a = q("s_stream_slo").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
    val b = q("q_slo_burn").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }
}
