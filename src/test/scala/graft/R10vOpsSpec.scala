package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-23 key-level pins (queries/StatsR10v.scala): the EVT
  * family — brute-force folds over collected sf0.001 events.
  */
class R10vOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(String, Long, Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

  private def thresholdAt(vs: Array[Long], pct: Int): Long = {
    val s = vs.sorted
    s(math.ceil(pct * s.length / 100.0).toInt - 1)
  }

  test("q_mean_excess matches the order-statistic fold") {
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).flatMap {
      case (t, rows) =>
        val vs = rows.map(_._2)
        Seq(80, 85, 90, 95).flatMap { pct =>
          val u = thresholdAt(vs, pct)
          val exc = vs.filter(_ > u)
          if (exc.nonEmpty)
            Some((t, pct.toLong, rnd(u / 100.0, 2), exc.length.toLong,
              rnd(exc.map(_ - u).sum / exc.length.toDouble / 100.0, 4)))
          else None
        }
    }
    val got = q("q_mean_excess").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_gpd_pot matches the MoM fold") {
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).flatMap {
      case (t, rows) =>
        val vs = rows.map(_._2)
        val u = thresholdAt(vs, 95)
        val exc = vs.filter(_ > u).map(_ - u)
        val k = exc.length.toLong
        if (k >= 3) {
          val s1 = exc.sum; val s2 = exc.map(x => x * x).sum
          val m = s1.toDouble / k
          val v = (k.toDouble * s2 - s1.toDouble * s1) / k / (k - 1)
          val rr = m * m / v
          val xi = (1.0 - rr) / 2
          val sg = m * (rr + 1) / 2
          val zeta = k.toDouble / vs.length
          Some((t, rnd(u / 100.0, 2), k, rnd(xi, 6),
            rnd(sg / 100.0, 4),
            rnd((u + sg / xi * (math.pow(zeta / 0.001, xi) - 1.0))
              / 100.0, 2)))
        } else None
    }
    val got = q("q_gpd_pot").collect().map(r => (r.getString(0),
      r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_extremal_index matches the Ferro-Segers fold") {
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).flatMap {
      case (t, rows) =>
        val u = thresholdAt(rows.map(_._2), 95)
        val sorted = rows.sortBy(e => (e._3, e._4))
        val pos = sorted.zipWithIndex
          .filter(_._1._2 > u).map(_._2 + 1L)
        if (pos.length >= 2) {
          val ts = (1 until pos.length)
            .map(i => pos(i) - pos(i - 1)).toArray
          val ng = ts.length.toLong
          val mt = ts.max
          val theta = if (mt <= 2) {
            val st = ts.sum; val st2 = ts.map(x => x * x).sum
            2.0 * st * st / (ng.toDouble * st2)
          } else {
            val sm1 = ts.map(_ - 1).sum
            val sm12 = ts.map(x => (x - 1) * (x - 2)).sum
            2.0 * sm1 * sm1 / (ng.toDouble * sm12)
          }
          Some((t, ng, mt, rnd(math.min(theta, 1.0), 6)))
        } else None
    }
    val got = q("q_extremal_index").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
