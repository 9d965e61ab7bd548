package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-2 key-level pins (queries/StatsR10b.scala): brute-force
  * pure-Scala folds over the sf0.001 events table.
  */
class R10bOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (event_id, type, user, micros, value-centi) in (µs, id) order. */
  private lazy val ev: Array[(Long, String, Long, Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"),
        unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), rndL(r.getDouble(4) * 100)))
      .sortBy(e => (e._4, e._1))

  private def dayOf(us: Long): java.time.LocalDate =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
      .atZone(ZoneOffset.UTC).toLocalDate

  test("q_croston matches the coupled floor-div fold") {
    val want = ev.groupBy(_._2).toArray.sortBy(_._1).flatMap { case (t, g) =>
      val days = g.groupBy(e => dayOf(e._4)).toArray.sortBy(_._1)
        .map(_._2.map(_._5).sum)
      val n = days.length; val st = days.sum
      val dem = days.zipWithIndex
        .filter { case (c, _) => c * 5 * n > st * 6 }
        .map { case (c, i) => (i + 1L, c) } // (t index 1-based, q)
      if (dem.length < 2) None else {
        var z = dem(0)._2; var p = -1L; var last = dem(0)._1
        dem.drop(1).foreach { case (ti, qv) =>
          z = (z + qv) / 2
          p = if (p < 0) ti - last else (p + (ti - last)) / 2
          last = ti
        }
        Some((t, dem.length.toLong, rnd(z / 100.0, 2), p,
          rnd(z / p.toDouble / 100, 4)))
      }
    }
    val got = q("q_croston").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_hourly_occupancy matches the interval-overlap fold") {
    val sessions = ev.groupBy(_._3).toArray.flatMap { case (_, g) =>
      val ts = g.sortBy(e => (e._4, e._1)).map(_._4)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var s0 = ts.head; var prev = ts.head
      ts.drop(1).foreach { u =>
        if (u - prev > 1800000000L) { bounds += ((s0, prev)); s0 = u }
        prev = u
      }
      bounds += ((s0, prev))
      bounds
    }
    val nd = ev.map(e => dayOf(e._4)).distinct.length.toLong
    val byHour = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    sessions.foreach { case (s0, s1) =>
      ((s0 / 3600000000L) to (s1 / 3600000000L)).foreach { k =>
        val ov = math.min(s1, (k + 1) * 3600000000L) -
          math.max(s0, k * 3600000000L)
        if (ov > 0) {
          val h = k % 24
          val (b, c) = byHour.getOrElse(h, (0L, 0L))
          byHour(h) = (b + ov, c + 1)
        }
      }
    }
    val want = byHour.toArray.sortBy(_._1).map { case (h, (b, c)) =>
      (h, c, rnd(b / 1e6, 2), rnd(b.toDouble / (nd * 3600000000L), 6))
    }
    val got = q("q_hourly_occupancy").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_huber_mean matches the snapped-IRLS fold") {
    val want = ev.groupBy(_._2).toArray.sortBy(_._1).map { case (t, g) =>
      val xs = g.map(_._5)
      val n = xs.length.toLong
      val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val mu0 = sx.toDouble / n
      val k = 1.345 * math.sqrt(
        (BigInt(n) * sxx - BigInt(sx) * sx).toDouble / (n.toDouble * n))
      var mu = mu0
      for (_ <- 1 to 3) {
        var sw = BigInt(0); var swx = BigInt(0)
        xs.foreach { x =>
          val ad = math.abs(x - mu)
          val w = if (ad <= k) 1000000L else rndL(k * 1e6 / ad)
          sw += w; swx += BigInt(w) * x
        }
        mu = swx.toDouble / sw.toDouble
      }
      (t, n, rnd(mu0 / 100, 4), rnd(mu / 100, 4))
    }
    val got = q("q_huber_mean").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_ab_peeking matches the prefix-moment Welch fold") {
    def cum(t: String) = {
      val days = ev.filter(_._2 == t).groupBy(e => dayOf(e._4)).toArray
        .sortBy(_._1)
      days.scanLeft(("", 0L, 0L, 0L)) { case ((_, pn, ps, ps2), (d, g)) =>
        (d.toString, pn + g.length, ps + g.map(_._5).sum,
          ps2 + g.map(e => e._5 * e._5).sum)
      }.drop(1)
    }
    val a = cum("click").map(x => x._1 -> (x._2, x._3, x._4)).toMap
    val b = cum("view").map(x => x._1 -> (x._2, x._3, x._4)).toMap
    val ts = a.keySet.intersect(b.keySet).toArray.sorted.flatMap { d =>
      val (na, sa, sa2) = a(d); val (nb, sb, sb2) = b(d)
      if (na <= 1 || nb <= 1) None else {
        val va = (sa2.toDouble - sa.toDouble * sa / na) / (na - 1)
        val vb = (sb2.toDouble - sb.toDouble * sb / nb) / (nb - 1)
        val t = (sa.toDouble / na - sb.toDouble / nb) /
          math.sqrt(va / na + vb / nb)
        Some((d, t))
      }
    }
    val nLooks = ts.length.toLong
    val nCross = ts.count(x => math.abs(x._2) > 1.96).toLong
    val firstCross = ts.find(x => math.abs(x._2) > 1.96).map(_._1)
    val tFinal = rnd(ts.last._2, 4)
    val r = q("q_ab_peeking").collect()(0)
    assert(r.getLong(0) == nLooks)
    assert(r.getLong(1) == nCross)
    assert(Option(r.get(2)).map(_.toString) == firstCross)
    assert(r.getDouble(3) == tFinal)
  }
}
