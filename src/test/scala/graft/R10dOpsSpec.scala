package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-4 key-level pins (queries/StatsR10d.scala): brute-force
  * pure-Scala folds over the sf0.001 tables.
  */
class R10dOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def dayOf(us: Long): java.time.LocalDate =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
      .atZone(ZoneOffset.UTC).toLocalDate

  /** (event_id, type, micros, value-centi, raw value). */
  private lazy val ev: Array[(Long, String, Long, Long, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        rndL(r.getDouble(3) * 100), r.getDouble(3)))

  test("q_rbo matches the dual-ranking fold") {
    val em = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qe = em.find(_._1 == 0).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      for (i <- a.indices) s += a(i).toDouble * b(i).toDouble
      s
    }
    val cands = em.filter(_._1 != 0)
    val rc = cands.map(e => (e._1, rnd(cos(e._2, qe), 6)))
      .sortBy(x => (-x._2, x._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rd = cands.map(e => (e._1, rnd(dot(e._2, qe), 6)))
      .sortBy(x => (-x._2, x._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val mx = cands.map(e => math.max(rc(e._1), rd(e._1)))
    var cum = 0L
    val want = (1 to 20).map { dd =>
      val ov = mx.count(_ <= dd).toLong
      val coef = rndL((1.0 - 0.9) * math.pow(0.9, dd - 1) / dd * 1e9)
      cum += coef * ov
      (dd.toLong, ov, rnd(cum / 1e9, 6))
    }
    val got = q("q_rbo").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_rolling_mad matches the exact array-median fold") {
    val want = ev.groupBy(_._2).toArray.sortBy(_._1).flatMap { case (t, g) =>
      val days = g.groupBy(e => dayOf(e._3)).toArray.sortBy(_._1)
        .map { case (d, rows) => (d.toString, rows.map(_._4).sum) }
      days.indices.drop(6).flatMap { i =>
        val arr = days.slice(i - 6, i + 1).map(_._2).sorted
        val med = arr(3)
        val mad = arr.map(v => math.abs(v - med)).sorted.apply(3)
        val x = days(i)._2
        if (math.abs(x - med) * 10 > mad * 35)
          Some((t, days(i)._1, rnd(x / 100.0, 2), rnd(med / 100.0, 2),
            rnd(mad / 100.0, 2)))
        else None
      }
    }
    val got = q("q_rolling_mad").collect().map(r => (r.getString(0),
      r.getDate(1).toString, r.getDouble(2), r.getDouble(3),
      r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_theta_forecast matches the SES + drift fold") {
    val want = ev.groupBy(_._2).toArray.sortBy(_._1).flatMap { case (t, g) =>
      val days = g.groupBy(e => dayOf(e._3)).toArray.sortBy(_._1)
      val ys = days.map { case (_, rows) =>
        val sm = rows.map(e => math.floor(e._5 * 1e3).toLong).sum
        sm / rows.length
      }
      val n = ys.length.toLong
      if (n <= 1) None else {
        val st = ys.zipWithIndex.map { case (y, i0) =>
          val i = i0 + 1L
          val w = if (i == 1) 0.3 * math.pow(0.7, (n - i).toDouble) +
            math.pow(0.7, n.toDouble)
          else 0.3 * math.pow(0.7, (n - i).toDouble)
          rndL(w * y * 1e3)
        }.sum
        val sy = ys.sum
        val siy = ys.zipWithIndex.map { case (y, i0) => (i0 + 1L) * y }.sum
        val sii = (1L to n).map(i => i * i).sum
        val si = (1L to n).sum
        val b = (n * siy - si * sy).toDouble / (n * sii - si * si)
        val a = (sy - b * si) / n
        val drift = a + b * (n + 1)
        Some((t, n, rnd(st / 1e6, 4), rnd(drift / 1e3, 4),
          rnd((st / 1e3 + drift) / 2 / 1e3, 4)))
      }
    }
    val got = q("q_theta_forecast").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_logloss matches the Laplace-smoothed fold") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select(col("event_id"),
        least(floor(get_json_object(col("props"), "$.k")
          .cast("long") / 10), lit(9L)).as("bkt"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val train = rows.filter(_._1 % 2 == 0)
    val test = rows.filter(_._1 % 2 == 1)
    val tb = train.groupBy(_._2).map { case (b, g) =>
      b -> ((g.map(_._3).sum + 1).toDouble / (g.length + 2))
    }
    val pg = (train.map(_._3).sum + 1).toDouble / (train.length + 2)
    var sl = 0L; var sb = 0L
    test.foreach { case (_, b, y) =>
      val p = tb(b)
      sl += rndL(math.log(if (y == 1) p else 1.0 - p) * 1e9)
      sb += rndL(math.log(if (y == 1) pg else 1.0 - pg) * 1e9)
    }
    val n = test.length.toLong
    val r = q("q_logloss").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(-sl.toDouble / n / 1e9, 6))
    assert(r.getDouble(2) == rnd(-sb.toDouble / n / 1e9, 6))
    assert(r.getDouble(3) == rnd(1.0 - sl.toDouble / sb, 6))
  }
}
