package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-32 semantics (queries/StatsR9zf.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zfOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (event_id, type, user, micros, day) */
  private lazy val ev: Array[(Long, String, Long, Long, String)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"),
        unix_micros(col("ts")), to_date(col("ts")).cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4)))

  test("q_bloom_fpr matches the modular-hash fold") {
    val ps = Array(2654435761L, 2246822519L, 3266489917L)
    val qs = Array(1L, 7L, 13L)
    def h(x: Long, j: Int): Long = (x * ps(j) + qs(j)) % 2147483647L % 4096L
    val members = ev.filter(_._2 == "purchase").map(_._1)
    val probes = ev.filter(_._2 == "click").map(_._1)
    val bits = members.flatMap(x => (0 to 2).map(j => (j, h(x, j)))).toSet
    val nPos = probes.count(x => (0 to 2).forall(j => bits((j, h(x, j)))))
    val r = q("q_bloom_fpr").collect()(0)
    assert(r.getLong(0) == members.length.toLong)
    assert(r.getLong(1) == probes.length.toLong)
    assert(r.getLong(2) == bits.size.toLong)
    assert(r.getDouble(3) == rnd(nPos.toDouble / probes.length, 6))
    assert(r.getDouble(4) == rnd(math.pow(
      1.0 - math.exp(-3.0 * members.length / 4096), 3.0), 6))
  }

  test("q_kmv_distinct matches the order-statistic fold") {
    val want = ev.groupBy(_._2).toArray.sortBy(_._1).map { case (t, g) =>
      val hs = g.map(e => (e._3 * 2654435761L) % 4294967296L)
        .distinct.sorted
      val est = if (hs.length >= 64) 63.0 * 4294967296.0 / hs(63)
        else hs.length.toDouble
      val tru = g.map(_._3).distinct.length.toLong
      (t, tru, rnd(est, 4), rnd(math.abs(est - tru) / tru, 6))
    }
    val got = q("q_kmv_distinct").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_transfer_entropy matches the triple-count fold") {
    val byDay = ev.groupBy(_._5).toArray.sortBy(_._1).map { case (_, g) =>
      (g.count(_._2 == "click").toLong, g.count(_._2 == "purchase").toLong)
    }
    val sym = byDay.sliding(2)
      .map(a => (if (a(1)._1 > a(0)._1) 1L else 0L,
        if (a(1)._2 > a(0)._2) 1L else 0L)).toArray
    val rows = sym.sliding(2)
      .map(a => (a(1)._2, a(0)._2, a(0)._1)).toArray  // (b1, b, a)
    val n = rows.length.toLong
    val tri = rows.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val cba = rows.groupBy(r => (r._2, r._3)).map { case (k, v) => (k, v.length.toLong) }
    val cbb = rows.groupBy(r => (r._1, r._2)).map { case (k, v) => (k, v.length.toLong) }
    val cb = rows.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
    val st = tri.map { case ((b1, b, a), c3) =>
      rndL(c3 * math.log(c3.toDouble * cb(b)
        / (cba((b, a)).toDouble * cbb((b1, b)))) * 1e9)
    }.sum
    val r = q("q_transfer_entropy").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(st / 1e9 / n, 6))
  }

  test("q_interevent_burstiness matches the gap-moment fold") {
    val want = ev.groupBy(_._2).toArray.sortBy(_._1).flatMap { case (t, g) =>
      val ts = g.sortBy(e => (e._4, e._1)).map(_._4)
      val gaps = ts.sliding(2).map(a => a(1) - a(0)).toArray
      val n = gaps.length.toLong
      val sg = gaps.sum
      val sgg = gaps.map(x => BigInt(x) * x).sum
      val mu = sg.toDouble / n
      val sd = math.sqrt(sgg.toDouble / n - mu * mu)
      if (sd + mu <= 0) None
      else Some((t, n, rnd(mu / 1e6, 6), rnd((sd - mu) / (sd + mu), 6)))
    }
    val got = q("q_interevent_burstiness").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_kendall_w matches the concordance fold") {
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val daily = raw.groupBy(e => (e._1, e._2)).map { case ((t, d), g) =>
      (t, d, g.map(_._3).sum / g.length)
    }.toArray
    val types = daily.map(_._1).distinct
    val m = types.length.toLong
    val r2Of = types.flatMap { t =>
      val ys = daily.filter(_._1 == t).map(_._3)
      ys.distinct.map { y =>
        val less = ys.count(_ < y).toLong; val eq = ys.count(_ == y).toLong
        ((t, y), 2 * less + eq + 1)
      }
    }.toMap
    val dayTot = daily.groupBy(_._2).filter(_._2.length == m)
      .map { case (_, g) => g.map(e => r2Of((e._1, e._3))).sum }.toArray
    val n = dayTot.length.toLong
    val sr = dayTot.sum; val srr = dayTot.map(x => x * x).sum
    val t3 = types.map { t =>
      val ys = daily.filter(_._1 == t).map(_._3)
      ys.distinct.map { y =>
        val c = ys.count(_ == y).toLong; c * c * c - c
      }.sum
    }.sum
    val w = (3.0 * (n * srr - sr * sr) / n) /
      (m.toDouble * m * (n.toDouble * n * n - n) - m * t3)
    val r = q("q_kendall_w").collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == m)
    assert(r.getDouble(2) == rnd(w, 6))
  }

  test("q_kneser_ney matches the interpolated-KN fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val bigs = docs.flatMap { t =>
      val ws = t.split(" ")
      if (ws.length < 2) Array.empty[(String, String)]
      else ws.zip(ws.tail)
    }
    val cvw = bigs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val cv = cvw.toArray.groupBy(_._1._1).map { case (v, g) =>
      (v, (g.map(_._2).sum, g.length.toLong))
    }
    val n1w = cvw.toArray.groupBy(_._1._2).map { case (w, g) =>
      (w, g.length.toLong)
    }
    val n11 = cvw.size.toLong
    val nBig = cvw.values.sum
    val st = cvw.map { case ((v, w), c) =>
      val (cvx, n1v) = cv(v)
      val p = (c - 0.75) / cvx + 0.75 * n1v / cvx * n1w(w) / n11
      rndL(c * math.log(p) * 1e6)
    }.sum
    val r = q("q_kneser_ney").collect()(0)
    assert(r.getLong(0) == nBig)
    assert(r.getLong(1) == n11)
    assert(r.getDouble(2) == rnd(math.exp(-(st / 1e6) / nBig), 4))
  }
}
