package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-24 semantics (queries/StatsR9x.scala): folds over the
  * collected sf0.001 tables and the composed legs.
  */
class R9xOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val dmean: Map[String, Array[Long]] =
    graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._2).map { case (t, g) =>
        t -> g.groupBy(_._1).map { case (d0, gg) =>
          (d0, gg.map(e => math.floor(e._3 * 1e3).toLong).sum / gg.length)
        }.toArray.sortBy(_._1).map(_._2)
      }

  test("q_knee_point matches the chord fold over the curve leg") {
    val curve = SparkEntry.queries("q_vocab_growth")(spark, sf)
      .select(col("bucket").cast("long"), col("cum_tokens"),
        col("vocab_size")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val (x1, y1) = (curve.head._2, curve.head._3)
    val (x2, y2) = (curve.last._2, curve.last._3)
    val knee = curve.map { case (b, x, y) =>
      (b, math.abs((x2 - x1) * (y1 - y) - (x1 - x) * (y2 - y1)))
    }
    val mxc = knee.map(_._2).max
    val kb = knee.filter(_._2 == mxc).map(_._1).min
    val kp = curve.find(_._1 == kb).get
    val r = q("q_knee_point").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === kb)
    assert(r(0).getLong(1) === kp._2)
    assert(r(0).getLong(2) === kp._3)
  }

  test("q_bigram_saturation matches the first-seen fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val mxd = docs.map(_._1).max + 1
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    for ((id, toks) <- docs.sortBy(_._1);
         bg <- toks.sliding(2).filter(_.length == 2)
           .map(_.mkString(" ")))
      if (!firstSeen.contains(bg) || firstSeen(bg) > id)
        firstSeen(bg) = id
    val newB = firstSeen.values.groupBy(id => id * 10 / mxd)
      .map { case (b, g) => b -> g.size.toLong }
    val totB = docs.groupBy(d => d._1 * 10 / mxd).map { case (b, g) =>
      b -> g.map(d => math.max(d._2.length - 1, 0).toLong).sum
    }
    val got = q("q_bigram_saturation").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    var cumB = 0L; var cumV = 0L
    for (b <- totB.keys.toArray.sorted) {
      cumB += totB(b); cumV += newB.getOrElse(b, 0L)
      val (gb, gv, gs) = got(b)
      assert(gb === cumB)
      assert(gv === cumV)
      assert(math.abs(gs - rnd((1.0 - cumV.toDouble / cumB) * 1e6)
        / 1e6) <= 1e-9)
    }
  }

  test("q_km_median matches the leg picks") {
    val km = SparkEntry.queries("q_survival_km")(spark, sf)
      .select("t_days", "surv").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val med = km.filter(_._2 <= 0.5).map(_._1).sorted.headOption
    val fin = km.last._2
    val r = q("q_km_median").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === km.length.toLong)
    med match {
      case Some(m) => assert(r(0).getLong(1) === m)
      case None    => assert(r(0).isNullAt(1))
    }
    assert(math.abs(r(0).getDouble(2) - fin) <= 1e-9)
  }

  test("q_mtbf_errors matches the gap fold") {
    val ers = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ers.groupBy(_._1).toArray.flatMap { case (_, g) =>
      g.sortBy(e => (e._2, e._3)).map(_._2).sliding(2)
        .collect { case Array(a, b) => b - a }
    }.sorted
    val n = gaps.length
    val p1 = (n + 1) / 2; val p2 = n / 2 + 1
    val med2 = gaps(p1 - 1) + gaps(p2 - 1)
    val r = q("q_mtbf_errors").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === n.toLong)
    assert(math.abs(r(0).getDouble(1) - rnd(med2 / 2e6 * 100) / 100.0)
      <= 1e-9)
    assert(math.abs(r(0).getDouble(2)
      - rnd(gaps.sum.toDouble / n / 1e6 * 100) / 100.0) <= 1e-9)
  }

  test("q_act_integrated matches the snapped-rho fold") {
    val got = q("q_act_integrated").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ys) <- dmean) {
      val n = ys.length.toLong
      val sy = ys.sum; val syy = ys.map(y => y * y).sum
      val clr = n * syy - sy * sy
      if (clr > 0) {
        var sr = 0L; var lagsDone = 0
        for (k <- 1 to 10 if ys.length > k) {
          val pairs = (0 until ys.length - k).map(i => (ys(i), ys(i + k)))
          val m = pairs.length.toLong
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
          sr += rnd((m * sxy - sa * sb).toDouble * n /
            (m.toDouble * clr) * 1e9)
          lagsDone += 1
        }
        if (lagsDone > 0) {
          val tau = 1.0 + 2.0 * sr / 1e9
          val (gn, gt, ge) = got(t)
          assert(gn === n)
          assert(math.abs(gt - rnd(tau * 1e4) / 1e4) <= 1e-9)
          assert(math.abs(ge - rnd(n / tau * 100) / 100.0) <= 1e-9)
        }
      }
    }
  }

  test("q_record_stats matches the harmonic fold") {
    val got = q("q_record_stats").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, ys) <- dmean) {
      var mx = Long.MinValue; var recs = 0L
      for (y <- ys) { if (y > mx) { recs += 1; mx = y } }
      val sh = (1 to ys.length).map(i => rnd(1e12 / i)).sum
      val (gn, gr, ge, grt) = got(t)
      assert(gn === ys.length.toLong)
      assert(gr === recs)
      assert(math.abs(ge - rnd(sh / 1e12 * 1e4) / 1e4) <= 1e-9)
      assert(math.abs(grt - rnd(recs.toDouble / (sh / 1e12) * 1e4)
        / 1e4) <= 1e-9)
    }
  }
}
