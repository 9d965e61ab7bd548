package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-10 semantics (queries/StatsR9j.scala): each statistic
  * re-derived by a brute-force fold over the collected sf0.001
  * events, independent of the plans under test.
  */
class R9jOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // (event_id, ts_us, day, user_id, event_type, value)
  private lazy val evs: Array[(Long, Long, String, Long, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")),
        to_date(col("ts")).cast("string"), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._5).map { case (t, g) =>
      t -> g.groupBy(_._3).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._6 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  private def weekOf(d0: String): String = {
    val ld = java.time.LocalDate.parse(d0)
    ld.minusDays(ld.getDayOfWeek.getValue - 1L).toString
  }

  // Spark dayofweek: 1=Sunday..7=Saturday
  private def dow(d0: String): Int =
    java.time.LocalDate.parse(d0).getDayOfWeek.getValue % 7 + 1

  test("q_quade matches the doubled centered-rank fold") {
    val types = dmean.keys.toArray.sorted
    val k = types.length
    val weekly = dmean.toArray.flatMap { case (t, ds) =>
      ds.groupBy(x => weekOf(x._1)).map { case (w, g) =>
        (w, t, g.map(_._2).sum / g.length)
      }
    }
    val blocks = weekly.groupBy(_._1).filter(_._2.length == k)
    val qb = blocks.map { case (w, g) =>
      w -> (g.map(_._3).max - g.map(_._3).min)
    }.toArray.sortBy { case (w, rng) => (rng, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    var a2 = 0L
    val tj = scala.collection.mutable.Map.empty[String, Long]
    for ((w, g) <- blocks) {
      val ranked = g.sortBy(x => (x._3, x._2)).zipWithIndex
      for (((_, t, _), r0) <- ranked) {
        val s2 = qb(w) * ((r0 + 1).toLong * 2 - (k + 1))
        a2 += s2 * s2
        tj(t) = tj.getOrElse(t, 0L) + s2
      }
    }
    val st2 = tj.values.map(x => x * x).sum
    val b = blocks.size.toLong
    val f = (b - 1).toDouble * st2 / (b * a2 - st2)
    val r = q("q_quade").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === b)
    assert(r(0).getLong(1) === k.toLong)
    assert(math.abs(r(0).getDouble(2) - rnd(f * 1e4) / 1e4) <= 1e-9)
  }

  test("q_bartlett matches the snapped per-group fold") {
    var k = 0L; var nTot = 0L; var st = 0L; var sp = 0L; var si = 0L
    for ((_, ds) <- dmean) {
      val ys = ds.map(_._2)
      val n = ys.length.toLong
      val clr = n * ys.map(y => y * y).sum - ys.sum * ys.sum
      if (n > 1 && clr > 0) {
        k += 1; nTot += n
        st += rnd(math.log(clr.toDouble / (n * (n - 1))) * (n - 1) * 1e9)
        sp += rnd(clr.toDouble * 1e6 / n)
        si += rnd(1e12 / (n - 1))
      }
    }
    val t = ((nTot - k) * math.log(sp.toDouble / (1e6 * (nTot - k)))
      - st / 1e9) /
      (1.0 + (si / 1e12 - 1.0 / (nTot - k)) / ((k - 1) * 3.0))
    val r = q("q_bartlett").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === k)
    assert(r(0).getLong(1) === nTot)
    assert(math.abs(r(0).getDouble(2) - rnd(t * 1e4) / 1e4) <= 1e-9)
  }

  test("q_markov_absorption matches the Neumann fold") {
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, g) <- evs.groupBy(_._4)) {
      val ord = g.sortBy(e => (e._2, e._1)).map(_._5)
      for (Array(a, b) <- ord.sliding(2).map(_.toArray)
           if ord.length >= 2 && a != null)
        trans((a, b)) = trans.getOrElse((a, b), 0L) + 1
    }
    val tot = trans.groupBy(_._1._1).map { case (i, g) =>
      i -> g.values.sum
    }
    val qm = trans.collect {
      case ((i, j), n) if i != "purchase" && j != "purchase" =>
        (i, j) -> rnd(n * 1e6 / tot(i))
    }.toMap
    val states = qm.keys.map(_._1).toArray.distinct.sorted
    var pow: Map[(String, String), Long] =
      states.map(st => (st, st) -> 1000000L).toMap
    val acc = scala.collection.mutable.Map[String, Long]()
    for (st <- states) acc(st) = 1000000L
    for (_ <- 1 to 19) {
      pow = (for (i <- states; j <- states) yield {
        val su = states.map(m =>
          pow.getOrElse((i, m), 0L) * qm.getOrElse((m, j), 0L)).sum
        (i, j) -> (su + 500000L) / 1000000L
      }).filter(_._2 != 0L).toMap
      for (i <- states)
        acc(i) += states.map(j => pow.getOrElse((i, j), 0L)).sum
    }
    val got = q("q_markov_absorption").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got.keySet === states.toSet)
    for (st <- states)
      assert(math.abs(got(st) - rnd(acc(st) / 1e6 * 1e4) / 1e4) <= 1e-9)
  }

  test("q_seasonal_mk matches the per-season S/variance fold") {
    val got = q("q_seasonal_mk").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val bySeason = ds.groupBy(x => dow(x._1))
      var sStat = 0L; var v18 = 0L; var nSeasons = 0L
      for ((_, g) <- bySeason) {
        val ord = g.sortBy(_._1).map(_._2)
        var s = 0L
        for (i <- ord.indices; j <- i + 1 until ord.length)
          s += java.lang.Long.signum(ord(j) - ord(i))
        val ns = ord.length.toLong
        val tie = ord.groupBy(identity).values
          .map(gg => { val c = gg.length.toLong; c * (c - 1) * (c * 2 + 5) })
          .sum
        if (ord.length >= 2) {
          sStat += s
          v18 += ns * (ns - 1) * (ns * 2 + 5) - tie
          nSeasons += 1
        }
      }
      if (v18 > 0) {
        val vs = v18 / 18.0
        val z =
          if (sStat > 0) (sStat - 1) / math.sqrt(vs)
          else if (sStat < 0) (sStat + 1) / math.sqrt(vs)
          else 0.0
        val (gn, gs, gz) = got(t)
        assert(gn === nSeasons)
        assert(gs === sStat)
        assert(math.abs(gz - rnd(z * 1e4) / 1e4) <= 1e-9)
      } else assert(!got.contains(t))
    }
  }

  test("q_rmssd matches the diff fold") {
    val got = q("q_rmssd").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((t, ds) <- dmean) {
      val dd = ds.map(_._2).sliding(2).collect { case Array(a, b) =>
        b - a
      }.toArray
      if (dd.nonEmpty) {
        val (gn, gr, gp) = got(t)
        assert(gn === dd.length.toLong)
        assert(math.abs(gr - rnd(math.sqrt(dd.map(x => x * x).sum.toDouble
          / dd.length) / 1e3 * 1e6) / 1e6) <= 1e-9)
        assert(math.abs(gp - rnd(dd.count(x => math.abs(x) > 100).toDouble
          / dd.length * 1e6) / 1e6) <= 1e-9)
      }
    }
  }

  test("q_weekend_effect matches the cleared Welch fold") {
    val got = q("q_weekend_effect").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, ds) <- dmean) {
      val rs = ds.sliding(2).collect { case Array((_, py), (d1, y)) =>
        (d1, rnd(math.log(y.toDouble / py) * 1e6))
      }.toArray
      val (we, wd) = rs.partition(x => { val w = dow(x._1); w == 1 || w == 7 })
      val n1 = we.length.toLong; val n2 = wd.length.toLong
      if (n1 > 1 && n2 > 1) {
        val s1 = we.map(_._2).sum; val s2 = wd.map(_._2).sum
        val c1 = n1 * we.map(x => x._2 * x._2).sum - s1 * s1
        val c2 = n2 * wd.map(x => x._2 * x._2).sum - s2 * s2
        if (c1 > 0 || c2 > 0) {
          val md = s1.toDouble / n1 - s2.toDouble / n2
          val tW = md / math.sqrt(c1.toDouble / (n1 * n1 * (n1 - 1))
            + c2.toDouble / (n2 * n2 * (n2 - 1)))
          val (gn1, gn2, gmd, gt) = got(t)
          assert(gn1 === n1)
          assert(gn2 === n2)
          assert(math.abs(gmd - rnd(md / 1e6 * 1e6) / 1e6) <= 1e-9)
          assert(math.abs(gt - rnd(tW * 1e4) / 1e4) <= 1e-9)
        }
      } else assert(!got.contains(t))
    }
  }
}
