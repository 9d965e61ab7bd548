package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-51 semantics (queries/StatsR9zx.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zxOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per user: events sorted by (µs, id): (type, centi). */
  private lazy val perUser: Map[Long, Array[(String, Long)]] =
    graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), rndL(r.getDouble(4) * 100)))
      .groupBy(_._1).map { case (u, g) =>
        (u, g.sortBy(e => (e._2, e._3)).map(e => (e._4, e._5)))
      }

  test("q_best_of_n matches the first-5 fold") {
    val per = perUser.values.filter(_.length >= 5)
      .map(_.take(5).map(_._2)).toArray
    val n = per.length.toLong
    val smx = per.map(_.max).sum
    val ss5 = per.map(_.sum).sum
    val r = q("q_best_of_n").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(smx.toDouble / n / 100, 6))
    assert(r.getDouble(2) == rnd(ss5.toDouble / (n * 5) / 100, 6))
    assert(r.getDouble(3) == rnd(smx.toDouble * 5 / ss5, 6))
  }

  test("q_majority_vote matches the modal fold") {
    val eligible = perUser.values.filter(_.length >= 6).toArray
    val preds = eligible.map { es =>
      val first5 = es.take(5).map(_._1)
      val modal = first5.groupBy(identity)
        .map { case (t, g) => (t, g.length) }.toArray
        .sortBy { case (t, c) => (-c, t) }.head._1
      (modal, es(5)._1)
    }
    val hits = preds.count(p => p._1 == p._2).toLong
    val modalC = preds.map(_._2).groupBy(identity)
      .map { case (t, g) => (t, g.length.toLong) }.toArray
      .sortBy { case (t, c) => (-c, t) }.head._2
    val r = q("q_majority_vote").collect()(0)
    assert(r.getLong(0) == preds.length.toLong)
    assert(r.getLong(1) == hits)
    assert(r.getDouble(2) == rnd(hits.toDouble / preds.length, 6))
    assert(r.getDouble(3) == rnd(modalC.toDouble / preds.length, 6))
  }

  test("q_lang_vocab_overlap matches the set fold") {
    val lw = graft.tables.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1)
        .map(w => (r.getString(0), w))).distinct
    val byL = lw.groupBy(_._1).map { case (l, g) =>
      (l, g.map(_._2).toSet) }
    val ls = byL.keys.toArray.sorted
    val want = (for {
      i <- ls.indices; j <- (i + 1) until ls.length
    } yield {
      val (a, b) = (byL(ls(i)), byL(ls(j)))
      val c = (a intersect b).size.toLong
      (ls(i), ls(j), c, rnd(c.toDouble / (a.size + b.size - c), 6))
    }).toArray
    val got = q("q_lang_vocab_overlap").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_char_cond_entropy matches the bigram fold") {
    val bgs = graft.tables.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap { r =>
        r.getString(1).split(" ", -1).filter(_.length >= 2)
          .flatMap(w => w.sliding(2).map(cc => (r.getString(0), cc)))
      }
    val want = bgs.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (l, g) =>
        val bc = g.groupBy(_._2).map { case (cc, gg) =>
          (cc, gg.length.toLong) }
        val c1 = bc.toArray.groupBy(_._1.charAt(0))
          .map { case (c, gg) => (c, gg.map(_._2).sum) }
        val nn = g.length.toLong
        val st = bc.map { case (cc, n12) =>
          rndL(n12.toDouble / nn
            * math.log(c1(cc.charAt(0)).toDouble / n12) * 1e9)
        }.sum
        (l, nn, rnd(st / 1e9, 6))
      }
    val got = q("q_char_cond_entropy").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_bloom_cardinality matches the fill-rate fold") {
    val ps = Array(2654435761L, 2246822519L, 3266489917L)
    val qs = Array(1L, 7L, 13L)
    def bits(t: String): Set[(Int, Long)] = {
      val us = perUser.toArray.flatMap { case (u, es) =>
        if (es.exists(_._1 == t)) Some(u) else None
      }
      us.flatMap(u => (0 to 2).map(j =>
        (j, (u * ps(j) + qs(j)) % 2147483647L % 4096L))).toSet
    }
    val a = bits("purchase"); val b = bits("click")
    // partitioned-bloom estimator over k=3 separate 4096-bit arrays
    def est(x: Long): Double =
      -4096.0 * math.log(math.max(1.0 - x / 12288.0, 1.0 / 12288.0))
    val tru = perUser.count { case (_, es) =>
      es.exists(_._1 == "purchase") && es.exists(_._1 == "click")
    }.toLong
    val r = q("q_bloom_cardinality").collect()(0)
    assert(r.getLong(0) == a.size.toLong)
    assert(r.getLong(1) == b.size.toLong)
    assert(r.getLong(2) == (a ++ b).size.toLong)
    assert(r.getDouble(3) == rnd(est(a.size), 4))
    assert(r.getDouble(4) == rnd(est(b.size), 4))
    assert(r.getDouble(5) == rnd(est(a.size) + est(b.size)
      - est((a ++ b).size), 4))
    assert(r.getLong(6) == tru)
  }

  test("q_split_half matches the paired fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, rows) => rows.map(_._3).sum / rows.length })
      }
    val want = daily.toArray.sortBy(_._1).flatMap { case (t, ys) =>
      val pairs = ys.grouped(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toArray
      val n = pairs.length.toLong
      val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
      val sab = pairs.map(p => p._1 * p._2).sum
      val saa = pairs.map(p => p._1 * p._1).sum
      val sbb = pairs.map(p => p._2 * p._2).sum
      if (n <= 2 || n * saa <= sa * sa || n * sbb <= sb * sb) None
      else {
        val r0 = (n * sab - sa * sb).toDouble /
          math.sqrt((n * saa - sa * sa).toDouble * (n * sbb - sb * sb))
        Some((t, n, rnd(r0, 6), rnd(2.0 * r0 / (1.0 + r0), 6)))
      }
    }
    val got = q("q_split_half").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }
}
