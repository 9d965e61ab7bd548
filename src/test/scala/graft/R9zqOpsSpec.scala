package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-44 semantics (queries/StatsR9zq.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zqOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_price_endings matches the uniform-chi2 fold") {
    val ends = graft.tables.Tables.part(spark, sf)
      .select("p_retailprice").collect()
      .map(r => rndL(r.getDouble(0) * 100) % 100)
    val cnt = ends.groupBy(identity)
      .map { case (e, g) => (e, g.length.toLong) }
    val n = ends.length.toLong
    val so2 = cnt.values.map(o => o * o).sum
    val top = cnt.toArray.sortBy { case (e, o) => (-o, e) }.head
    val r = q("q_price_endings").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(100.0 * so2 / n - n, 6))
    assert(r.getLong(2) == top._1 && r.getLong(3) == top._2)
  }

  test("q_motif_cvp matches the subsequence fold") {
    val per = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).toArray.map { case (u, g) =>
        val seq0 = g.sortBy(e => (e._2, e._3)).map(_._4)
        var c = 0L; var cv = 0L; var m = 0L
        seq0.foreach {
          case "click" => c += 1
          case "view" => cv += c
          case "purchase" => m += cv
          case _ =>
        }
        (u, m)
      }
    val r = q("q_motif_cvp").collect()(0)
    assert(r.getLong(0) == per.count(_._2 > 0).toLong)
    assert(r.getLong(1) == per.map(_._2).sum)
    assert(r.getLong(2) == per.map(_._2).max)
  }

  test("q_wape_smape matches the naive-forecast fold") {
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
      val pairs = ys.sliding(2).map(a => (a(1), a(0))).toArray
      val sae = pairs.map(p => math.abs(p._1 - p._2)).sum
      val say = pairs.map(p => math.abs(p._1)).sum
      if (say <= 0) None
      else {
        val ssm = pairs.map(p => rndL(math.abs(p._1 - p._2) * 2e9
          / (math.abs(p._1) + math.abs(p._2)))).sum
        Some((t, pairs.length.toLong, rnd(sae.toDouble / say, 6),
          rnd(ssm.toDouble / pairs.length / 1e9, 6)))
      }
    }
    val got = q("q_wape_smape").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_nemenyi matches the squared-CD fold") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(e => (e._1, e._2))
      .map { case ((t, dd), g) => (t, dd, g.map(_._3).sum / g.length) }
      .toArray
    val byDay = daily.groupBy(_._2)
    val sums = daily.groupBy(_._1).map { case (t, g) =>
      val sr2 = g.map { case (_, dd, y) =>
        val ys = byDay(dd).map(_._3)
        2L * ys.count(_ < y) + ys.count(_ == y) + 1L
      }.sum
      (t, (g.length.toLong, sr2))
    }
    val k = sums.size.toLong
    val ts = sums.keys.toArray.sorted
    val want = (for {
      i <- ts.indices; j <- (i + 1) until ts.length
    } yield {
      val (na, sa) = sums(ts(i)); val (_, sb) = sums(ts(j))
      val d2 = sa - sb
      (ts(i), ts(j), rnd(math.abs(d2).toDouble / (2 * na), 6),
        3000000L * d2 * d2 > 7441984L * na * (k * (k + 1)))
    }).toArray
    val got = q("q_nemenyi").collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_nbd_fit matches the MoM fold") {
    val ks = graft.tables.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length.toLong).toArray
    val n = ks.length.toLong
    val sk = ks.sum; val skk = ks.map(x => x * x).sum
    val m = sk.toDouble / n
    val v = (n * skk - sk * sk).toDouble / (n.toDouble * (n - 1))
    val r = q("q_nbd_fit").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(m, 6))
    assert(r.getDouble(2) == rnd(v, 6))
    assert(r.getDouble(3) == rnd(m * m / (v - m), 6))
    assert(r.getDouble(4) == rnd(m / v, 6))
  }

  test("q_audience_overlap matches the set fold") {
    val tu = graft.tables.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val byT = tu.groupBy(_._1).map { case (t, g) =>
      (t, g.map(_._2).toSet)
    }
    val nUsers = tu.map(_._2).distinct.length.toLong
    val ts = byT.keys.toArray.sorted
    val want = (for {
      i <- ts.indices; j <- (i + 1) until ts.length
    } yield {
      val (a, b) = (byT(ts(i)), byT(ts(j)))
      val both = (a intersect b).size.toLong
      (ts(i), ts(j), both,
        rnd(both.toDouble / (a.size + b.size - both), 6),
        rnd(nUsers.toDouble * both / (a.size.toDouble * b.size), 6))
    }).toArray
    val got = q("q_audience_overlap").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }
}
