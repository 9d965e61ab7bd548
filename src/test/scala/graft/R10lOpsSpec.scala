package graft

import java.math.{BigDecimal => JBD, BigInteger, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-13 key-level pins (queries/StatsR10l.scala +
  * s_stream_minhash): brute-force folds over collected sf0.001 data.
  */
class R10lOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_hosmer_lemeshow matches the snapped-decile fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("value"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    val g = ev.map { case (v, t) =>
      val pred = math.min(v / 200.0, 0.999999)
      (math.floor(pred * 10).toInt, rndL(pred * 1e6),
        if (t == "purchase") 1L else 0L)
    }.groupBy(_._1)
    val terms = g.toArray.map { case (_, rows) =>
      val n = rows.length.toLong
      val e1 = rows.map(_._2).sum / 1e6
      val o1 = rows.map(_._3).sum
      (n, (o1 - e1) * (o1 - e1) / (e1 * (1.0 - e1 / n)))
    }
    val want = (terms.length.toLong, terms.map(_._1).sum,
      rnd(terms.map(_._2).sum, 4), terms.length.toLong - 2)
    val r = q("q_hosmer_lemeshow").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      == want)
  }

  test("q_watson_u2 matches the snapped-term fold") {
    val dayUs = 86400000000L
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
        (unix_micros(col("ts")) % dayUs).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).map {
      case (t, rows) =>
        val us = rows.sortBy(e => (e._2, e._3)).map(_._2)
        val n = us.length.toLong
        val st = us.zipWithIndex.map { case (u, idx) =>
          val i = idx + 1L
          val dnum = n * 2 * u - (i * 2 - 1) * dayUs
          val term = (dnum / (n.toDouble * 2 * dayUs)) *
            (dnum / (n.toDouble * 2 * dayUs))
          rndL(term * 1e9)
        }.sum
        val w2 = st / 1e9 + 1.0 / (n * 12).toDouble
        val ubar = us.sum / (n.toDouble * dayUs.toDouble)
        (t, n, rnd(w2, 6),
          rnd(w2 - n * (ubar - 0.5) * (ubar - 0.5), 6))
    }
    val got = q("q_watson_u2").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_butterfly_count matches the C(n,2) fold") {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ords = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val brands = graft.tables.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val edges = li.map(l => (ords(l._1), brands(l._2))).distinct
    val byCust = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pairSupport = scala.collection.mutable.Map
      .empty[(String, String), Long]
    byCust.values.foreach { bs =>
      val s = bs.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        pairSupport((s(i), s(j))) =
          pairSupport.getOrElse((s(i), s(j)), 0L) + 1
    }
    val wedges = pairSupport.values.sum
    val bf = pairSupport.values.map(c => c * (c - 1) / 2).sum
    val want = (byCust.size.toLong,
      edges.map(_._2).distinct.length.toLong, edges.length.toLong,
      wedges, bf, pairSupport.values.max,
      rnd(bf / wedges.toDouble, 6))
    val r = q("q_butterfly_count").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)) == want)
  }

  test("s_stream_minhash matches the batch lane-minimum fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val M = BigInteger.valueOf(Long.MinValue).negate()
    val want = docs.groupBy(_._1).toArray.sortBy(_._1).flatMap {
      case (src, g) =>
        val xs = g.map(d =>
          new BigInteger(md5hex(d._2).take(15), 16))
        (0 until 16).map { i =>
          val mn = xs.map(x =>
            x.multiply(BigInteger.valueOf(2654435761L + 2L * i))
              .add(BigInteger.valueOf(2246822519L * i))
              .mod(M).longValueExact()).min
          (src, g.length.toLong, i.toLong, mn)
        }
    }
    val got = q("s_stream_minhash").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }
}
