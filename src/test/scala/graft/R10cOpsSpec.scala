package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-3 key-level pins (queries/StatsR10c.scala, s_stream_pps):
  * brute-force pure-Scala folds over the sf0.001 embeddings/events.
  */
class R10cOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (vec_id, label, embedding as doubles). */
  private lazy val em: Array[(Long, Int, Array[Double])] =
    graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))

  test("q_knn_shapley matches the suffix-sum fold") {
    val (qe, ql) = em.find(_._1 == 0).map(e => (e._3, e._2)).get
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ranked = em.filter(_._1 != 0)
      .map(e => (e._1, rnd(cos(e._3, qe), 6),
        if (e._2 == ql) 1L else 0L))
      .sortBy(x => (-x._2, x._1))
    val n = ranked.length
    val terms = ranked.zipWithIndex.map { case ((_, _, u), i0) =>
      val j = i0 + 1L
      if (i0 == n - 1) u * rndL(1e9 / n)
      else (u - ranked(i0 + 1)._3) * rndL(1e9 / math.max(5L, j))
    }
    val suffix = terms.scanRight(0L)(_ + _).dropRight(1)
    val want = ranked.zipWithIndex.map { case ((id, _, u), i0) =>
      (id, i0 + 1L, u, rnd(suffix(i0) / 1e9, 6))
    }.sortBy(x => (-x._4, x._1)).take(20)
    val got = q("q_knn_shapley").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_ecod_outlier matches the tail-ECDF fold") {
    val n = em.length
    val ndim = em.head._3.length
    val scores = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (d <- 0 until ndim) {
      val vs = em.map(e => (e._1, e._3(d)))
      vs.foreach { case (id, v) =>
        val cle = vs.count(_._2 <= v).toLong
        val cge = vs.count(_._2 >= v).toLong
        val tl = rndL(math.log(n.toDouble / cle) * 1e9)
        val tr = rndL(math.log(n.toDouble / cge) * 1e9)
        val (a, b) = scores.getOrElse(id, (0L, 0L))
        scores(id) = (a + tl, b + tr)
      }
    }
    val want = scores.toArray.map { case (id, (l, r)) =>
      (id, rnd(l / 1e9, 4), rnd(r / 1e9, 4),
        rnd(math.max(l, r) / 1e9, 4))
    }.sortBy(x => (-x._4, x._1)).take(20)
    val got = q("q_ecod_outlier").collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("s_stream_pps matches the batch priority fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        rndL(r.getDouble(2) * 100)))
    val want = ev.filter(_._3 > 0).groupBy(_._2).toArray.sortBy(_._1)
      .map { case (t, g) =>
        val scored = g.map { e =>
          val pr = (e._1 * 2654435761L) & 0x7FFFFFFFFFFFFFFFL
          val u = (pr + 1).toDouble / 9.223372036854776e18
          (e._3, e._3 / u, e._1)
        }.sortBy(x => (-x._2, x._3))
        val tau = if (scored.length > 50) scored(50)._2 else 0.0
        val est = scored.take(50).map(x => math.max(x._1.toDouble, tau)).sum
        val tw = g.map(_._3).sum
        (t, g.length.toLong, math.min(50, scored.length).toLong,
          rnd(tw / 100.0, 2), rnd(est / 100.0, 2),
          rnd(math.abs(est - tw) / tw, 6))
      }
    val got = q("s_stream_pps").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
  }
}
