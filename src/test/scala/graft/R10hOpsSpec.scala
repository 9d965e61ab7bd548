package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-8 key-level pins (queries/StatsR10h.scala +
  * s_stream_provenance): pure-Scala folds over sf0.001.
  */
class R10hOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_ctr_position matches the session-rank fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val perPos = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    ev.groupBy(_._1).values.foreach { g =>
      val sorted = g.toArray.sortBy(e => (e._3, e._2))
      var pos = 0L; var prev = Long.MinValue
      sorted.foreach { e =>
        pos = if (prev == Long.MinValue || e._3 - prev > 1800000000L) 1L
          else pos + 1
        prev = e._3
        if (pos <= 10) {
          val (n, c) = perPos.getOrElse(pos, (0L, 0L))
          perPos(pos) = (n + 1, c + (if (e._4 == "click") 1L else 0L))
        }
      }
    }
    val (n1, c1) = perPos(1L)
    val want = perPos.toArray.sortBy(_._1).map { case (p, (n, c)) =>
      (p, n, c, rnd(c.toDouble / n, 6),
        rnd((c.toDouble / n) / (c1.toDouble / n1), 6))
    }
    val got = q("q_ctr_position").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("s_stream_provenance matches the md5-chain fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).toArray.sortBy(_._1)
      .map { case (src, g) =>
        val hs = g.sortBy(_._1).map(d => md5(d._3))
        val chain = hs.tail.foldLeft(hs.head)((c, h) => md5(c + h))
        (src, g.length.toLong, chain)
      }
    val got = q("s_stream_provenance").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == want.toSeq)
  }
}
