package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-6 key-level pins (queries/StatsR10f.scala + s_stream_hll):
  * the exact-register HyperLogLog folded brute-force in pure Scala
  * over sf0.001 — registers, estimator, and the linear-counting
  * branch; the streaming twin must equal the batch registers
  * (max-merge order independence).
  */
class R10fOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def fold: Map[String, (Long, Long, Double)] = {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).map { case (t, g) =>
      val regs = new Array[Int](64)
      g.foreach { case (_, u) =>
        val h = (u * 2654435761L) & 0x7FFFFFFFFFFFFFFFL
        val b = (h % 64L).toInt
        val rest = h / 64L
        val rho = if (rest == 0L) 58
          else 58 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        if (rho > regs(b)) regs(b) = rho
      }
      val v0 = regs.count(_ == 0).toLong
      val spw = regs.map(m => BigInt(1L << (58 - m))).sum
      val eRaw = 0.709 * 4096 * math.pow(2, 58) / spw.toDouble
      val e = if (eRaw <= 160.0 && v0 > 0) 64.0 * math.log(64.0 / v0)
        else eRaw
      val tru = g.map(_._2).distinct.length.toLong
      t -> (tru, 64L - v0, rnd(e, 4))
    }
  }

  test("q_hll_exact matches the register fold") {
    val want = fold.toArray.sortBy(_._1).map { case (t, (tru, nz, e)) =>
      (t, tru, nz, e, rnd(math.abs(e - tru) / tru, 6))
    }
    val got = q("q_hll_exact").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("s_stream_hll equals the batch registers (order independence)") {
    val want = fold.toArray.sortBy(_._1).map { case (t, (_, nz, e)) =>
      (t, nz, e)
    }
    val got = q("s_stream_hll").collect().map(r => (r.getString(0),
      r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    // n_events sanity: totals match the raw event counts
    val n = graft.tables.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    q("s_stream_hll").collect().foreach { r =>
      assert(r.getLong(1) == n(r.getString(0)))
    }
  }
}
