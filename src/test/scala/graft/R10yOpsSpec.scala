package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-26 key-level pins: LZ76 series complexity (reference
  * parse) and the enrichment score (exact walk fold).
  */
class R10yOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Reference LZ76 phrase parse (shortest-novel-prefix). */
  private def lz76(s: Array[Long]): Int = {
    def occursIn(start: Int, len: Int, histEnd: Int): Boolean =
      (0 to histEnd - len).exists(i =>
        (0 until len).forall(j => s(i + j) == s(start + j)))
    var phrases = 0; var pos = 0
    while (pos < s.length) {
      var len = 1
      var grown = true
      while (grown && pos + len <= s.length) {
        grown = occursIn(pos, len, pos + len - 1)
        if (grown) {
          if (pos + len == s.length) grown = false else len += 1
        }
      }
      phrases += 1; pos += len
    }
    phrases
  }

  test("q_lz76_series matches the reference parse") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toArray.sortBy(_._1).map {
      case (t, rows) =>
        val ys = rows.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, g) => g.map(_._3).sum / g.length }
        val syms = (1 until ys.length)
          .map(i => math.signum((ys(i) - ys(i - 1)).toDouble).toLong)
          .toArray
        val c = lz76(syms)
        (t, syms.length, c,
          rnd(c * (math.log(syms.length.toDouble) / math.log(2.0))
            / syms.length, 4))
    }
    val got = q("q_lz76_series").collect().map(r => (r.getString(0),
      r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_enrichment_score matches the exact walk fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), (col("lang") === "en").as("hit"),
        split(col("text"), " ").as("l")).collect()
      .map { r =>
        val l = r.getSeq[String](2)
        (r.getLong(0), r.getBoolean(1),
          rndL(l.distinct.length * 1e6 / l.length))
      }
    val nh = docs.count(_._2).toLong
    val nm = docs.length - nh
    var dev = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
    docs.sortBy(d => (-d._3, d._1)).foreach { d =>
      dev += (if (d._2) nm else -nh)
      mx = math.max(mx, dev); mn = math.min(mn, dev)
    }
    val esp = mx / (nh.toDouble * nm); val esn = mn / (nh.toDouble * nm)
    val want = (docs.length.toLong, nh, rnd(esp, 6), rnd(esn, 6),
      rnd(if (esp > -esn) esp else esn, 6))
    val r = q("q_enrichment_score").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) == want)
  }
}
