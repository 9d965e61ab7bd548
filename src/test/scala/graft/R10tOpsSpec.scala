package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-21 key-level pins: budget selection (PrefixSum path) and
  * the streaming log2 histogram batch twin.
  */
class R10tOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_budget_select matches the prefix-greedy fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("l")).collect()
      .map { r =>
        val l = r.getSeq[String](1)
        val tok = l.length.toLong
        val qu = rndL(l.distinct.length * 1e6 / l.length)
        (r.getLong(0), tok, qu, qu * 1000 / tok)
      }
    val budget = docs.map(_._2).sum / 10
    def run(name: String, sorted: Array[(Long, Long, Long, Long)]) = {
      var cum = 0L
      val sel = sorted.takeWhile { d => cum += d._2; cum <= budget }
      (name, budget, sel.length.toLong, sel.map(_._2).sum,
        rnd(sel.map(_._3).sum.toDouble / sel.length / 1e6, 6))
    }
    val want = Seq(
      run("by_density", docs.sortBy(d => (-d._4, d._1))),
      run("by_quality", docs.sortBy(d => (-d._3, d._1))))
    val got = q("q_budget_select").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("s_stream_log2_hist equals the q_log2_hist batch twin") {
    val a = q("s_stream_log2_hist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val b = q("q_log2_hist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }
}
