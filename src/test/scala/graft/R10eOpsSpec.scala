package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-5 key-level pins (queries/StatsR10e.scala): brute-force
  * pure-Scala folds over the sf0.001 documents table. q_minhash_error
  * is an OMIT key — its fold here (estimate = equal signature lanes /
  * 32 vs the exact capped-pair jaccard) is the key-level gate.
  */
class R10eOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_substring_dup matches the windowed-md5 fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val occ = docs.flatMap { case (id, t) =>
      val toks = t.split(" ")
      if (toks.length < 10) Seq.empty
      else (0 to toks.length - 10).map(i =>
        (md5(toks.slice(i, i + 10).mkString(" ")), id))
    }
    val want = occ.groupBy(_._1).toArray
      .map { case (fp, g) =>
        (fp, g.map(_._2).distinct.length.toLong, g.length.toLong,
          g.map(_._2).min)
      }
      .filter(_._2 >= 2)
      .sortBy(x => (-x._3, x._1)).take(20)
    val got = q("q_substring_dup").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_substring_leakage matches the parity-split fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fps(t: String): Seq[String] = {
      val toks = t.split(" ")
      if (toks.length < 10) Seq.empty
      else (0 to toks.length - 10).map(i =>
        md5(toks.slice(i, i + 10).mkString(" ")))
    }
    val train = docs.filter(_._1 % 2 == 0).flatMap(d => fps(d._2)).toSet
    val leaked = docs.filter(_._1 % 2 == 1)
      .count(d => fps(d._2).exists(train.contains)).toLong
    val nTest = docs.count(_._1 % 2 == 1).toLong
    val r = q("q_substring_leakage").collect()(0)
    assert(r.getLong(0) == nTest)
    assert(r.getLong(1) == leaked)
    assert(r.getDouble(2) == rnd(leaked.toDouble / nTest, 6))
  }

  test("q_doremi_step weights normalize and rank by excess loss") {
    val rows = q("q_doremi_step").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // weights form a distribution (6dp rounding slack)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // EG monotonicity: higher excess loss → strictly higher weight
    val byExcess = rows.sortBy(_._4)
    assert(byExcess.map(_._5).zip(byExcess.drop(1).map(_._5))
      .forall { case (a, b) => a <= b })
    // excess losses are centered: weighted by docs they sum to ~0
    val num = rows.map(r => r._4 * r._2).sum
    assert(math.abs(num / rows.map(_._2).sum) < 1e-3)
  }

  test("q_minhash_error matches the lane-count fold (OMIT gate)") {
    graft.expr.Registry.ensure(spark)
    // exact capped pairs + sigs from the same memos the key reads —
    // the fold recomputes lanes/err from COLLECTED arrays, so this
    // pins the zip_with/aggregate expression and the lcm-grid algebra
    val pairs = graft.operators.EdgeGraph.pairs(spark, sf, "bigram", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sigs = graft.operators.EdgeGraph.minhashSigs(spark, sf, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toArray)
      .toMap
    val errs = pairs.map { case (a, b, j) =>
      val lanes = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      (lanes.toLong, math.abs(lanes * 31250L - rndL(j * 1e6)))
    }
    val n = pairs.length.toLong
    val r = q("q_minhash_error").collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == rnd(errs.map(_._1.toDouble / 32).sum / n, 4))
    assert(r.getDouble(2) == rnd(pairs.map(_._3).sum / n, 4))
    assert(r.getDouble(3) == rnd(errs.map(_._2).sum.toDouble / n / 1e6, 6))
    assert(r.getDouble(4) == rnd(errs.map(_._2).max / 1e6, 6))
  }
}
