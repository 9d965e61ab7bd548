package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-21 semantics (queries/StatsR9u.scala): dedup/curation
  * audit folds over the collected sf0.001 documents and the memoized
  * component/pair legs.
  */
class R9uOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(Long, String, Array[String])] =
    graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1)))

  private lazy val comp: Map[Long, Long] =
    graft.operators.EdgeGraph.components(spark, sf, "bigram", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private lazy val mid: Long = (docs.map(_._1).max + 1) / 2

  test("q_cross_source_dups matches the family fold") {
    val src = docs.map(d => d._1 -> d._2).toMap
    val fams = comp.groupBy(_._2).map { case (l, g) =>
      (l, g.size.toLong, g.keys.map(src).toSet.size.toLong)
    }.filter(_._2 >= 2)
    val multi = fams.size.toLong
    val cross = fams.count(_._3 >= 2).toLong
    val docsCross = fams.filter(_._3 >= 2).map(_._2).sum
    val r = q("q_cross_source_dups").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === multi)
    assert(r(0).getLong(1) === cross)
    assert(r(0).getLong(2) === docsCross)
    assert(math.abs(r(0).getDouble(3)
      - rnd(cross.toDouble / multi * 1e4) / 1e4) <= 1e-9)
  }

  test("q_prefix_templates matches the prefix fold") {
    val fams = docs.map(_._3.take(5).mkString(" "))
      .groupBy(identity).map(_._2.length.toLong)
    val tmpl = fams.filter(_ >= 3)
    val r = q("q_prefix_templates").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === docs.length.toLong)
    assert(r(0).getLong(1) === tmpl.size.toLong)
    assert(r(0).getLong(2) === tmpl.sum)
    assert(r(0).getLong(3) === tmpl.max)
    assert(math.abs(r(0).getDouble(4)
      - rnd(tmpl.sum.toDouble / docs.length * 1e4) / 1e4) <= 1e-9)
  }

  test("q_incremental_dedup matches the midpoint fold") {
    val pairs = graft.operators.EdgeGraph.pairs(spark, sf, "bigram", 0.3)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dupNew = pairs.flatMap { case (a, b) =>
      if (a >= mid && b < mid) Some(a)
      else if (b >= mid && a < mid) Some(b)
      else None
    }.distinct
    val nNew = docs.count(_._1 >= mid).toLong
    val r = q("q_incremental_dedup").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === mid)
    assert(r(0).getLong(1) === nNew)
    assert(r(0).getLong(2) === dupNew.length.toLong)
    assert(math.abs(r(0).getDouble(3)
      - rnd(dupNew.length.toDouble / nNew * 1e4) / 1e4) <= 1e-9)
  }

  test("q_filter_funnel matches the cumulative fold") {
    val stop = Set("the", "a", "of", "and", "in")
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    for ((id, _, toks) <- docs) {
      val nt = toks.length.toLong
      val ns = toks.count(stop.contains).toLong
      val p1 = nt >= 20
      val p2 = p1 && ns * 50 >= nt
      val p3 = p2 && comp(id) == id
      if (p1) n1 += 1
      if (p2) n2 += 1
      if (p3) n3 += 1
    }
    val r = q("q_filter_funnel").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === docs.length.toLong)
    assert(r(0).getLong(1) === n1)
    assert(r(0).getLong(2) === n2)
    assert(r(0).getLong(3) === n3)
    assert(math.abs(r(0).getDouble(4)
      - rnd(n3.toDouble / docs.length * 1e4) / 1e4) <= 1e-9)
  }

  test("q_oov_rate matches the vocab fold") {
    val oldV = docs.filter(_._1 < mid).flatMap(_._3).toSet
    val newToks = docs.filter(_._1 >= mid).flatMap(_._3)
    val newV = newToks.distinct
    val oov = newV.filterNot(oldV.contains)
    val oovTokens = newToks.count(t => !oldV.contains(t)).toLong
    val r = q("q_oov_rate").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === oldV.size.toLong)
    assert(r(0).getLong(1) === newV.length.toLong)
    assert(r(0).getLong(2) === oov.length.toLong)
    assert(math.abs(r(0).getDouble(3)
      - rnd(oov.length.toDouble / newV.length * 1e4) / 1e4) <= 1e-9)
    assert(math.abs(r(0).getDouble(4)
      - rnd(oovTokens.toDouble / newToks.length * 1e4) / 1e4) <= 1e-9)
  }

  test("q_dedup_savings matches the keeper fold") {
    var dupes = 0L; var tokTot = 0L; var tokSaved = 0L
    for ((id, _, toks) <- docs) {
      tokTot += toks.length
      if (comp(id) != id) { dupes += 1; tokSaved += toks.length }
    }
    val r = q("q_dedup_savings").collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === docs.length.toLong)
    assert(r(0).getLong(1) === dupes)
    assert(r(0).getLong(2) === tokTot)
    assert(r(0).getLong(3) === tokSaved)
    assert(math.abs(r(0).getDouble(4)
      - rnd(tokSaved.toDouble / tokTot * 1e4) / 1e4) <= 1e-9)
  }
}
