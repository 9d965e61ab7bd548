package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-12 key-level pins (queries/StatsR10k.scala): DSIR
  * weights, hubness, Borda aggregation, and stratified ATT
  * re-derived by brute-force folds over collected sf0.001 tables.
  */
class R10kOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (doc_id, source, tokens) with Spark's own split semantics. */
  private lazy val docs: Array[(Long, String, Long, Array[String])] =
    graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"),
        split(col("text"), " ").as("l"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getSeq[String](3).toArray))

  test("q_dsir_weights matches the hashed-bigram fold") {
    val bg = docs.filter(_._4.length >= 2).flatMap { case (id, src, _, l) =>
      (0 until l.length - 1).map(i =>
        (id, src, Integer.parseInt(
          md5hex(l(i) + " " + l(i + 1)).take(4), 16) % 256))
    }
    val cs = bg.groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val ct = bg.filter(_._2 == "src0").groupBy(_._3)
      .map { case (b, g) => b -> g.length.toLong }
    val ss = cs.values.sum; val tt = ct.values.sum
    val lr = cs.map { case (b, c) =>
      val t = ct.getOrElse(b, 0L)
      b -> rndL(math.log(((t + 1) / (tt + 256).toDouble)
        / ((c + 1) / (ss + 256).toDouble)) * 1e9)
    }
    val perDoc = bg.groupBy(d => (d._1, d._2)).toArray.map {
      case ((_, src), g) =>
        val slr = g.map(x => lr(x._3)).sum
        (src, rndL(slr.toDouble / g.length / 1e3))
    }
    val want = perDoc.groupBy(_._1).toArray.sortBy(_._1).map {
      case (src, g) =>
        val sw = g.map(_._2).sum
        (src, g.size.toLong, rnd(sw.toDouble / g.size / 1e6, 6),
          rnd(g.count(_._2 > 0) / g.size.toDouble, 6))
    }
    val got = q("q_dsir_weights").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_hubness matches the brute-force k-occurrence fold") {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = e.filter(v => ((v._1 % 10) + 10) % 10 == 0)
    val kocc = scala.collection.mutable.Map.empty[Long, Long]
    qs.foreach { case (aId, aEmb) =>
      e.filter(_._1 != aId)
        .map { case (bId, bEmb) => (bId, cos(aEmb, bEmb)) }
        .sortBy { case (bId, c) => (-c, bId) }
        .take(5)
        .foreach { case (bId, _) =>
          kocc(bId) = kocc.getOrElse(bId, 0L) + 1 }
    }
    val cts = e.map(v => kocc.getOrElse(v._1, 0L))
    val n = cts.length.toLong
    val s1 = cts.sum; val s2 = cts.map(c => c * c).sum
    val s3 = cts.map(c => c * c * c).sum
    val mean = s1.toDouble / n
    val m2 = s2.toDouble / n - mean * mean
    val m3 = (s3.toDouble / n - 3.0 * mean * (s2.toDouble / n)
      + 2.0 * mean * mean * mean)
    val thr = 2.0 * 5 * qs.length / n
    val want = (qs.length.toLong, n, cts.max,
      rnd(m3 / math.pow(m2, 1.5), 4),
      rnd(cts.count(_.toDouble > thr) / n.toDouble, 6))
    val r = q("q_hubness").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4)) == want)
  }

  test("q_borda_count matches the three-judge fold") {
    val m = docs.map { case (id, _, nc, l) =>
      val wc = l.groupBy(identity).map(_._2.length.toLong)
      (id, nc, l.length.toLong, wc.size.toLong, wc.max)
    }
    def crank[A](xs: Array[(Long, A)])(implicit o: Ordering[A])
        : Map[Long, Long] =
      xs.map { case (id, v) =>
        id -> (xs.count(x => o.lt(x._2, v)) + 1).toLong
      }.toMap
    val r1 = crank(m.map(x => (x._1, -x._2)))
    val r2 = crank(m.map(x => (x._1, -(x._4.toDouble / x._3))))
    val r3 = crank(m.map(x => (x._1, x._5.toDouble / x._3)))
    val nn = m.length.toLong
    val want = m.map(x => (x._1, nn * 3 - r1(x._1) - r2(x._1) - r3(x._1),
        r1(x._1), r2(x._1), r3(x._1)))
      .sortBy(x => (-x._2, x._1)).take(20)
    val got = q("q_borda_count").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_psm_strat matches the stratified fold") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select((pmod(col("user_id"), lit(2)) === 0).as("tr"),
        expr("CAST(get_json_object(props, '$.k') AS LONG)").as("k"),
        floor(col("value") * 1e3).cast("long").as("vm"))
      .collect()
      .map(r => (r.getBoolean(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
    val g = ev.groupBy(e => e._2.map(k => math.min(k / 20, 4L)))
      .map { case (_, rows) =>
        val t = rows.filter(_._1); val c = rows.filterNot(_._1)
        (t.length.toLong, t.map(_._3).sum,
          c.length.toLong, c.map(_._3).sum)
      }.filter(x => x._1 > 0 && x._3 > 0).toArray
    val n1 = g.map(_._1).sum; val n0 = g.map(_._3).sum
    val attNum = g.map(x =>
      x._1 * (x._2 / x._1.toDouble - x._4 / x._3.toDouble)).sum
    val s1 = g.map(_._2).sum; val s0 = g.map(_._4).sum
    val want = (g.length.toLong, n1, n0,
      rnd(attNum / n1 / 1e3, 6),
      rnd((s1 / n1.toDouble - s0 / n0.toDouble) / 1e3, 6))
    val r = q("q_psm_strat").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4)) == want)
  }
}
