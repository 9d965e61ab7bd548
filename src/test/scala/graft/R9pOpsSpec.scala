package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-16 semantics (queries/StatsR9p.scala): folds over the
  * collected sf0.001 tables; EIP-55 pinned by the public spec
  * vectors plus corpus case-structure invariants.
  */
class R9pOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val evs: Array[(Long, Long, String, String, Double)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).cast("string"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4)))

  private lazy val dmean: Map[String, Array[(String, Long)]] =
    evs.groupBy(_._3).map { case (t, g) =>
      t -> g.groupBy(_._4).map { case (d0, gg) =>
        (d0, gg.map(e => math.floor(e._5 * 1e3).toLong).sum / gg.length)
      }.toArray.sortBy(_._1)
    }

  test("q_eth_eip55: public vectors + corpus case invariants") {
    // the four EIP-55 spec examples (public test vectors)
    assert(graft.expr.KeccakCore.toChecksumAddress(
      "0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed")
      === "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
    assert(graft.expr.KeccakCore.toChecksumAddress(
      "0xfb6916095ca1df60bb79ce92ce3ea74c37c5d359")
      === "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359")
    assert(graft.expr.KeccakCore.toChecksumAddress(
      "0xdbf03b407c01e7cd3cbea99509d93f8dddc8c6fb")
      === "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB")
    assert(graft.expr.KeccakCore.toChecksumAddress(
      "0xd1220a0cf47c7b9be7a2e6ba89f429762e7b9adb")
      === "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb")
    val rows = q("q_eth_eip55").collect()
    assert(rows.length === evs.length)
    var upper = 0
    for (r <- rows) {
      val addr = r.getString(1); val ca = r.getString(2)
      assert(ca.startsWith("0x"))
      assert(ca.substring(2).toLowerCase === addr)
      // re-derive through the same pure-Scala core
      assert(ca === graft.expr.KeccakCore.toChecksumAddress("0x" + addr))
      if (ca.exists(_.isUpper)) upper += 1
    }
    assert(upper > 0) // keccak produces SOME high nibbles
  }

  test("q_eth_rlp matches the RLP integer fold") {
    def rlp(v: Long): String = {
      if (v == 0) "80"
      else {
        var h = java.lang.Long.toHexString(v)
        if (h.length % 2 == 1) h = "0" + h
        if (v < 128) h
        else java.lang.Integer.toHexString(128 + h.length / 2) + h
      }
    }
    val got = q("q_eth_rlp").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    for ((id, _, _, _, _) <- evs) assert(got(id) === rlp(id))
  }

  test("q_rolling_beta matches the cleared window fold") {
    val mkt = evs.groupBy(_._4).map { case (d0, g) =>
      (d0, g.map(e => math.floor(e._5 * 1e3).toLong).sum / g.length)
    }.toArray.sortBy(_._1)
    val rm = mkt.sliding(2).collect { case Array((_, py), (d1, y)) =>
      (d1, rnd(math.log(y.toDouble / py) * 1e6))
    }.toMap
    val got = q("q_rolling_beta").collect()
      .map(r => ((r.getString(0), r.get(1).toString), r.getDouble(2)))
      .toMap
    var checked = 0
    for ((t, ds) <- dmean) {
      val rs = ds.sliding(2).collect { case Array((_, py), (d1, y)) =>
        (d1, rnd(math.log(y.toDouble / py) * 1e6))
      }.toArray.flatMap { case (d1, r0) => rm.get(d1).map(m => (d1, r0, m)) }
      for (i <- 13 until rs.length) {
        val w = rs.slice(i - 13, i + 1)
        val sxy = w.map(x => x._2 * x._3).sum
        val sx = w.map(_._2).sum
        val sy = w.map(_._3).sum
        val syy = w.map(x => x._3 * x._3).sum
        if (syy * 14 > sy * sy) {
          val beta = (sxy * 14 - sx * sy).toDouble / (syy * 14 - sy * sy)
          assert(math.abs(got((t, rs(i)._1)) - rnd(beta * 1e6) / 1e6)
            <= 1e-9)
          checked += 1
        }
      }
    }
    assert(checked === got.size)
  }

  test("q_topic_coherence matches the UMass fold") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).distinct))
    val byTok = docs.flatMap(d => d._3.map(t => (t, d._1)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).toSet }
    val got = q("q_topic_coherence").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    for ((src, g) <- docs.groupBy(_._2)) {
      val counts = g.flatMap(d => d._3.map(t => (t, d._1)))
        .groupBy(_._1).map { case (t, gg) => t -> gg.length.toLong }
      val top = counts.toArray.sortBy { case (t, c) => (-c, t) }
        .take(10).map(_._1)
      var su = 0L; var np = 0L
      for (l <- top.indices; m <- l + 1 until top.length) {
        val dl = byTok(top(l)).size.toLong
        val dmn = (byTok(top(l)) & byTok(top(m))).size.toLong
        su += rnd(math.log((dmn + 1).toDouble / dl) * 1e9)
        np += 1
      }
      val (gn, gc) = got(src)
      assert(gn === np)
      assert(math.abs(gc - rnd(su / 1e9 * 1e4) / 1e4) <= 1e-9)
    }
  }

  test("q_iqr_fences matches the x8-cleared fold") {
    val got = q("q_iqr_fences").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    for ((t, ds) <- dmean) {
      val ys = ds.map(_._2).sorted
      val n = ys.length.toLong
      def v(q4: Int): Long = {
        val pos4 = (n - 1) * q4
        val lo = (pos4 / 4).toInt; val f = pos4 % 4
        ys(lo) * (4 - f) + (if (f > 0) ys(lo + 1) * f else 0L)
      }
      val v25 = v(1); val v75 = v(3)
      val lo8 = v25 * 2 - (v75 - v25) * 3
      val hi8 = v75 * 2 + (v75 - v25) * 3
      val nLow = ys.count(_ * 8 < lo8).toLong
      val nHigh = ys.count(_ * 8 > hi8).toLong
      val (gn, g1, g3, gl, gh) = got(t)
      assert(gn === n)
      assert(math.abs(g1 - rnd(v25 / 4000.0 * 1e6) / 1e6) <= 1e-9)
      assert(math.abs(g3 - rnd(v75 / 4000.0 * 1e6) / 1e6) <= 1e-9)
      assert(gl === nLow)
      assert(gh === nHigh)
    }
  }

  test("q_log2_hist matches the bit-length fold") {
    val got = q("q_log2_hist").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exp = evs.map(e => (e._3, rnd(e._5 * 100)))
      .filter(_._2 >= 1)
      .map { case (t, v) => (t, (63 - java.lang.Long
        .numberOfLeadingZeros(v)).toLong) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    assert(got.keySet === exp.keySet.toSet)
    for (((t, b), n) <- exp) {
      val (lo, hi, gn) = got((t, b))
      assert(lo === (1L << b))
      assert(hi === (1L << (b + 1)) - 1)
      assert(gn === n)
    }
  }
}
