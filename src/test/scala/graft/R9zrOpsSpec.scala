package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-45 semantics (queries/StatsR9zr.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zrOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_hash_collisions matches the Knuth-bucket fold") {
    val keys = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).distinct
    val n = keys.length.toLong
    val want = Seq(1024L, 16384L, 262144L).map { m =>
      val occ = keys.map(k => (k * 2654435761L) % 4294967296L % m)
        .distinct.length.toLong
      (m, n, n - occ,
        rnd(n.toDouble - m * (1.0 - math.pow(1.0 - 1.0 / m,
          n.toDouble)), 4))
    }
    val got = q("q_hash_collisions").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
  }

  test("q_shard_skew matches the shard-moment fold") {
    val os = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def skew(keys: Array[Long], name: String) = {
      val shards = keys.map(k => (k * 2654435761L) % 4294967296L % 32)
        .groupBy(identity).values.map(_.length.toLong).toArray
      val ns = shards.length.toLong; val nr = shards.sum
      val mx = shards.max; val scc = shards.map(c => c * c).sum
      (name, ns, nr, rnd(mx.toDouble * ns / nr, 6),
        rnd(math.sqrt(ns.toDouble * scc / (nr.toDouble * nr) - 1.0), 6))
    }
    val want = Array(skew(os.map(_._2), "custkey"),
      skew(os.map(_._1), "orderkey"))
    val got = q("q_shard_skew").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_join_card_audit matches the textbook estimate fold") {
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val oks = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val pks = graft.tables.Tables.part(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0))
    val okSet = oks.toSet; val pkSet = pks.toSet
    def row(name: String, actual: Long, na: Long, da: Long, nb: Long,
        db: Long) = {
      val est = na.toDouble * nb / math.max(da, db)
      (name, actual, rnd(est, 4), rnd(est / actual, 6))
    }
    val want = Array(
      row("lineitem_orders", li.count(l => okSet(l._1)).toLong,
        li.length.toLong, li.map(_._1).distinct.length.toLong,
        oks.length.toLong, oks.distinct.length.toLong),
      row("lineitem_part", li.count(l => pkSet(l._2)).toLong,
        li.length.toLong, li.map(_._2).distinct.length.toLong,
        pks.length.toLong, pks.distinct.length.toLong))
    val got = q("q_join_card_audit").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_selectivity_audit matches the histogram fold") {
    val vs = graft.tables.Tables.events(spark, sf)
      .select("value").collect().map(_.getDouble(0))
    val bs = vs.map(v => math.min(math.floor(v / 10).toLong, 19L))
    val full = bs.count(_ >= 15).toLong
    val bnd = bs.count(_ == 14).toLong
    val actual = vs.count(_ > 147).toLong
    val r = q("q_selectivity_audit").collect()(0)
    assert(r.getLong(0) == vs.length.toLong)
    assert(r.getLong(1) == actual)
    assert(r.getDouble(2) == rnd(full + 0.3 * bnd, 4))
    assert(r.getDouble(3) == rnd((full + 0.3 * bnd) / actual, 6))
  }

  test("q_partition_prune_audit matches the month fold") {
    val ms = graft.tables.Tables.lineitem(spark, sf)
      .select(date_trunc("month", col("l_shipdate")).cast("date")
        .cast("string")).collect().map(_.getString(0))
    val byM = ms.groupBy(identity).map { case (m, g) =>
      (m, g.length.toLong) }
    val hit = byM.filter { case (m, _) =>
      m >= "1997-04-01" && m < "1997-07-01" }
    val r = q("q_partition_prune_audit").collect()(0)
    assert(r.getLong(0) == byM.size.toLong)
    assert(r.getLong(1) == hit.size.toLong)
    assert(r.getDouble(2) == rnd(hit.size.toDouble / byM.size, 6))
    assert(r.getDouble(3) ==
      rnd(hit.values.sum.toDouble / ms.length, 6))
  }

  test("q_broadcast_audit matches the byte-model fold") {
    def bytes(s0: String) = s0.getBytes(StandardCharsets.UTF_8).length
    def est(rows: Array[Array[String]], name: String, nNum: Int) =
      (name, rows.length.toLong,
        rows.map(r => 20L + 8L * nNum + r.map(bytes(_).toLong).sum).sum)
    val reg = graft.tables.Tables.region(spark, sf)
      .select("r_name").collect().map(r => Array(r.getString(0)))
    val nat = graft.tables.Tables.nation(spark, sf)
      .select("n_name").collect().map(r => Array(r.getString(0)))
    val sup = graft.tables.Tables.supplier(spark, sf)
      .select("s_name").collect().map(r => Array(r.getString(0)))
    val cus = graft.tables.Tables.customer(spark, sf)
      .select("c_name", "c_mktsegment").collect()
      .map(r => Array(r.getString(0), r.getString(1)))
    val par = graft.tables.Tables.part(spark, sf)
      .select("p_name", "p_brand", "p_type").collect()
      .map(r => Array(r.getString(0), r.getString(1), r.getString(2)))
    val want = Array(est(cus, "customer", 3), est(nat, "nation", 2),
      est(par, "part", 3), est(reg, "region", 1),
      est(sup, "supplier", 3)).sortBy(_._1)
      .map(t => (t._1, t._2, t._3, t._3 < 10L * 1024 * 1024))
    val got = q("q_broadcast_audit").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == want.toSeq)
  }
}
