package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-25 key-level pins (queries/StatsR10x.scala): PCA2,
  * partial tau, Hjorth, Theil-Sen CI, permutation test.
  */
class R10xOpsSpec extends AnyFunSuite with SparkFixture {

  private val z975 = 1.959963984540054

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_pca2 matches the closed-form eigen fold") {
    val f = graft.tables.Tables.events(spark, sf)
      .select(floor(col("value") * 1e3).cast("long").as("x"),
        expr("CAST(get_json_object(props, '$.k') AS LONG)").as("y"))
      .filter(col("y").isNotNull).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = f.length.toLong
    val sx = f.map(_._1).sum; val sy = f.map(_._2).sum
    val sxx = f.map(e => e._1 * e._1).sum
    val syy = f.map(e => e._2 * e._2).sum
    val sxy = f.map(e => e._1 * e._2).sum
    val vx = (n.toDouble * sxx - sx.toDouble * sx) / n / (n - 1)
    val vy = (n.toDouble * syy - sy.toDouble * sy) / n / (n - 1)
    val cc = (n.toDouble * sxy - sx.toDouble * sy) / n / (n - 1)
    val disc = math.sqrt((vx - vy) * (vx - vy) / 4 + cc * cc)
    val l1 = (vx + vy) / 2 + disc; val l2 = (vx + vy) / 2 - disc
    val want = (n, rnd(l1 / 1e6, 6), rnd(l2 / 1e6, 6),
      rnd(l1 / (l1 + l2), 6), rnd((l1 - vx) / cc, 6))
    val r = q("q_pca2").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4)) == want)
  }

  private lazy val dailyTriple: Array[(String, Long, Long, Long)] = {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm"),
        col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    ev.groupBy(_._1).toArray.sortBy(_._1).map { case (d, g) =>
      (d, g.map(_._2).sum / g.length,
        g.count(_._3 == "click").toLong * 1000000L / g.length,
        g.count(_._3 == "error").toLong * 1000000L / g.length)
    }
  }

  test("q_partial_tau matches the concordance fold") {
    val t = dailyTriple
    var cxy = 0.0; var cxz = 0.0; var cyz = 0.0; var np = 0L
    for (i <- t.indices; j <- (i + 1) until t.length) {
      def sg(a: Long, b: Long) = math.signum((b - a).toDouble)
      cxy += sg(t(i)._2, t(j)._2) * sg(t(i)._3, t(j)._3)
      cxz += sg(t(i)._2, t(j)._2) * sg(t(i)._4, t(j)._4)
      cyz += sg(t(i)._3, t(j)._3) * sg(t(i)._4, t(j)._4)
      np += 1
    }
    val (txy, txz, tyz) = (cxy / np, cxz / np, cyz / np)
    val want = (np, rnd(txy, 6), rnd(txz, 6), rnd(tyz, 6),
      rnd((txy - txz * tyz)
        / math.sqrt((1.0 - txz * txz) * (1.0 - tyz * tyz)), 6))
    val r = q("q_partial_tau").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4)) == want)
  }

  private lazy val dm: Map[String, Array[Long]] = {
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("d"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    ev.groupBy(_._1).map { case (t, rows) =>
      t -> rows.groupBy(_._2).toArray.sortBy(_._1)
        .map { case (_, g) => g.map(_._3).sum / g.length }
    }
  }

  test("q_hjorth matches the difference fold") {
    val want = dm.toArray.sortBy(_._1).flatMap { case (t, ys) =>
      val d1 = (1 until ys.length).map(i => ys(i) - ys(i - 1)).toArray
      val d2 = (1 until d1.length).map(i => d1(i) - d1(i - 1)).toArray
      if (d2.length >= 2) {
        def pv(xs: Array[Long]): Double = {
          val n = xs.length.toLong; val s = xs.sum
          val qq = xs.map(x => x * x).sum
          (n.toDouble * qq - s.toDouble * s) / n / n
        }
        val v0 = pv(ys); val v1 = pv(d1); val v2 = pv(d2)
        val mob = math.sqrt(v1 / v0)
        Some((t, ys.length.toLong, rnd(v0 / 1e6, 4), rnd(mob, 6),
          rnd(math.sqrt(v2 / v1) / mob, 6)))
      } else None
    }
    val got = q("q_hjorth").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_theilsen_ci matches the rank-CI fold") {
    val want = dm.toArray.sortBy(_._1).map { case (t, ys) =>
      val sls = (for {
        i <- ys.indices; j <- (i + 1) until ys.length
      } yield (ys(j) - ys(i)).toDouble / (j - i)).sorted.toArray
      val nn = sls.length
      val med = if (nn % 2 == 1) sls((nn + 1) / 2 - 1)
        else (sls(nn / 2 - 1) + sls(nn / 2)) / 2
      val n = (1.0 + math.sqrt(1.0 + 8.0 * nn)) / 2
      val cz = z975 * math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
      val lo = math.max(1L, math.floor((nn - cz) / 2).toLong)
      val hi = math.min(nn.toLong, math.ceil((nn + cz) / 2 + 1).toLong)
      (t, nn.toLong, rnd(med / 1e3, 6),
        rnd(sls(lo.toInt - 1) / 1e3, 6), rnd(sls(hi.toInt - 1) / 1e3, 6))
    }
    val got = q("q_theilsen_ci").collect().map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_permutation_test matches the md5-seeded fold") {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"),
        floor(col("value") * 1e3).cast("long").as("vm")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def diff(grp: Long => Int): Double = {
      val g0 = ev.filter(e => grp(e._1) == 0)
      val g1 = ev.filter(e => grp(e._1) == 1)
      math.abs(g0.map(_._2).sum.toDouble / g0.length
        - g1.map(_._2).sum.toDouble / g1.length)
    }
    val obs = diff(u => (u % 2).toInt)
    val perms = (1 to 20).map { k =>
      diff(u => Integer.parseInt(md5hex(s"${u}_$k").take(4), 16) % 2)
    }
    val want = (20L, rnd(obs / 1e3, 4), rnd(perms.max / 1e3, 4),
      rnd((perms.count(_ >= obs) + 1) / 21.0, 6))
    val r = q("q_permutation_test").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3)) == want)
  }
}
