package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 wave-22 key-level pins (queries/StatsR10u.scala): VIF, sample
  * LOF, Mahalanobis — brute-force folds over sf0.001.
  */
class R10uOpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd(x: Double, sc: Int): Double =
    new JBD(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val feats: Array[(Long, Long, Long, Long)] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_id"),
        floor(col("value") * 1e3).cast("long").as("x"),
        expr("CAST(get_json_object(props, '$.k') AS LONG)").as("y"),
        hour(col("ts")).cast("long").as("z"))
      .filter(col("y").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("q_vif3 matches the closed-form fold") {
    val n = feats.length.toLong
    def corr(u: Array[Long], v: Array[Long]): Double = {
      val su = u.sum; val sv = v.sum
      val suu = u.map(a => a * a).sum; val svv = v.map(a => a * a).sum
      val suv = u.zip(v).map { case (a, b) => a * b }.sum
      (n.toDouble * suv - su.toDouble * sv) /
        math.sqrt((n.toDouble * suu - su.toDouble * su)
          * (n.toDouble * svv - sv.toDouble * sv))
    }
    val xs = feats.map(_._2); val ys = feats.map(_._3)
    val zs = feats.map(_._4)
    val r12 = corr(xs, ys); val r13 = corr(xs, zs)
    val r23 = corr(ys, zs)
    def r2(a: Double, b: Double, c: Double): Double =
      (a * a + b * b - 2.0 * a * b * c) / (1.0 - c * c)
    val want = (n, rnd(r12, 6), rnd(r13, 6), rnd(r23, 6),
      rnd(1.0 / (1.0 - r2(r12, r13, r23)), 4),
      rnd(1.0 / (1.0 - r2(r12, r23, r13)), 4),
      rnd(1.0 / (1.0 - r2(r13, r23, r12)), 4))
    val r = q("q_vif3").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      == want)
  }

  test("q_lof_sample matches the density fold") {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val knn = e.map { case (a, ea) =>
      a -> e.filter(_._1 != a)
        .map { case (b, eb) => (1.0 - cos(ea, eb), b) }
        .sortBy(t => (t._1, t._2)).take(5)
    }.toMap
    val kd = knn.map { case (a, ns) => a -> ns.map(_._1).max }
    val lrd = knn.map { case (a, ns) =>
      a -> 1.0 / (ns.map { case (d0, b) =>
        math.max(kd(b), d0) }.sum / ns.length)
    }
    val lof = knn.map { case (a, ns) =>
      (a, lrd(a), ns.map(x => lrd(x._2)).sum / ns.length / lrd(a))
    }.toArray
    val want = lof.map(x => (x._1, rnd(x._2, 6), rnd(x._3, 6)))
      .sortBy(x => (-x._3, x._1)).take(10)
    val got = q("q_lof_sample").collect().map(r => (r.getLong(0),
      r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_mahalanobis2 matches the 2x2 closed-form fold") {
    val n = feats.length.toLong
    val xs = feats.map(_._2); val ys = feats.map(_._3)
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
    val sxy = feats.map(e => e._2 * e._3).sum
    val mx = sx.toDouble / n; val my = sy.toDouble / n
    val vx = (n.toDouble * sxx - sx.toDouble * sx) / n / (n - 1)
    val vy = (n.toDouble * syy - sy.toDouble * sy) / n / (n - 1)
    val cxy = (n.toDouble * sxy - sx.toDouble * sy) / n / (n - 1)
    val want = feats.map { case (id, x, y, _) =>
      val dx = x - mx; val dy = y - my
      (id, rnd((vy * dx * dx + vx * dy * dy - 2.0 * cxy * dx * dy)
        / (vx * vy - cxy * cxy), 6))
    }.sortBy(x => (-x._2, x._1)).take(20)
    val got = q("q_mahalanobis2").collect().map(r => (r.getLong(0),
      r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }
}
