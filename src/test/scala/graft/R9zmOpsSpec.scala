package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r9 wave-40 semantics (queries/StatsR9zm.scala): brute-force folds
  * over the collected sf0.001 tables.
  */
class R9zmOpsSpec extends AnyFunSuite with SparkFixture {

  // JBD.valueOf (shortest decimal repr) — Spark's Round semantics;
  // the exact-binary `new JBD(x)` diverges on repr-boundary values
  // like the type-4 p=.75 quantile here.
  private def rnd(x: Double, sc: Int): Double =
    JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue

  private def rndL(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValue

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val custRevSorted: Array[Long] = {
    val oc = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (oc(r.getLong(0)), rndL(r.getDouble(1) * 100)))
      .groupBy(_._1).toArray
      .map { case (c, g) => (c, g.map(_._2).sum) }
      .filter(_._2 > 0).sortBy(t => (t._2, t._1)).map(_._2)
  }

  private lazy val daily: Map[String, Array[Long]] =
    graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e3).toLong))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.groupBy(_._2).toArray.sortBy(_._1)
          .map { case (_, rows) => rows.map(_._3).sum / rows.length })
      }

  test("q_quantile_types matches the HF-type fold") {
    val xs = custRevSorted; val n = xs.length.toLong
    def x(i: Long): Long = xs((i - 1).toInt)
    val want = (1L to 3L).map { k =>
      val nk = n * k
      val t1 = x((nk + 3) / 4)
      val t2 = if (nk % 4 == 0) (x(nk / 4) + x(nk / 4 + 1)) / 200.0
        else x((nk + 3) / 4) * 2 / 200.0
      val lo4 = math.max(nk / 4, 1L)
      val r4 = if (nk / 4 >= 1) nk % 4 else 0L
      val t4 = (x(lo4) * (4 - r4)
        + (if (r4 > 0) x(lo4 + 1) * r4 else 0L)) / 400.0
      val h4 = (n - 1) * k + 4
      val r7 = h4 % 4
      val t7 = (x(h4 / 4) * (4 - r7)
        + (if (r7 > 0) x(h4 / 4 + 1) * r7 else 0L)) / 400.0
      (k / 4.0, rnd(t1 / 100.0, 2), rnd(t2, 2), rnd(t4, 2), rnd(t7, 2))
    }
    val got = q("q_quantile_types").collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_hampel matches the med/MAD window fold") {
    val want = daily.toArray.sortBy(_._1).map { case (t, ys) =>
      val wins = ys.indices.filter(i => i >= 3 && i + 3 < ys.length)
      val out = wins.count { i =>
        val arr = ys.slice(i - 3, i + 4).sorted
        val med = arr(3)
        val mad = arr.map(v => math.abs(v - med)).sorted.apply(3)
        10000L * math.abs(ys(i) - med) > 3L * 14826L * mad
      }
      (t, wins.length.toLong, out.toLong)
    }
    val got = q("q_hampel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q_tukey_biweight matches the one-step fold") {
    val want = daily.toArray.sortBy(_._1).flatMap { case (t, ys0) =>
      val ys = ys0.sorted
      val ng = ys.length
      val med2 = ys((ng + 1) / 2 - 1) + ys(ng / 2)
      val ads = ys0.map(y => math.abs(2 * y - med2)).sorted
      val mad2 = ads((ng + 1) / 2 - 1) + ads(ng / 2)
      if (mad2 <= 0) None
      else {
        val wts = ys0.map { y =>
          val dv = 2 * y - med2
          val u = dv.toDouble / (6 * mad2)
          val w = if (math.abs(u) < 1)
            rndL(math.pow(1.0 - u * u, 2) * 1e9) else 0L
          (w, dv)
        }
        val sw = wts.map(_._1).sum
        if (sw <= 0) None
        else {
          val swd = wts.map(p => p._1 * p._2).sum
          Some((t, ng.toLong,
            rnd((med2 / 2.0 + swd.toDouble / (2.0 * sw)) / 1000, 6)))
        }
      }
    }
    val got = q("q_tukey_biweight").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  /** Shared embedding per-label stats fold. */
  private lazy val embStats = {
    val rows = graft.tables.Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val byL = rows.groupBy(_._1)
    val muU = byL.map { case (l, g) =>
      (l, (0 until 64).map { d =>
        rndL(g.map(_._2(d)).sum / g.length * 1e6)
      }.toArray)
    }
    val e2U = byL.map { case (l, g) =>
      (l, g.flatMap(_._2).map(x => rndL(x * x * 1e9)).sum)
    }
    val nL = byL.map { case (l, g) => (l, g.length.toLong) }
    (rows.length.toLong, muU, e2U, nL)
  }

  test("q_calinski_harabasz matches the snapped SS fold") {
    val (n, muU, e2U, nL) = embStats
    val k = nL.size.toLong
    val wTot = nL.keys.map { l =>
      e2U(l) / 1e9 - nL(l) * muU(l).map(u => BigInt(u) * u).sum.toDouble / 1e12
    }.sum
    val gD = (0 until 64).map { d =>
      nL.keys.map(l => muU(l)(d) * nL(l)).sum.toDouble / n
    }
    val b = nL.keys.map { l =>
      (0 until 64).map { d =>
        nL(l) * (muU(l)(d) - gD(d)) * (muU(l)(d) - gD(d)) / 1e12
      }.sum
    }.sum
    val r = q("q_calinski_harabasz").collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == k)
    assert(math.abs(r.getDouble(2) - b) < 1e-3)
    assert(math.abs(r.getDouble(3) - wTot) < 1e-3)
    assert(math.abs(r.getDouble(4)
      - (b / (k - 1)) / (wTot / (n - k))) < 1e-4)
  }

  test("q_davies_bouldin matches the centroid-scatter fold") {
    val (_, muU, e2U, nL) = embStats
    val sL = nL.keys.map { l =>
      (l, math.sqrt((e2U(l) / 1e9
        - nL(l) * muU(l).map(u => BigInt(u) * u).sum.toDouble / 1e12)
        / nL(l)))
    }.toMap
    def dist(a: Int, b: Int): Double = math.sqrt(
      (0 until 64).map(d => (muU(a)(d) - muU(b)(d)).toDouble
        * (muU(a)(d) - muU(b)(d))).sum / 1e12)
    val labels = nL.keys.toArray
    val db = labels.map { l1 =>
      labels.filter(_ != l1).map(l2 =>
        (sL(l1) + sL(l2)) / dist(l1, l2)).max
    }.sum / labels.length
    val r = q("q_davies_bouldin").collect()(0)
    assert(r.getLong(0) == labels.length.toLong)
    assert(math.abs(r.getDouble(1) - db) < 1e-5)
  }

  test("q_dunn_centroid matches the separation/scatter fold") {
    val (_, muU, e2U, nL) = embStats
    val sL = nL.keys.map { l =>
      math.sqrt((e2U(l) / 1e9
        - nL(l) * muU(l).map(u => BigInt(u) * u).sum.toDouble / 1e12)
        / nL(l))
    }
    val labels = nL.keys.toArray.sorted
    val seps = for {
      i <- labels.indices; j <- (i + 1) until labels.length
    } yield math.sqrt((0 until 64).map { d =>
      (muU(labels(i))(d) - muU(labels(j))(d)).toDouble *
        (muU(labels(i))(d) - muU(labels(j))(d))
    }.sum / 1e12)
    val r = q("q_dunn_centroid").collect()(0)
    assert(r.getLong(0) == labels.length.toLong)
    assert(math.abs(r.getDouble(1) - seps.min) < 1e-5)
    assert(math.abs(r.getDouble(2) - sL.max) < 1e-5)
    assert(math.abs(r.getDouble(3) - seps.min / sL.max) < 1e-5)
  }
}
