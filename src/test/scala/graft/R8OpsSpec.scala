package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 orphan-key semantics, beyond what the DuckDB oracles prove:
  * isotonic fit vs a pure-Scala pool-adjacent-violators reference
  * (including a 400-day series that the r7 n³ lattice could not
  * afford), one-way ANOVA vs closed-form exact-centi moments, and
  * decision-stump information gain vs a brute-force split scan. */
class R8OpsSpec extends AnyFunSuite with SparkFixture {

  /** Sequential PAV (isotonic increasing, unit weights): merge
    * adjacent blocks while the left mean exceeds the right mean. */
  private def pav(ys: Array[Double]): Array[Double] = {
    case class Block(sum: Double, n: Long)
    val st = scala.collection.mutable.ArrayBuffer[Block]()
    for (y <- ys) {
      st += Block(y, 1L)
      while (st.length >= 2 && {
          val a = st(st.length - 2); val b = st.last
          a.sum / a.n > b.sum / b.n
        }) {
        val b = st.remove(st.length - 1)
        val a = st.remove(st.length - 1)
        st += Block(a.sum + b.sum, a.n + b.n)
      }
    }
    st.toArray.flatMap(b => Array.fill(b.n.toInt)(b.sum / b.n))
  }

  /** The query's exact daily snapping: Σ floor(v·1e6) per day, then
    * integral division by the day count. */
  private def dailyMmu(rows: Array[(java.sql.Date, Double)]): Array[Long] =
    rows.groupBy(_._1).toArray.sortBy(_._1.toString).map { case (_, vs) =>
      vs.map(r => math.floor(r._2 * 1e6).toLong).sum / vs.length
    }

  test("q_isotonic_fit matches sequential PAV on the events table") {
    val got = SparkEntry.queries("q_isotonic_fit")(spark, sf).collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("value")).collect()
      .map(r => (r.getDate(0), r.getDouble(1)))
    val mmu = dailyMmu(raw)
    val ref = pav(mmu.map(_.toDouble))
    assert(got.length === mmu.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("mean_v") - mmu(i) / 1e6) <= 1e-4)
      assert(math.abs(r.getAs[Double]("iso_fit") - ref(i) / 1e6) <= 1e-4,
        s"day $i: got ${r.getAs[Double]("iso_fit")}, PAV ${ref(i) / 1e6}")
    }
    // the fit is monotone nondecreasing by construction
    got.sliding(2).foreach { w =>
      assert(w(1).getAs[Double]("iso_fit")
        >= w(0).getAs[Double]("iso_fit") - 1e-9)
    }
  }

  test("q_isotonic_fit handles a 400-day series (n² lattice, not n³)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iso400").toString
    // deterministic LCG noise with a downward drift → many violators
    val rows = (0 until 400).map { i =>
      val noise = (((i.toLong * 1103515245L + 12345L) >>> 16) % 1000L) / 10.0
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2025, 1, 1).plusDays(i.toLong).atTime(12, 0)),
        noise + i * 0.05)
    }
    rows.toDF("ts", "value").write.parquet(s"$dir/events.parquet")
    val t0 = System.nanoTime()
    val got = SparkEntry.queries("q_isotonic_fit")(spark, dir).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.length === 400)
    val mmu = dailyMmu(rows.map(r =>
      (java.sql.Date.valueOf(r._1.toLocalDateTime.toLocalDate), r._2)).toArray)
    val ref = pav(mmu.map(_.toDouble))
    got.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("iso_fit") - ref(i) / 1e6) <= 1e-4,
        s"day $i: got ${r.getAs[Double]("iso_fit")}, PAV ${ref(i) / 1e6}")
    }
    // n² segment rows (160k) finish in seconds; the old n³ join built
    // 6.4e7 lattice rows before the groupBy
    assert(secs < 120.0, s"400-day isotonic fit took $secs s")
  }

  test("q_anova matches closed-form F from exact centi-long moments") {
    val got = SparkEntry.queries("q_anova")(spark, sf).collect()
    assert(got.length === 1)
    val r = got.head
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
    val g = raw.groupBy(_._1).map { case (_, vs) =>
      val ng = vs.length.toLong
      val sg = vs.map(_._2).sum
      val qg = vs.map(v => v._2 * v._2).sum
      (ng, sg, qg, math.round(sg.toDouble * sg / ng))
    }.toArray
    val k = g.length.toLong
    val n = g.map(_._1).sum; val s = g.map(_._2).sum
    val q = g.map(_._3).sum; val tb = g.map(_._4).sum
    val ssb = tb - math.round(s.toDouble * s / n)
    val ssw = q - tb
    val f = (ssb.toDouble / (k - 1)) / (ssw.toDouble / (n - k))
    assert(r.getAs[Long]("k_groups") === k)
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("df1") === k - 1)
    assert(r.getAs[Long]("df2") === n - k)
    assert(math.abs(r.getAs[Double]("f_stat") - f) <= 1e-3,
      s"F: got ${r.getAs[Double]("f_stat")}, closed-form $f")
    assert(math.abs(r.getAs[Double]("eta_sq")
      - ssb.toDouble / (ssb + ssw)) <= 1e-5)
    // a between-groups effect exists in the fixture: F > 0, 0 ≤ η² < 1
    assert(r.getAs[Double]("f_stat") >= 0.0)
    assert(r.getAs[Double]("eta_sq") >= 0.0
      && r.getAs[Double]("eta_sq") < 1.0)
  }

  test("q_info_gain matches a brute-force split scan and flags the argmax") {
    val got = SparkEntry.queries("q_info_gain")(spark, sf).collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(x => (math.floor(x.getDouble(1) / 10).toLong,
        if (x.getString(0) == "purchase") 1L else 0L))
    val buckets = raw.groupBy(_._1).toArray.sortBy(_._1).map {
      case (b, vs) => (b, vs.length.toLong, vs.map(_._2).sum)
    }
    val n = buckets.map(_._2).sum; val p = buckets.map(_._3).sum
    def entU(pp: Long, nn: Long): Long = {
      val q1 = pp.toDouble / nn; val q0 = (nn - pp).toDouble / nn
      (if (pp > 0) math.round(-q1 * math.log(q1) * 1e9) else 0L) +
        (if (nn - pp > 0) math.round(-q0 * math.log(q0) * 1e9) else 0L)
    }
    var nl = 0L; var pl = 0L
    val ref = buckets.flatMap { case (b, nb, pb) =>
      nl += nb; pl += pb
      if (nl < n) {
        val ig = entU(p, n) -
          math.round(nl.toDouble / n * entU(pl, nl)) -
          math.round((n - nl).toDouble / n * entU(p - pl, n - nl))
        Some(((b + 1) * 10, nl, pl, ig))
      } else None
    }
    val best = ref.map(_._4).max
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (r, (t, rnl, rpl, ig)) =>
      assert(r.getAs[Long]("threshold") === t)
      assert(r.getAs[Long]("n_left") === rnl)
      assert(r.getAs[Long]("pos_left") === rpl)
      assert(math.abs(r.getAs[Double]("info_gain") - ig / 1e9) <= 1e-6,
        s"threshold $t: got ${r.getAs[Double]("info_gain")}, ref ${ig / 1e9}")
      assert(r.getAs[Boolean]("is_best") === (ig == best),
        s"threshold $t: is_best mismatch")
    }
    assert(got.count(_.getAs[Boolean]("is_best")) >= 1)
  }
}
