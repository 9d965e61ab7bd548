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

  test("q_kruskal_wallis matches a brute-force average-rank reference") {
    val got = SparkEntry.queries("q_kruskal_wallis")(spark, sf).collect().head
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = raw.length
    // average ranks with ties, brute force
    val sorted = raw.map(_._2).sorted
    val avgRank = raw.map(_._2).distinct.map { v =>
      val lo = sorted.indexWhere(_ == v) + 1
      val hi = sorted.lastIndexWhere(_ == v) + 1
      v -> (lo + hi) / 2.0
    }.toMap
    val groups = raw.groupBy(_._1).values.toArray
    val h = 12.0 / (n.toDouble * (n + 1)) * groups.map { g =>
      val rg = g.map(x => avgRank(x._2)).sum
      rg * rg / g.length
    }.sum - 3.0 * (n + 1)
    val t3 = raw.groupBy(_._2).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val c = 1.0 - t3.toDouble / (n.toDouble * n * n - n)
    assert(got.getAs[Long]("k_groups") === groups.length)
    assert(got.getAs[Long]("n") === n)
    assert(math.abs(got.getAs[Double]("h_stat") - h) <= 1e-3,
      s"H: got ${got.getAs[Double]("h_stat")}, brute-force $h")
    assert(math.abs(got.getAs[Double]("h_tie_corrected") - h / c) <= 1e-3)
  }

  test("q_levene_bf matches direct median-deviation computation") {
    val got = SparkEntry.queries("q_levene_bf")(spark, sf).collect().head
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e6).toLong))
    val zs = raw.groupBy(_._1).values.flatMap { g =>
      val vs = g.map(_._2).sorted
      val m2 = vs((vs.length - 1) / 2) + vs(vs.length / 2)
      vs.map(v => math.round(math.abs(2 * v - m2) / 20000.0))
    }.toArray
    // one-way F on z across groups, recomputed independently
    val gz = raw.groupBy(_._1).map { case (_, g) =>
      val vs = g.map(_._2).sorted
      val m2 = vs((vs.length - 1) / 2) + vs(vs.length / 2)
      val z = g.map(x => math.round(math.abs(2 * x._2 - m2) / 20000.0))
      (z.length.toLong, z.sum, z.map(v => v * v).sum)
    }.toArray
    val k = gz.length; val n = gz.map(_._1).sum
    val tb = gz.map { case (ng, sg, _) =>
      math.round(sg.toDouble * sg / ng) }.sum
    val sz = gz.map(_._2).sum; val q = gz.map(_._3).sum
    val ssb = tb - math.round(sz.toDouble * sz / n)
    val ssw = q - tb
    val f = (ssb.toDouble / (k - 1)) / (ssw.toDouble / (n - k))
    assert(got.getAs[Long]("n") === n)
    assert(got.getAs[Long]("k_groups") === k.toLong)
    assert(math.abs(got.getAs[Double]("f_bf") - f) <= 1e-3,
      s"F_bf: got ${got.getAs[Double]("f_bf")}, direct $f")
    assert(zs.length === n.toInt)
  }

  test("q_kcore result is the exact 8-core of the tau=0.8 token graph") {
    val got = SparkEntry.queries("q_kcore")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("deg_core")).toMap
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // peel to FIXPOINT in Scala (not 6 rounds): equality proves the
    // 6-round unroll converged on this graph
    var e = edges.toSet
    var stable = false
    while (!stable) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (k2, v) => k2 -> v.size }
      val keep = deg.filter(_._2 >= 8).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      stable = e2 == e
      e = e2
    }
    val refDeg = e.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    assert(got === refDeg,
      s"kcore mismatch: got ${got.size} nodes, fixpoint ${refDeg.size}")
    // every member really has core degree >= 8
    got.values.foreach(dv => assert(dv >= 8L))
  }

  test("q_tclose matches brute-force ordered EMD per QI group") {
    val got = SparkEntry.queries("q_tclose")(spark, sf).collect()
    val j = graft.tables.Tables.orders(spark, sf)
      .join(graft.tables.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(graft.tables.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_mktsegment", "o_orderpriority").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
    val prios = j.map(_._2).distinct.sorted
    val nn = j.length.toLong
    val glob = prios.map(p => j.count(_._2 == p).toLong)
    val ref = j.groupBy(_._1).map { case (g, rows) =>
      val ng = rows.length.toLong
      val ps = prios.map(p => rows.count(_._2 == p).toLong)
      var cum = 0L; var s = 0L
      for (i <- prios.indices) {
        cum += ps(i) * nn - glob(i) * ng
        s += math.abs(cum)
      }
      g -> s.toDouble / (ng * nn * (prios.length - 1))
    }
    assert(got.length === ref.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(math.abs(r.getAs[Double]("t_emd") - ref(key)) <= 1e-5,
        s"group $key: got ${r.getAs[Double]("t_emd")}, ref ${ref(key)}")
    }
  }

  test("q_ar1_fit matches a fold over the daily milli-mean series") {
    val got = SparkEntry.queries("q_ar1_fit")(spark, sf).collect()
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val series = daily.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.groupBy(_._1._2).toArray.sortBy(_._1)
        .map { case (_, vs) => vs.map(_._2).sum / vs.length }
    }
    got.foreach { r =>
      val ys = series(r.getString(0))
      val pairs = ys.sliding(2).map(a => (a(0), a(1))).toArray
      val np = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val phi = (np * sxy - sx * sy).toDouble / (np * sxx - sx * sx)
      assert(r.getAs[Long]("n_pairs") === np)
      assert(math.abs(r.getAs[Double]("phi") - phi) <= 1e-5,
        s"${r.getString(0)}: phi got ${r.getAs[Double]("phi")}, ref $phi")
      // AR(1) on a stationary-ish series: |phi| < 1
      assert(math.abs(r.getAs[Double]("phi")) < 1.0)
    }
  }

  test("q_tukey_hsd is consistent with q_anova's pooled variance") {
    val hsd = SparkEntry.queries("q_tukey_hsd")(spark, sf).collect()
    val k = 5
    assert(hsd.length === k * (k - 1) / 2)
    hsd.foreach { r =>
      assert(r.getAs[Double]("se") > 0.0)
      val qExpected =
        math.abs(r.getAs[Double]("mean_diff")) / r.getAs[Double]("se")
      // q_stat was computed pre-rounding; compare loosely
      assert(math.abs(r.getAs[Double]("q_stat") - qExpected)
        <= 0.01 * math.max(1.0, qExpected),
        s"${r.getString(0)}/${r.getString(1)}: q ${r.getAs[Double]("q_stat")} vs $qExpected")
    }
  }

  test("q_mcnemar and q_partial_corr invariants") {
    val mc = SparkEntry.queries("q_mcnemar")(spark, sf).collect()
    assert(mc.length === 5)
    mc.foreach { r =>
      assert(r.getAs[Long]("b_ct") + r.getAs[Long]("c_ct")
        <= r.getAs[Long]("n"))
      assert(r.getAs[Double]("mcnemar_chi2") >= 0.0)
    }
    val pc = SparkEntry.queries("q_partial_corr")(spark, sf).collect()
    assert(pc.length === 5)
    pc.foreach { r =>
      Seq("r_xy", "r_xz", "r_yz", "r_xy_z").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c=$v out of range")
      }
    }
  }

  test("q_readability recomputes per-doc on a sample") {
    val got = SparkEntry.queries("q_readability")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.length === docs.map(_._1).distinct.length)
    val bySource = docs.groupBy(_._1)
    got.foreach { r =>
      val rows = bySource(r.getString(0))
      assert(r.getAs[Long]("n_docs") === rows.length.toLong)
      val fl = rows.map { case (_, t) =>
        val words = t.split(" ").length.toLong
        val syll = "[aeiouy]+".r.findAllIn(t).length.toLong
        math.round((206.835 - 1.015 * words
          - 84.6 * (syll.toDouble / words)) * 1e6)
      }
      assert(math.abs(r.getAs[Double]("avg_flesch")
        - fl.sum / 1e6 / rows.length) <= 1e-3)
    }
  }
}
