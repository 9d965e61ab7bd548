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

  test("q_clustering_coeff matches brute-force per-node triangle counts") {
    val got = SparkEntry.queries("q_clustering_coeff")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("deg"), r.getAs[Long]("tri"),
            r.getAs[Double]("clustering"))).toMap
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.95)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    assert(got.size === adj.size)
    adj.foreach { case (v, nb) =>
      val triRef = nb.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      val (deg, tri, coeff) = got(v)
      assert(deg === nb.size.toLong, s"node $v degree")
      assert(tri === triRef.toLong,
        s"node $v: got $tri triangles, brute-force $triRef")
      if (nb.size >= 2) {
        val cRef = triRef * 2.0 / (nb.size.toDouble * (nb.size - 1))
        assert(math.abs(coeff - cRef) <= 1e-4)
      } else assert(coeff === 0.0)
    }
  }

  test("q_sim_binary_hamming matches brute-force sign-pack distances") {
    val got = SparkEntry.queries("q_sim_binary_hamming")(spark, sf).collect()
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def ham(a: Array[Float], b: Array[Float]): Int =
      a.indices.count(i => (a(i) > 0) != (b(i) > 0))
    val q = e(0L)
    val ref = e.toSeq.filter(_._1 > 0)
      .map { case (id, v) => (ham(q, v), id) }.sorted.take(20)
    assert(got.length === 20)
    got.zip(ref).foreach { case (r, (h, id)) =>
      assert(r.getAs[Long]("vec_id") === id)
      assert(r.getAs[Long]("hamming") === h.toLong)
    }
  }

  test("q_runs_test matches a brute-force run count") {
    val got = SparkEntry.queries("q_runs_test")(spark, sf).collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2), math.floor(r.getDouble(3) * 1e6).toLong))
    got.foreach { r =>
      val g = raw.filter(_._1 == r.getString(0))
      val vs = g.map(_._4).sorted
      val m2 = vs((vs.length - 1) / 2) + vs(vs.length / 2)
      val seq = g.sortBy(x => (x._2, x._3))
        .filter(x => 2 * x._4 != m2).map(x => 2 * x._4 > m2)
      val runs = 1 + seq.sliding(2).count(w =>
        w.length == 2 && w(0) != w(1))
      assert(r.getAs[Long]("n1") === seq.count(identity).toLong)
      assert(r.getAs[Long]("n2") === seq.count(!_).toLong)
      assert(r.getAs[Long]("runs") === runs.toLong,
        s"${r.getString(0)}: runs got ${r.getAs[Long]("runs")}, ref $runs")
    }
  }

  test("q_jarque_bera matches pure-Scala central moments") {
    val got = SparkEntry.queries("q_jarque_bera")(spark, sf).collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 10)))
    got.foreach { r =>
      val vs = raw.filter(_._1 == r.getString(0)).map(_._2.toDouble)
      val n = vs.length
      val m = vs.sum / n
      val m2 = vs.map(v => (v - m) * (v - m)).sum / n
      val m3 = vs.map(v => math.pow(v - m, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - m, 4)).sum / n
      val skew = m3 / math.pow(m2, 1.5)
      val kurt = m4 / (m2 * m2)
      assert(math.abs(r.getAs[Double]("skew") - skew) <= 1e-3)
      assert(math.abs(r.getAs[Double]("kurtosis") - kurt) <= 1e-3)
      val jb = n / 6.0 * (skew * skew + math.pow(kurt - 3.0, 2) / 4.0)
      assert(math.abs(r.getAs[Double]("jb_stat") - jb)
        <= 0.01 * math.max(1.0, jb))
    }
  }

  test("q_pacf Durbin-Levinson lag-2 identity holds") {
    val got = SparkEntry.queries("q_pacf")(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_n")
        -> (r.getAs[Double]("acf"), r.getAs[Double]("pacf"))).toMap
    assert(got.size === 3)
    // lag-1 PACF equals lag-1 ACF by definition
    assert(got(1L)._1 === got(1L)._2)
    // lag-2: phi22 = (r2 - r1^2)/(1 - r1^2), recomputed from outputs
    val r1 = got(1L)._1; val r2 = got(2L)._1
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(math.abs(got(2L)._2 - p2) <= 2e-3,
      s"phi22: got ${got(2L)._2}, identity $p2")
    got.values.foreach { case (a, p) =>
      assert(a >= -1.0 && a <= 1.0 && p >= -1.0 && p <= 1.0)
    }
  }

  test("q_hurst and q_mase_seasonal fold references") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val series = daily.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.groupBy(_._1._2).toArray.sortBy(_._1)
        .map { case (_, vs) => vs.map(_._2).sum / vs.length }
    }
    SparkEntry.queries("q_hurst")(spark, sf).collect().foreach { r =>
      val ys = series(r.getString(0)).map(_.toDouble)
      val n = ys.length
      val mean = ys.sum / n
      val sd = math.sqrt(ys.map(y => y * y).sum / n - mean * mean)
      val devs = ys.scanLeft(0.0)(_ + _).tail
        .zipWithIndex.map { case (p, i) => p - (i + 1) * mean }
      val rs = (devs.max - devs.min) / sd
      assert(r.getAs[Long]("n_days") === n.toLong)
      assert(math.abs(r.getAs[Double]("hurst")
        - math.log(rs) / math.log(n)) <= 1e-3,
        s"${r.getString(0)}: hurst")
    }
    SparkEntry.queries("q_mase_seasonal")(spark, sf).collect().foreach { r =>
      val ys = series(r.getString(0))
      val terms = (7 until ys.length).map(i =>
        (math.abs(ys(i) - ys(i - 7)), math.abs(ys(i) - ys(i - 1))))
      assert(r.getAs[Long]("n_terms") === terms.length.toLong)
      val mase = terms.map(_._1).sum.toDouble / terms.map(_._2).sum
      assert(math.abs(r.getAs[Double]("mase") - mase) <= 1e-3)
    }
  }

  test("q_mannwhitney matches a brute-force two-sample rank reference") {
    val got = SparkEntry.queries("q_mannwhitney")(spark, sf).collect().head
    val raw = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sorted = raw.map(_._2).sorted
    val avgRank = raw.map(_._2).distinct.map { v =>
      val lo = sorted.indexWhere(_ == v) + 1
      val hi = sorted.lastIndexWhere(_ == v) + 1
      v -> (lo + hi) / 2.0
    }.toMap
    val clicks = raw.filter(_._1 == "click")
    val n1 = clicks.length; val n2 = raw.length - n1
    val r1 = clicks.map(x => avgRank(x._2)).sum
    val u = r1 - n1.toDouble * (n1 + 1) / 2.0
    assert(got.getAs[Long]("n1") === n1.toLong)
    assert(got.getAs[Long]("n2") === n2.toLong)
    assert(math.abs(got.getAs[Double]("u_stat") - u) <= 0.51,
      s"U: got ${got.getAs[Double]("u_stat")}, brute-force $u")
  }

  test("q_friedman matches brute-force within-day ranks") {
    val got = SparkEntry.queries("q_friedman")(spark, sf).collect().head
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e6).toLong))
      .groupBy(_._1).map { case ((t, dd), vs) =>
        (dd, t, vs.map(_._2).sum / vs.length) }.toArray
    val full = daily.groupBy(_._1).filter(_._2.length == 5)
    val rsum = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    full.values.foreach { rows =>
      rows.sortBy(r => (r._3, r._2)).zipWithIndex.foreach {
        case ((_, t, _), i) => rsum(t) += (i + 1).toLong
      }
    }
    val n = full.size; val k = 5
    val chi = 12.0 * rsum.values.map(r => r * r).sum /
      (n.toDouble * k * (k + 1)) - 3.0 * n * (k + 1)
    assert(got.getAs[Long]("n_days") === n.toLong)
    assert(math.abs(got.getAs[Double]("friedman_chi2") - chi) <= 1e-3,
      s"chi2: got ${got.getAs[Double]("friedman_chi2")}, ref $chi")
  }

  test("q_weighted_median and q_quantile_align order-stat references") {
    val wm = SparkEntry.queries("q_weighted_median")(spark, sf).collect()
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2))))
    wm.foreach { r =>
      val g = li.filter(_._1 == r.getString(0)).sortBy(_._2)
      val tot = g.map(_._3).sum
      var cum = 0L
      val med = g.find { x => cum += x._3; 2 * cum >= tot }.get._2
      assert(r.getAs[Long]("total_weight") === tot)
      assert(math.abs(r.getAs[Double]("weighted_median_price")
        - med / 100.0) <= 1e-9,
        s"${r.getString(0)}: median")
    }
    val qa = SparkEntry.queries("q_quantile_align")(spark, sf).collect()
    val ev = graft.tables.Tables.events(spark, sf)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e6).toLong))
    val globSorted = ev.sortBy(x => (x._3, x._2)).map(_._3)
    qa.foreach { r =>
      val g = ev.filter(_._1 == r.getString(0))
        .sortBy(x => (x._3, x._2)).map(_._3)
      val q = r.getAs[Long]("decile").toInt
      val vg = g(((g.length - 1) * q / 10).toInt)
      val va = globSorted(((globSorted.length - 1) * q / 10).toInt)
      assert(math.abs(r.getAs[Double]("v_group") - vg / 1e6) <= 1e-4)
      assert(math.abs(r.getAs[Double]("v_global") - va / 1e6) <= 1e-4)
    }
  }

  test("q_centroid_sim matches pure-Scala label centroids") {
    val got = SparkEntry.queries("q_centroid_sim")(spark, sf).collect()
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val cents = e.groupBy(_._1).map { case (l, vs) =>
      l -> (0 until 64).map(i =>
        vs.map(v => math.round(v._2(i) * 1e6)).sum / (vs.length * 1e6))
        .toArray
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) =>
        math.round(x * y * 1e6) }.sum
      val na = a.map(x => math.round(x * x * 1e6)).sum
      val nb = b.map(x => math.round(x * x * 1e6)).sum
      dot / math.sqrt(na.toDouble * nb)
    }
    assert(got.length === 45)
    got.foreach { r =>
      val ref = cos(cents(r.getInt(0)), cents(r.getInt(1)))
      assert(math.abs(r.getAs[Double]("centroid_cos") - ref) <= 1e-5,
        s"(${r.getInt(0)},${r.getInt(1)}): got " +
          s"${r.getAs[Double]("centroid_cos")}, ref $ref")
    }
  }

  test("q_theil_index fold reference and range") {
    val got = SparkEntry.queries("q_theil_index")(spark, sf).collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .filter(_._2 > 0)
    got.foreach { r =>
      val xs = raw.filter(_._1 == r.getString(0)).map(_._2.toDouble)
      val mu = xs.sum / xs.length
      val t = xs.map(x => x / mu * math.log(x / mu)).sum / xs.length
      assert(r.getAs[Long]("n") === xs.length.toLong)
      assert(math.abs(r.getAs[Double]("theil_t") - t) <= 1e-4)
      assert(r.getAs[Double]("theil_t") >= 0.0) // Theil T is nonnegative
    }
  }

  test("erf_as matches java.lang.Math-based reference within A&S error bound") {
    // A&S 7.1.26 promises |eps| <= 1.5e-7 against true erf
    val cases = Seq(0.0, 0.1, 0.5, 1.0, 1.5, 2.0, 3.0, -0.7, -2.5)
    cases.foreach { x =>
      val got = graft.expr.ErfCore.erf(x)
      // reference: numerically integrate the Gaussian (Simpson, fine grid)
      val steps = 20000
      val h = math.abs(x) / steps
      val integral = (0 until steps).map { i =>
        val a = i * h; val b = a + h; val m = (a + b) / 2
        (math.exp(-a * a) + 4 * math.exp(-m * m) + math.exp(-b * b)) * h / 6
      }.sum * 2 / math.sqrt(math.Pi)
      val ref = if (x < 0) -integral else integral
      assert(math.abs(got - ref) <= 2e-7, s"erf($x): got $got, ref $ref")
    }
    assert(math.abs(graft.expr.ErfCore.erf(0.0)) <= 2e-7)
    assert(graft.expr.ErfCore.erf(10.0) === 1.0)
    // odd symmetry is exact by construction
    assert(graft.expr.ErfCore.erf(-1.3) === -graft.expr.ErfCore.erf(1.3))
  }

  test("q_pvalue_adjust BH ordering invariants") {
    val got = SparkEntry.queries("q_pvalue_adjust")(spark, sf).collect()
    assert(got.length === 5)
    got.foreach { r =>
      val p = r.getAs[Double]("p_raw")
      val bonf = r.getAs[Double]("p_bonf")
      val bh = r.getAs[Double]("p_bh")
      assert(p >= 0.0 && p <= 1.0)
      // BH is always between raw and Bonferroni
      assert(bh >= p - 1e-9 && bh <= bonf + 1e-9,
        s"${r.getString(0)}: p=$p bh=$bh bonf=$bonf")
    }
    // BH adjusted values are monotone in raw p
    val sorted = got.sortBy(_.getAs[Double]("p_raw"))
    sorted.sliding(2).foreach { w =>
      assert(w(1).getAs[Double]("p_bh") >= w(0).getAs[Double]("p_bh") - 1e-9)
    }
  }

  test("q_label_prop matches a brute-force 4-round synchronous LPA") {
    val got = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lbl = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to 4) {
      lbl = adj.map { case (v, nb) =>
        val counts = nb.map(lbl).groupBy(identity)
          .map { case (l, o) => (l, o.size) }
        v -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    assert(got === lbl)
    // communities are label-rooted: every community id is a node id
    assert(got.values.toSet.subsetOf(got.keySet))
  }

  test("q_trimmed_mean and q_ses_forecast fold references") {
    val tm = SparkEntry.queries("q_trimmed_mean")(spark, sf).collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    tm.foreach { r =>
      val vs = raw.filter(_._1 == r.getString(0)).map(_._2).sorted
      val cut = vs.length / 10
      val kept = vs.slice(cut, vs.length - cut)
      assert(r.getAs[Long]("n_kept") === kept.length.toLong)
      assert(math.abs(r.getAs[Double]("trimmed_mean")
        - kept.sum.toDouble / kept.length / 100.0) <= 1e-3)
    }
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val series = daily.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.groupBy(_._1._2).toArray.sortBy(_._1)
        .map { case (_, vs) => vs.map(_._2).sum / vs.length }
    }
    SparkEntry.queries("q_ses_forecast")(spark, sf).collect().foreach { r =>
      val ys = series(r.getString(0)).map(_.toDouble)
      // the sequential SES recursion the closed form must equal
      var l = ys.head
      ys.tail.foreach(y => l = 0.3 * y + 0.7 * l)
      assert(math.abs(r.getAs[Double]("ses_forecast") - l / 1e3) <= 1e-2,
        s"${r.getString(0)}: SES got ${r.getAs[Double]("ses_forecast")}, " +
          s"recursion ${l / 1e3}")
    }
  }

  test("s_stream_topk equals the batch top-3 per type") {
    val got = SparkEntry.queries("s_stream_topk")(spark, sf).collect()
    val ref = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, rows) =>
        rows.sortBy(x => (-x._2, x._3)).take(3).zipWithIndex
          .map { case ((_, v, id), i) => (t, (i + 1).toLong, v, id) }
      }
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (r, (t, rank, v, id)) =>
      assert(r.getString(0) === t)
      assert(r.getAs[Long]("rank") === rank)
      assert(math.abs(r.getAs[Double]("value") - v / 100.0) <= 1e-9)
      assert(r.getAs[Long]("event_id") === id)
    }
  }

  test("q_kendall_tau matches brute-force concordance counting") {
    val got = SparkEntry.queries("q_kendall_tau")(spark, sf).collect().head
    val daily = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val byTd = daily.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).sum / vs.length }
    val days = byTd.keys.map(_._2).toSeq.distinct.sorted
      .filter(dd => byTd.contains(("click", dd)) && byTd.contains(("view", dd)))
    val xs = days.map(dd => byTd(("click", dd)))
    val ys = days.map(dd => byTd(("view", dd)))
    var c = 0L; var disc = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      n0 += 1
      val sx = (xs(j) - xs(i)).sign; val sy = (ys(j) - ys(i)).sign
      if (sx * sy > 0) c += 1
      else if (sx * sy < 0) disc += 1
      else if (sx == 0 && sy != 0) tx += 1
      else if (sy == 0 && sx != 0) ty += 1
    }
    assert(got.getAs[Long]("n_pairs") === n0)
    assert(got.getAs[Long]("concordant") === c)
    assert(got.getAs[Long]("discordant") === disc)
    val tau = (c - disc).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(math.abs(got.getAs[Double]("tau_b") - tau) <= 1e-5)
  }

  test("q_twap weights every interval by its duration") {
    val got = SparkEntry.queries("q_twap")(spark, sf).collect()
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), math.round(r.getDouble(4) * 100)))
    val ref = ev.groupBy(x => (x._1, x._2)).flatMap { case (k, rows) =>
      val s = rows.sortBy(x => (x._3, x._4))
      val terms = s.zip(s.tail).map { case (a, b) => (a._5, b._3 - a._3) }
      val sw = terms.map(_._2).sum
      if (terms.nonEmpty && sw > 0)
        Some(k -> (terms.length.toLong,
          terms.map(t => t._1 * t._2).sum.toDouble / sw / 100.0))
      else None
    }
    assert(got.length === ref.size)
    got.foreach { r =>
      val (n, tw) = ref((r.getString(0), r.getDate(1).toString))
      assert(r.getAs[Long]("n_intervals") === n)
      assert(math.abs(r.getAs[Double]("twap") - tw) <= 1e-3,
        s"${r.getString(0)}/${r.getDate(1)}: twap")
    }
  }

  test("q_rsi frame equals a fold over daily diffs; q_hhi and q_odds_ratio invariants") {
    val rsi = SparkEntry.queries("q_rsi")(spark, sf).collect()
    assert(rsi.nonEmpty)
    rsi.foreach { r =>
      val v = r.getAs[Double]("rsi14")
      assert(v >= 0.0 && v <= 100.0)
    }
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val series = daily.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.groupBy(_._1._2).toArray.sortBy(_._1)
        .map { case (dd, vs) => (dd, vs.map(_._2).sum / vs.length) }
    }
    rsi.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val ys = series(t)
      val diffs = ys.zip(ys.tail).map { case ((_, a), (dd, b)) => (dd, b - a) }
      val byD = rows.map(r => r.getDate(1).toString -> r.getAs[Double]("rsi14")).toMap
      diffs.sliding(14).foreach { w =>
        if (w.length == 14 && byD.contains(w.last._1)) {
          val sg = w.map(_._2).filter(_ > 0).sum
          val sl = -w.map(_._2).filter(_ < 0).sum
          val ref = 100.0 * sg / (sg + sl)
          assert(math.abs(byD(w.last._1) - ref) <= 1e-3,
            s"$t ${w.last._1}: rsi got ${byD(w.last._1)}, fold $ref")
        }
      }
    }
    val hhi = SparkEntry.queries("q_hhi")(spark, sf).collect()
    hhi.foreach { r =>
      val v = r.getAs[Double]("hhi")
      // HHI is bounded by (10^4/n_sources, 10^4]
      assert(v > 1e4 / r.getAs[Long]("n_sources") - 1e-6 && v <= 1e4)
    }
    val or = SparkEntry.queries("q_odds_ratio")(spark, sf).collect()
    or.foreach { r =>
      assert(r.getAs[Double]("ci_low") <= r.getAs[Double]("odds_ratio"))
      assert(r.getAs[Double]("ci_high") >= r.getAs[Double]("odds_ratio"))
    }
  }

  test("q_interval_union matches a brute-force interval merge") {
    val got = SparkEntry.queries("q_interval_union")(spark, sf).collect()
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ref = ev.groupBy(_._1).map { case (u, rows) =>
      val iv = rows.map(_._2).sorted.map(t => (t, t + 300000000L))
      var islands = 0L; var covered = 0L
      var curS = -1L; var curE = -1L
      iv.foreach { case (a, b) =>
        if (curE < 0 || a > curE) {
          if (curE >= 0) covered += curE - curS
          islands += 1; curS = a; curE = b
        } else if (b > curE) curE = b
      }
      if (curE >= 0) covered += curE - curS
      u -> (islands, covered)
    }
    assert(got.length === ref.size)
    got.foreach { r =>
      val (isl, cov) = ref(r.getLong(0))
      assert(r.getAs[Long]("n_islands") === isl,
        s"user ${r.getLong(0)}: islands")
      assert(math.abs(r.getAs[Double]("covered_minutes") - cov / 6e7)
        <= 1e-3)
    }
  }

  test("q_adstock equals the direct lambda-power convolution") {
    val got = SparkEntry.queries("q_adstock")(spark, sf).collect()
    val daily = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("d"), col("value")).collect()
      .map(r => (r.getDate(0).toLocalDate, math.floor(r.getDouble(1) * 1e3).toLong))
      .groupBy(_._1).map { case (dd, vs) => dd -> vs.map(_._2).sum }
    got.foreach { r =>
      val dd = r.getDate(0).toLocalDate
      val ref = (0 until 14).flatMap { j =>
        daily.get(dd.minusDays(j.toLong))
          .map(y => math.round(math.pow(0.5, j) * y))
      }
      assert(r.getAs[Long]("n_terms") === ref.length.toLong)
      assert(math.abs(r.getAs[Double]("adstock") - ref.sum / 1e3) <= 1e-3,
        s"$dd: adstock")
    }
  }

  test("q_new_returning decomposition sums and q_gaps_islands completeness") {
    val nr = SparkEntry.queries("q_new_returning")(spark, sf).collect()
    val totalNew = nr.map(_.getAs[Long]("new_users")).sum
    val users = graft.tables.Tables.events(spark, sf)
      .select(countDistinct("user_id")).collect().head.getLong(0)
    // every user is new exactly once
    assert(totalNew === users)
    nr.foreach { r =>
      assert(r.getAs[Long]("active_users")
        === r.getAs[Long]("new_users") + r.getAs[Long]("returning_users"))
    }
    val gi = SparkEntry.queries("q_gaps_islands")(spark, sf).collect()
    // islands per type tile the type's distinct days exactly
    val dayCount = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    gi.groupBy(_.getString(0)).foreach { case (t, rows) =>
      assert(rows.map(_.getAs[Long]("n_days")).sum === dayCount(t))
      rows.foreach { r =>
        val span = r.getDate(2).toLocalDate.toEpochDay -
          r.getDate(1).toLocalDate.toEpochDay + 1
        assert(span === r.getAs[Long]("n_days"), s"$t island not contiguous")
      }
    }
  }

  test("q_lorenz_curve and q_churn_hazard brute-force references") {
    val lc = SparkEntry.queries("q_lorenz_curve")(spark, sf).collect()
    val u = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (id, vs) => (id, vs.map(_._2).sum) }
      .toArray.sortBy(x => (x._2, x._1))
    val cum = u.map(_._2).scanLeft(0L)(_ + _).tail
    val tv = cum.last; val n = u.length
    assert(lc.length === 10)
    lc.foreach { r =>
      val dec = r.getAs[Long]("decile").toInt
      val rn = n * dec / 10
      assert(r.getAs[Long]("n_users") === rn.toLong)
      assert(math.abs(r.getAs[Double]("cum_value_share")
        - cum(rn - 1).toDouble / tv) <= 1e-5)
    }
    // Lorenz curves are monotone and end at 1
    lc.sliding(2).foreach(w => assert(w(1).getAs[Double]("cum_value_share")
      >= w(0).getAs[Double]("cum_value_share") - 1e-12))
    assert(math.abs(lc.last.getAs[Double]("cum_value_share") - 1.0) <= 1e-9)

    val ch = SparkEntry.queries("q_churn_hazard")(spark, sf).collect()
    val lt = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).map { case (_, ds) =>
        ds.map(_._2).max - ds.map(_._2).min }
    ch.foreach { r =>
      val t = r.getAs[Long]("lifetime_days")
      assert(r.getAs[Long]("ended") === lt.count(_ == t).toLong)
      assert(r.getAs[Long]("at_risk") === lt.count(_ >= t).toLong)
    }
    // hazards never exceed 1; the final row's hazard is exactly 1
    ch.foreach(r => assert(r.getAs[Double]("hazard") <= 1.0 + 1e-12))
    assert(math.abs(ch.last.getAs[Double]("hazard") - 1.0) <= 1e-9)
  }

  test("q_calibration_isotonic equals PAV over the decile rates") {
    val got = SparkEntry.queries("q_calibration_isotonic")(spark, sf)
      .collect()
    val raw = graft.tables.Tables.events(spark, sf)
      .selectExpr("least(cast(get_json_object(props, '$.k') as long) div 10, 9L) as bkt",
        "case when event_type = 'purchase' then 1L else 0L end as pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rates = raw.groupBy(_._1).toArray.sortBy(_._1).map { case (b, vs) =>
      (b, vs.length.toLong,
        math.round(vs.map(_._2).sum * 1e9 / vs.length.toDouble))
    }
    val fit = pav(rates.map(_._3.toDouble))
    assert(got.length === rates.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("score_decile") === rates(i)._1)
      assert(r.getAs[Long]("n") === rates(i)._2)
      assert(math.abs(r.getAs[Double]("raw_rate") - rates(i)._3 / 1e9)
        <= 1e-6)
      assert(math.abs(r.getAs[Double]("calibrated_rate") - fit(i) / 1e9)
        <= 1e-6, s"decile ${rates(i)._1}: PAV")
    }
    // monotone by construction
    got.sliding(2).foreach(w => assert(w(1).getAs[Double]("calibrated_rate")
      >= w(0).getAs[Double]("calibrated_rate") - 1e-12))
  }

  test("q_stickiness and q_max_drawdown brute-force references") {
    val st = SparkEntry.queries("q_stickiness")(spark, sf).collect()
    val ud = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val d0 = ud.map(_._2.toEpochDay).min
    st.foreach { r =>
      val dd = r.getDate(0).toLocalDate
      assert(dd.toEpochDay - d0 >= 6)
      val dau = ud.count(_._2 == dd)
      val wau = ud.filter(u => !u._2.isAfter(dd)
        && !u._2.isBefore(dd.minusDays(6))).map(_._1).distinct.length
      assert(r.getAs[Long]("dau") === dau.toLong)
      assert(r.getAs[Long]("wau") === wau.toLong)
      assert(r.getAs[Double]("stickiness") <= 1.0 + 1e-12)
    }
    val md = SparkEntry.queries("q_max_drawdown")(spark, sf).collect()
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val series = daily.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.groupBy(_._1._2).toArray.sortBy(_._1)
        .map { case (dd, vs) => (dd, vs.map(_._2).sum / vs.length) }
    }
    md.foreach { r =>
      val ys = series(r.getString(0))
      var peak = Long.MinValue; var best = -1L; var bestD = ""
      var bestPeak = 0L; var bestY = 0L
      ys.foreach { case (dd, y) =>
        peak = math.max(peak, y)
        val ddU = math.round((peak - y) * 1e9 / peak.toDouble)
        if (ddU > best) { best = ddU; bestD = dd; bestPeak = peak; bestY = y }
      }
      assert(r.getDate(1).toString === bestD, s"${r.getString(0)}: trough day")
      assert(math.abs(r.getAs[Double]("max_drawdown") - best / 1e9) <= 1e-6)
      assert(math.abs(r.getAs[Double]("peak_v") - bestPeak / 1e3) <= 1e-3)
      assert(math.abs(r.getAs[Double]("trough_v") - bestY / 1e3) <= 1e-3)
    }
  }

  test("q_power_law_mle and q_vwap fold references") {
    val pl = SparkEntry.queries("q_power_law_mle")(spark, sf).collect().head
    val totals = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map(_._2.map(_._2).sum).filter(_ >= 5000L).toArray
    val alpha = 1.0 + totals.length /
      (totals.map(v => math.round(math.log(v / 5000.0) * 1e9)).sum / 1e9)
    assert(pl.getAs[Long]("n_tail") === totals.length.toLong)
    assert(math.abs(pl.getAs[Double]("alpha") - alpha) <= 1e-3)
    assert(pl.getAs[Double]("alpha") > 1.0) // MLE is > 1 by construction

    val vw = SparkEntry.queries("q_vwap")(spark, sf).collect()
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"),
        get_json_object(col("props"), "$.k").cast("long")).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (math.round(r.getDouble(2) * 100), r.getLong(3))))
    vw.foreach { r =>
      val rows = ev.filter(_._1 == (r.getString(0), r.getDate(1).toString))
        .map(_._2)
      val sk = rows.map(_._2).sum
      assert(sk > 0)
      val ref = rows.map(x => x._1 * x._2).sum.toDouble / sk / 100.0
      assert(math.abs(r.getAs[Double]("vwap") - ref) <= 1e-3,
        s"${r.getString(0)}/${r.getDate(1)}: vwap")
    }
  }

  test("q_repeat_purchase, q_simpson_diversity, q_price_elasticity references") {
    val rp = SparkEntry.queries("q_repeat_purchase")(spark, sf).collect().head
    val counts = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.length)
    assert(rp.getAs[Long]("n_purchasers") === counts.size.toLong)
    assert(rp.getAs[Long]("n_repeat") === counts.count(_ >= 2).toLong)
    assert(math.abs(rp.getAs[Double]("avg_purchases")
      - counts.sum.toDouble / counts.size) <= 1e-3)

    val sd = SparkEntry.queries("q_simpson_diversity")(spark, sf).collect()
    val toks = graft.tables.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
    sd.foreach { r =>
      val m = toks.filter(_._1 == r.getString(0)).map(_._2)
        .groupBy(identity).map(_._2.length.toLong)
      val n = m.sum
      val ref = 1.0 - m.map(x => x * (x - 1)).sum.toDouble / (n.toDouble * (n - 1))
      assert(r.getAs[Long]("n_tok") === n)
      assert(r.getAs[Long]("vocab") === m.size.toLong)
      assert(math.abs(r.getAs[Double]("simpson_d") - ref) <= 1e-5)
    }

    val pe = SparkEntry.queries("q_price_elasticity")(spark, sf).collect().head
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_quantity").collect()
      .map(r => (math.round(math.log(r.getDouble(0) / r.getDouble(1)) * 1e4),
        math.round(math.log(r.getDouble(1)) * 1e4)))
    val n = li.length.toLong
    val sx = li.map(_._1).sum; val sy = li.map(_._2).sum
    val sxy = li.map(p => p._1 * p._2).sum
    val sxx = li.map(p => p._1 * p._1).sum
    val slope = (n.toDouble * sxy - sx.toDouble * sy) /
      (n.toDouble * sxx - sx.toDouble * sx)
    assert(pe.getAs[Long]("n") === n)
    assert(math.abs(pe.getAs[Double]("elasticity") - slope) <= 1e-3)
    // demand curves slope down: elasticity is negative on TPC-H-ish data
    assert(pe.getAs[Double]("elasticity") < 0.0)
  }

  test("q_volatility, q_dow_chi2, q_mix_entropy_daily references") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toString),
        math.floor(r.getDouble(2) * 1e3).toLong))
    val series = daily.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.groupBy(_._1._2).toArray.sortBy(_._1)
        .map { case (_, vs) => vs.map(_._2).sum / vs.length }
    }
    SparkEntry.queries("q_volatility")(spark, sf).collect().foreach { r =>
      val ys = series(r.getString(0))
      val rets = ys.zip(ys.tail).map { case (a, b) =>
        math.round(math.log(b.toDouble / a) * 1e6) }
      val n = rets.length
      val mean = rets.sum.toDouble / n / 1e6
      val vol = math.sqrt((rets.map(x => x * x).sum
        - rets.sum.toDouble * rets.sum / n) / (n - 1)) / 1e6
      assert(r.getAs[Long]("n_ret") === n.toLong)
      assert(math.abs(r.getAs[Double]("daily_vol") - vol) <= 1e-5)
      assert(math.abs(r.getAs[Double]("sharpe_annualized")
        - mean / vol * math.sqrt(365.0)) <= 1e-3)
    }
    val dc = SparkEntry.queries("q_dow_chi2")(spark, sf).collect()
    dc.foreach { r =>
      assert(r.getAs[Long]("n_weekdays") <= 7L)
      assert(r.getAs[Double]("dow_chi2") >= 0.0)
    }
    val me = SparkEntry.queries("q_mix_entropy_daily")(spark, sf).collect()
    me.foreach { r =>
      val h = r.getAs[Double]("mix_entropy")
      // 0 <= H <= ln(k)
      assert(h >= 0.0 && h <= math.log(r.getAs[Long]("k_types")
        .toDouble) + 1e-9)
    }
    // per-day entropy recompute on the first day
    val day0 = me.head
    val cells = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("event_type")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
      .filter(_._1 == day0.getDate(0).toString)
    val n = cells.length
    val hRef = cells.groupBy(_._2).map(_._2.length).map { c =>
      math.round(-1.0 * c / n * math.log(c.toDouble / n) * 1e9)
    }.sum / 1e9
    assert(math.abs(day0.getAs[Double]("mix_entropy") - hRef) <= 1e-6)
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
