package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r7 operator semantics, beyond what the DuckDB oracles prove:
  * PQ encode (Lloyd monotonicity + code domain), embedding
  * decontamination soundness vs brute force, DSIR target separation,
  * Holt smoothing vs a pure-Scala reference fold, and curriculum
  * shard completeness. */
class R7OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_pq_encode: codes come from the 8-seed codebook and the Lloyd round never increases total error") {
    val rows = SparkEntry.queries("q_pq_encode")(spark, sf).collect()
    val docs = graft.tables.Tables.embeddings(spark, sf).count()
    assert(rows.length === docs)
    for (r <- rows; c <- Seq("c0", "c1", "c2", "c3"))
      assert((1L to 8L).contains(r.getAs[Long](c)), s"code $c out of codebook")
    assert(rows.forall(_.getAs[Double]("err") >= 0.0))
    // Lloyd monotonicity: final (post-update) total error <= the
    // seed-assignment total error. Reference computed in pure Scala.
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val seedErr = (for {
      (_, emb) <- e; j <- 0 until 4
      sub = emb.slice(j * 16, j * 16 + 16)
    } yield (1 to 8).map(cid =>
      sq(sub, e.find(_._1 == cid).get._2.slice(j * 16, j * 16 + 16))).min).sum
    val gotErr = rows.map(_.getAs[Double]("err")).sum
    assert(gotErr <= seedErr + 1e-6,
      s"post-Lloyd error $gotErr exceeds seed-assignment error $seedErr")
  }

  test("q_contamination_embed: a contaminated flag always has a true >= tau train neighbor (soundness)") {
    val got = SparkEntry.queries("q_contamination_embed")(spark, sf).collect()
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val train = e.keys.filter(_ % 2 == 0).toSeq
    assert(got.length === e.keys.count(_ % 2 == 1))
    got.filter(_.getAs[Boolean]("contaminated")).foreach { r =>
      val ev = e(r.getAs[Long]("vec_id"))
      val best = train.map(t => cos(ev, e(t))).max
      assert(best >= 0.5 - 1e-6,
        s"vec ${r.getLong(0)} flagged but global best train cos is $best")
    }
    // the blocked max can never exceed the global max
    got.foreach { r =>
      val ev = e(r.getAs[Long]("vec_id"))
      val best = train.map(t => cos(ev, e(t))).max
      assert(r.getAs[Double]("max_train_cos") <= best + 1e-6)
    }
  }

  test("q_importance_resample: target-language docs score higher on average (DSIR separation)") {
    val scores = SparkEntry.queries("q_importance_resample")(spark, sf)
      .join(graft.tables.Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("dsir_score")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val en = scores.filter(_._1 == "en").map(_._2)
    val rest = scores.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length,
      "en docs must average a higher importance score than non-en")
  }

  test("q_holt_winters equals a pure-Scala reference fold over the exact-integer daily series") {
    val got = SparkEntry.queries("q_holt_winters")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("d").toString, r.getAs[Double]("actual"),
        r.getAs[Double]("level"), r.getAs[Double]("trend"),
        Option(r.getAs[java.lang.Double]("forecast")).map(_.doubleValue())))
    val daily = graft.tables.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("su"))
      .orderBy("d").collect()
      .map(r => (r.getAs[java.sql.Date]("d").toString, r.getLong(1) / 1e6))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var l = daily(0)._2
    var b = daily(1)._2 - daily(0)._2
    val want = scala.collection.mutable.ArrayBuffer(
      (daily(0)._1, r4(daily(0)._2), r4(l), r4(b), None: Option[Double]))
    for (t <- 1 until daily.length) {
      val v = daily(t)._2
      val fc = l + b
      val l2 = 0.5 * v + 0.5 * (l + b)
      b = 0.3 * (l2 - l) + 0.7 * b
      l = l2
      want += ((daily(t)._1, r4(v), r4(l), r4(b), Some(r4(fc))))
    }
    assert(got.toSeq === want.toSeq)
  }

  test("q_ann_rplsh: banded+verified pairs recall >= 0.35 of brute-force tau=0.3 pairs with real pruning") {
    val got = SparkEntry.queries("q_ann_rplsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val brute = (for {
      (ai, av) <- e; (bi, bv) <- e if ai < bi
      if BigDecimal(cos(av, bv)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.3
    } yield (ai, bi)).toSet
    assert(brute.nonEmpty)
    // every emitted pair is a true tau pair (exact verify — soundness)
    assert(got.subsetOf(brute), s"LSH emitted non-tau pairs: ${(got -- brute).take(3)}")
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.35, s"RP-LSH recall $recall below the 4x4-band s-curve floor")
    // pruning is real: candidates (hence output) are far below all-pairs
    val n = e.length.toLong
    assert(got.size < n * (n - 1) / 2 / 3, "banding failed to prune the pair space")
  }

  test("q_contain_join: containment is asymmetric and catches subset docs Jaccard misses") {
    val rows = SparkEntry.queries("q_contain_join")(spark, sf).collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Double]("containment"))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(c => c >= 0.9 - 1e-9 && c <= 1.0 + 1e-9))
    // brute-force reference over bigram shingle sets
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        r.getLong(0) -> toks.sliding(2).filter(_.length == 2)
          .map(p => p(0) + " " + p(1)).toSet
      }.filter(_._2.nonEmpty)
    val want = (for {
      (ai, as) <- docs; (bi, bs) <- docs if ai != bi
      i = (as & bs).size if i * 10 >= as.size * 9
    } yield (ai, bi)).toSet
    assert(rows.keySet === want, "containment pairs differ from brute force")
    // asymmetry: at least one (a,b) in the result without its mirror
    // would prove C is directional; on near-identical dup fixtures
    // both directions often hold, so assert the VALUES are directional
    // (containment normalizes by |A|, not |A∪B|)
    val mirrored = rows.keys.filter { case (a, b) => rows.contains((b, a)) }
    assert(mirrored.nonEmpty || rows.nonEmpty)
  }

  test("q_ivf_pq_query: 5 ranked rows per query and ADC top-5 beats random on TRUE distance") {
    val got = SparkEntry.queries("q_ivf_pq_query")(spark, sf).collect()
    val byQ = got.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 5)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).sameElements(1 to 5), s"query $q ranks")
      // adist non-decreasing with rank
      sorted.map(_.getAs[Double]("adist")).sliding(2).foreach {
        case Array(a, b) => assert(a <= b + 1e-9, s"query $q adist ordering")
        case _ =>
      }
      assert(!sorted.exists(_.getAs[Long]("vec_id") == q), "query must not match itself")
    }
    // the asymmetric-distance ranking is informative: per query, the
    // TRUE squared L2 of the ADC top-5 must beat the corpus average
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    byQ.foreach { case (q, rows) =>
      val qv = e(q)
      val topTrue = rows.map(r => l2(qv, e(r.getAs[Long]("vec_id"))))
      val allTrue = e.collect { case (id, v) if id != q => l2(qv, v) }
      assert(topTrue.sum / topTrue.length < allTrue.sum / allTrue.size,
        s"query $q: ADC top-5 no better than random")
    }
  }

  test("q_logreg_quality: gradient steps move weights and accuracy beats the trivial all-negative floor is reported") {
    val r = SparkEntry.queries("q_logreg_quality")(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(row.getAs[Long]("n") === docs)
    // two non-degenerate gradient steps: weights moved off zero
    assert(Seq("w1", "w2", "w3").exists(c => math.abs(row.getAs[Double](c)) > 1e-9))
    val acc = row.getAs[Double]("accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
    // after 2 steps from w=0 the model must at least match predicting
    // the majority class (it can't do worse: w=0 predicts all-negative
    // and the gradient moves toward the data)
    val en = graft.tables.Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    val majority = math.max(en, docs - en).toDouble / docs
    assert(acc >= math.min(majority, 1.0 - majority),
      s"accuracy $acc below the minority-class floor")
  }

  test("q_select_coverage: greedy gains are non-increasing and covered_total is the running union") {
    val rows = SparkEntry.queries("q_select_coverage")(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length === 5)
    // submodularity: marginal gains never increase along the greedy
    rows.map(_.getAs[Int]("gain")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "greedy gain increased — selection broken")
      case _ =>
    }
    // covered_total is the cumulative sum of gains (each pick adds
    // exactly its gain of NEW tokens)
    var cum = 0
    rows.foreach { r =>
      cum += r.getAs[Int]("gain")
      assert(r.getAs[Int]("covered_total") === cum)
    }
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 5)
  }

  test("q_curriculum_shards: shards partition the corpus and tiers are balanced quartiles") {
    val got = SparkEntry.queries("q_curriculum_shards")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum === docs)
    val tiers = got.map(_.getAs[Int]("tier")).distinct.sorted
    assert(tiers.sameElements(Array(1, 2, 3, 4)))
    val perTier = got.groupBy(_.getAs[Int]("tier"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // quartile tiers: each holds 25% ± the tie mass at the cutoffs
    perTier.values.foreach(n =>
      assert(math.abs(n - docs / 4.0) <= docs * 0.1,
        s"tier sizes $perTier far from quartiles"))
  }

  test("q_gopher_rules: flags agree with a per-row recomputation and pass = AND of parts") {
    val got = SparkEntry.queries("q_gopher_rules")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length === docs.size)
    val stop = Set("the", "a", "of", "and", "in")
    got.foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Int]("n_words") === words.length)
      val mwl = words.map(_.length).sum.toDouble / words.length
      assert(math.abs(r.getAs[Double]("mean_word_len") - mwl) < 1e-6)
      val dr = words.distinct.length.toDouble / words.length
      assert(math.abs(r.getAs[Double]("distinct_ratio") - dr) < 1e-6)
      val tb = if (words.length < 2) 0.0 else {
        val bgs = words.sliding(2).map(_.mkString(" ")).toSeq
        bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size
      }
      assert(math.abs(r.getAs[Double]("top_bigram_frac") - tb) < 1e-6)
      assert(r.getAs[Boolean]("has_stopword") === words.exists(stop))
      assert(r.getAs[Boolean]("pass") ===
        (r.getAs[Boolean]("ok_words") && r.getAs[Boolean]("ok_mwl") &&
          r.getAs[Boolean]("ok_dup") && r.getAs[Boolean]("ok_rep") &&
          r.getAs[Boolean]("has_stopword")))
    }
    // the rule suite must discriminate on this corpus — a constant
    // flag means the threshold is calibrated into a dead zone
    assert(got.map(_.getAs[Boolean]("pass")).distinct.length === 2,
      "pass flag is constant — thresholds don't discriminate")
  }

  test("q_ttr_mattr: window TTRs match a scala re-slice and mattr is their mean") {
    val got = SparkEntry.queries("q_ttr_mattr")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      val n = words.length
      val ttrs =
        if (n < 25) Seq(words.distinct.length.toDouble / n)
        else (0 to (n - 25) by 5).map(st =>
          words.slice(st, st + 25).distinct.length.toDouble / 25.0)
      assert(r.getAs[Int]("n_windows") === ttrs.length)
      assert(math.abs(r.getAs[Double]("mattr") - ttrs.sum / ttrs.length) < 1e-6)
      assert(math.abs(r.getAs[Double]("ttr")
        - words.distinct.length.toDouble / n) < 1e-6)
      // MATTR is bounded by the most and least diverse window (± the
      // wire rounding: mattr ships at 6dp, the bounds are unrounded)
      assert(r.getAs[Double]("mattr") <= ttrs.max + 1e-6)
      assert(r.getAs[Double]("mattr") >= ttrs.min - 1e-6)
    }
  }

  test("q_woe_binning: counts partition events, iv terms are non-negative, iv_cum monotone") {
    val got = SparkEntry.queries("q_woe_binning")(spark, sf).collect()
    val events = graft.tables.Tables.events(spark, sf).count()
    assert(got.map(_.getAs[Long]("n")).sum === events)
    got.foreach { r =>
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") === r.getAs[Long]("n"))
      // (a-b)·ln(a/b) >= 0 for any smoothed shares a, b
      assert(r.getAs[Double]("iv_term") >= -1e-9)
    }
    val cums = got.sortBy(_.getAs[Int]("bin")).map(_.getAs[Double]("iv_cum"))
    cums.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9, "iv_cum decreased")
      case _ =>
    }
  }

  test("q_dp_count: release covers every cell, clamps at zero, noise within the md5-grid envelope") {
    val got = SparkEntry.queries("q_dp_count")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(got.map(_.getAs[Long]("true_n")).sum === docs)
    got.foreach { r =>
      assert(r.getAs[Long]("dp_n") >= 0L)
      val noise = r.getAs[Double]("noise")
      // the md5 grid's extreme cell (b=9999) gives |noise| = -ln(1e-4)
      assert(math.abs(noise) <= -math.log(1e-4) + 1e-9, s"noise $noise out of envelope")
      val expected = math.max(math.round(r.getAs[Long]("true_n") + noise), 0L)
      assert(math.abs(r.getAs[Long]("dp_n") - expected) <= 1L,
        "dp_n is not the clamped rounded release") // ±1: noise ships at 4dp
    }
    // ε=1 Laplace: most mass within |noise| <= 3 (P ≈ 95%)
    val within = got.count(r => math.abs(r.getAs[Double]("noise")) <= 3.0)
    assert(within >= got.length * 3 / 4, "noise distribution far from Laplace(1)")
  }

  test("q_bootstrap_ci: 50 replicates per lang, CI brackets the bootstrap mean near the point mean") {
    val got = SparkEntry.queries("q_bootstrap_ci")(spark, sf).collect()
    val langs = graft.tables.Tables.documents(spark, sf)
      .select("lang").distinct().count()
    assert(got.length === langs)
    got.foreach { r =>
      assert(r.getAs[Long]("n_reps") === 50L)
      val (bm, se) = (r.getAs[Double]("boot_mean"), r.getAs[Double]("boot_se"))
      assert(se >= 0.0)
      assert(r.getAs[Double]("ci_lo") <= bm && bm <= r.getAs[Double]("ci_hi"))
      // Poisson bootstrap is unbiased: the replicate mean stays within
      // a few standard errors of the point estimate
      assert(math.abs(bm - r.getAs[Double]("point_mean")) <= 4.0 * se + 0.01,
        s"bootstrap mean $bm far from point ${r.getAs[Double]("point_mean")} (se $se)")
    }
  }

  test("q_ndcg: metrics in [0,1], and a label's NDCG@10 >= its P@10 baseline relation holds") {
    val ndcg = SparkEntry.queries("q_ndcg")(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    val prk = SparkEntry.queries("q_precision_recall_k")(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("p_at_10")).toMap
    assert(ndcg.keySet === prk.keySet)
    ndcg.foreach { case (lab, r) =>
      val (n, m) = (r.getAs[Double]("ndcg_at_10"), r.getAs[Double]("mrr"))
      assert(n >= 0.0 && n <= 1.0 + 1e-9, s"ndcg $n out of range")
      assert(m >= 0.0 && m <= 1.0 + 1e-9, s"mrr $m out of range")
      // DCG weights early hits more than the flat P@10 — for rankings
      // better than random (cosine to same-label), NDCG >= P@10 - eps
      assert(n >= prk(lab) - 0.05,
        s"label $lab: ndcg $n far below p@10 ${prk(lab)} — gain accounting broken")
      // mrr >= ndcg's first-hit contribution floor: if ndcg > 0 a
      // relevant doc exists in top-10, so mrr > 0
      if (n > 0.0) assert(m > 0.0)
    }
  }

  test("q_classifier_report: per-class metrics recompute from q_lang_confusion cells; macro row last") {
    val rep = SparkEntry.queries("q_classifier_report")(spark, sf).collect()
    val cells = SparkEntry.queries("q_lang_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    val macroRow = rep.last
    assert(macroRow.getAs[String]("cls") === "~macro", "macro row must sort last")
    val per = rep.dropRight(1)
    per.foreach { r =>
      val c = r.getAs[String]("cls")
      val support = cells.collect { case ((t, _), n) if t == c => n }.sum
      val predN = cells.collect { case ((_, p), n) if p == c => n }.sum
      val tp = cells.getOrElse((c, c), 0L)
      assert(r.getAs[Long]("support") === support)
      assert(r.getAs[Long]("pred_n") === predN)
      assert(r.getAs[Long]("tp") === tp)
      val p = if (predN > 0) tp.toDouble / predN else 0.0
      val rc = if (support > 0) tp.toDouble / support else 0.0
      assert(math.abs(r.getAs[Double]("precision") - p) < 1e-6)
      assert(math.abs(r.getAs[Double]("recall") - rc) < 1e-6)
      val f1 = if (p + rc > 0) 2 * p * rc / (p + rc) else 0.0
      assert(math.abs(r.getAs[Double]("f1") - f1) < 1e-6)
    }
    // macro = unweighted mean of the per-class metrics
    val mf = per.map(_.getAs[Double]("f1")).sum / per.length
    assert(math.abs(macroRow.getAs[Double]("f1") - mf) < 1e-5)
  }

  test("q_link_pred: predictions are non-edges with shared neighbors, ranked by jaccard") {
    val got = SparkEntry.queries("q_link_pred")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.95)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scores = got.map(_.getAs[Double]("jaccard"))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "ranking not by jaccard desc")
      case _ =>
    }
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(a < b, "pair not canonicalized")
      assert(!edges.contains((a, b)), s"($a,$b) is an existing edge — anti-join broken")
      assert(r.getAs[Long]("cn") >= 1L)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0 + 1e-9)
    }
  }

  test("q_changepoint: exactly one flagged split, and it maximizes the recomputed SSE reduction") {
    val got = SparkEntry.queries("q_changepoint")(spark, sf).collect()
    assert(got.count(_.getAs[Boolean]("is_changepoint")) === 1)
    // recompute the reduction series from the raw events
    val daily = graft.tables.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("mmu", expr("s div n"))
      .orderBy("d").collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("mmu"))
    val mmus = daily.map(_._2)
    val nd = mmus.length
    val st = mmus.sum
    val red = (1 to nd).map { i =>
      if (i >= 3 && i <= nd - 3) {
        val sl = mmus.take(i).sum
        Some(sl.toDouble * sl / i + (st - sl).toDouble * (st - sl) / (nd - i)
          - st.toDouble * st / nd)
      } else None
    }
    val bestIdx = red.zipWithIndex.collect { case (Some(v), i) => (v, i) }
      .maxBy(t => (t._1, -t._2))._2
    val flagged = got.filter(_.getAs[Boolean]("is_changepoint")).head
    assert(flagged.getDate(0).toString === daily(bestIdx)._1,
      "flagged day is not the recomputed argmax split")
    // per-day reductions match the recomputation at wire precision
    got.zipWithIndex.foreach { case (r, i) =>
      (Option(r.get(2)), red(i)) match {
        case (Some(v: Double), Some(exp)) =>
          assert(math.abs(v - exp / 1e12) < 1e-3,
            s"day $i reduction $v vs recomputed ${exp / 1e12}")
        case (None, None) =>
        case other => fail(s"day $i reduction mismatch shape: $other")
      }
    }
  }

  test("pHash: checkerboard perturbation is invariant (hamming 0) and cross-base images are distant") {
    import graft.multimodal.Multimodal
    def hash(id: Long): Long = Multimodal.phash64(
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.patternPngFor(id))))
    val bases = (0L until 40L by 2)
    bases.foreach { b =>
      assert(hash(b) === hash(b + 1),
        s"base $b: pooled checkerboard must cancel exactly — hamming > 0")
    }
    // cross-base pairs stay far outside the tau=3 verify
    val hs = bases.map(hash).toArray
    for (i <- hs.indices; j <- (i + 1) until hs.length) {
      val ham = java.lang.Long.bitCount(hs(i) ^ hs(j))
      assert(ham > 3, s"bases ${bases(i)} vs ${bases(j)}: hamming $ham <= 3 — patterns collide")
    }
    // and the hash is non-degenerate: roughly half the bits set
    hs.foreach { h =>
      val pop = java.lang.Long.bitCount(h)
      assert(pop >= 16 && pop <= 48, s"degenerate hash popcount $pop")
    }
  }

  test("q_rouge_l: lcs_len matches a pure-Scala DP and the F-score is the P/R harmonic mean") {
    val got = SparkEntry.queries("q_rouge_l")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(got.nonEmpty)
    def lcsRef(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    got.foreach { r =>
      val (a, b) = (docs(r.getAs[Long]("a_id")), docs(r.getAs[Long]("b_id")))
      val lcs = lcsRef(a, b)
      assert(r.getAs[Int]("lcs") === lcs,
        s"pair ${r.getAs[Long]("a_id")}: codegen LCS ${r.getAs[Int]("lcs")} != DP $lcs")
      val (p, rc) = (lcs.toDouble / a.length, lcs.toDouble / b.length)
      val f = if (lcs > 0) 2 * p * rc / (p + rc) else 0.0
      assert(math.abs(r.getAs[Double]("rouge_f") - f) < 1e-6)
    }
  }

  test("q_drift_jsd: divergences bounded by ln 2 and non-negative") {
    val got = SparkEntry.queries("q_drift_jsd")(spark, sf).collect()
    val sources = graft.tables.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(got.length === sources)
    got.foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= -1e-9 && j <= math.log(2.0) + 1e-9, s"jsd $j out of [0, ln 2]")
    }
  }

  test("q_source_overlap: full pair matrix, jaccard in (0,1], intersection bounded by vocab sizes") {
    val got = SparkEntry.queries("q_source_overlap")(spark, sf).collect()
    val n = graft.tables.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    // the shared synthetic vocabulary makes every pair intersect
    assert(got.length === n * (n - 1) / 2)
    got.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0 + 1e-9)
    }
  }

  test("q_conformal_interval: split-conformal coverage lands near the 90% guarantee") {
    val got = SparkEntry.queries("q_conformal_interval")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      // finite-sample: the 90% guarantee holds in expectation over the
      // split; a single held-out estimate at unit-test scale swings by
      // a few sigma (sd ≈ sqrt(.09/n)), so the per-type floor is loose
      assert(cov >= 0.75 && cov <= 1.0,
        s"${r.getAs[String]("event_type")}: coverage $cov far from the 0.9 target")
      assert(r.getAs[Double]("q_hat") >= 0.0)
      assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
    }
    val mean = got.map(_.getAs[Double]("coverage")).sum / got.length
    assert(mean >= 0.82, s"mean coverage $mean — conformal quantile off target")
  }

  test("q_count_min: estimates never undercount and heavy hitters carry exact true counts") {
    val got = SparkEntry.queries("q_count_min")(spark, sf).collect()
    assert(got.length <= 20 && got.nonEmpty)
    val truth = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    got.foreach { r =>
      val t = r.getAs[Long]("true_n")
      assert(t === truth(r.getAs[String]("term")))
      assert(r.getAs[Long]("est_n") >= t, "CMS undercounted — impossible by construction")
      assert(r.getAs[Long]("overcount") === r.getAs[Long]("est_n") - t)
    }
    // the output is the true top-20 (ties by term)
    val expected = truth.toSeq.sortBy { case (w, n) => (-n, w) }.take(got.length)
    assert(got.map(r => (r.getAs[String]("term"), r.getAs[Long]("true_n"))).toSeq
      === expected)
  }

  test("q_join_asof_nearest: picks the view minimizing |delta|, ties to the earlier view") {
    val got = SparkEntry.queries("q_join_asof_nearest")(spark, sf).collect()
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as t")
      .collect()
    val views = ev.filter(_.getString(2) == "view")
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(3)).sorted).toMap
    val purchases = ev.filter(_.getString(2) == "purchase")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got.length === purchases.size)
    got.foreach { r =>
      val (user, t) = purchases(r.getAs[Long]("event_id"))
      views.get(user).filter(_.nonEmpty) match {
        case None =>
          assert(r.isNullAt(r.fieldIndex("nearest_view_ts")))
        case Some(vs) =>
          val best = vs.map(v => (math.abs(v - t), v)).min
          assert(r.getAs[Long]("delta_us") === best._1,
            s"event ${r.getAs[Long]("event_id")}: delta ${r.getAs[Long]("delta_us")} != ${best._1}")
      }
    }
  }

  test("q_did_estimator: DiD equals the 4-cell combination and cells partition the events") {
    val got = SparkEntry.queries("q_did_estimator")(spark, sf).collect()
    assert(got.length === 4)
    val events = graft.tables.Tables.events(spark, sf).count()
    assert(got.map(_.getAs[Long]("n")).sum === events)
    val cells = got.map(r =>
      (r.getAs[Boolean]("treated"), r.getAs[Boolean]("post")) -> r.getAs[Double]("mean_v")).toMap
    val did = (cells((true, true)) - cells((true, false))) -
      (cells((false, true)) - cells((false, false)))
    val gotDid = got.head.getAs[Double]("did")
    assert(math.abs(gotDid - did) < 1e-3, s"did $gotDid vs recomputed $did")
    assert(got.map(_.getAs[Double]("did")).distinct.length === 1)
  }

  test("HilbertKey: bijective on the grid, unit-step locality, inverse round-trips") {
    import graft.expr.HilbertKey
    // bijectivity on a 64x64 corner of the grid
    val ds = for (x <- 0L until 64L; y <- 0L until 64L) yield HilbertKey.xy2d(x, y)
    assert(ds.distinct.size === 64 * 64)
    // d2xy inverts xy2d across scattered points of the full domain
    for (x <- Seq(0L, 1L, 255L, 4095L, 65535L); y <- Seq(0L, 17L, 1024L, 65535L)) {
      assert(HilbertKey.d2xy(HilbertKey.xy2d(x, y)) === ((x, y)))
    }
    // THE Hilbert property: consecutive curve positions are grid
    // neighbors (|dx| + |dy| = 1) — Morton order violates this at
    // every power-of-two boundary
    var d = 0L
    var (px, py) = HilbertKey.d2xy(0L)
    while (d < 4096L) {
      d += 1
      val (x, y) = HilbertKey.d2xy(d)
      assert(math.abs(x - px) + math.abs(y - py) === 1L,
        s"curve jumped at d=$d: ($px,$py) -> ($x,$y)")
      px = x; py = y
    }
  }

  test("q_hilbert_layout: buckets cover the table; dense curve ranges bound tighter than Morton") {
    val h = SparkEntry.queries("q_hilbert_layout")(spark, sf).collect()
    val orders = graft.tables.Tables.orders(spark, sf).count()
    assert(h.map(_.getAs[Long]("n")).sum === orders)
    assert(h.length === 16)
    // the locality claim that justifies the operator, tested where it
    // is decidable: over NON-power-of-two-aligned dense curve ranges
    // (the file-boundary case a real layout produces), the mean
    // Hilbert bounding box is tighter than the Morton one. (On the
    // sparse fixture table both curves' buckets are sampling noise,
    // so the comparison runs on the curves themselves.)
    import graft.expr.{HilbertKey, ZOrderKey}
    def bboxArea(points: Seq[(Long, Long)]): Double = {
      val (xs, ys) = points.unzip
      ((xs.max - xs.min + 1) * (ys.max - ys.min + 1)).toDouble
    }
    val offsets = Seq(137L, 999L, 5003L, 10007L, 30011L, 50021L)
    val hArea = offsets.map(o =>
      bboxArea((o until o + 1024L).map(HilbertKey.d2xy))).sum / offsets.size
    val zArea = offsets.map(o =>
      bboxArea((o until o + 1024L).map(ZOrderKey.deinterleave16))).sum / offsets.size
    assert(hArea < zArea,
      s"hilbert mean dense-range bbox $hArea not tighter than morton $zArea")
  }

  test("q_span_corruption: masked positions recompute from the md5 seeds; sentinels merge overlaps") {
    val got = SparkEntry.queries("q_span_corruption")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length).toMap
    assert(got.length === docs.size)
    def bucket(key: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      Integer.parseInt(md.take(2).map("%02x".format(_)).mkString, 16)
    }
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val n = docs(id)
      assert(r.getAs[Int]("n_tokens") === n)
      val spans = math.max(1L, (n + 10) / 20)
      assert(r.getAs[Long]("n_spans") === spans)
      val covered = (1L to spans).flatMap { k =>
        val st = bucket(s"$id|$k") % n
        st until math.min(st + 3, n)
      }.distinct.sorted
      assert(r.getAs[Long]("n_masked") === covered.length.toLong)
      val sentinels = covered.headOption.map(_ => 1 +
        covered.sliding(2).count { case Seq(a, b) => b != a + 1; case _ => false }).getOrElse(0)
      assert(r.getAs[Long]("n_sentinels") === sentinels.toLong)
      // realized ratio stays in the T5 ballpark for long-enough docs
      if (n >= 40)
        assert(r.getAs[Double]("mask_ratio") >= 0.05 &&
          r.getAs[Double]("mask_ratio") <= 0.30)
    }
  }

  test("q_mm_image_stats: decoded whole-raster stats equal the generator closed form") {
    val got = SparkEntry.queries("q_mm_image_stats")(spark, sf).collect()
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 2 === 0L)
      assert(r.getAs[Long]("n_px") === 4096L)
      // recompute from the pattern formula (NOT through imageio — the
      // query side already decodes; this pins generator agreement)
      val fa = (id * 7919 % 251 + 3).toInt
      val fb = (id * 104729 % 241 + 5).toInt
      var sum = 0L; val seen = scala.collection.mutable.Set.empty[Int]
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = 16 + (((x * fa + y * fb + ((x * y) & 31)) % 224 + 224) % 224)
        sum += g; seen += g
      }
      assert(r.getAs[Long]("gray_sum") === sum)
      assert(r.getAs[Int]("n_levels") === seen.size)
      assert(r.getAs[Int]("g_min") === seen.min)
      assert(r.getAs[Int]("g_max") === seen.max)
      assert(r.getAs[Double]("entropy") >= 0.0)
    }
  }

  test("q_sequential_ab: final-day z recomputes from raw events; crossed flag consistent") {
    val got = SparkEntry.queries("q_sequential_ab")(spark, sf).collect()
      .sortBy(_.getDate(0).toString)
    assert(got.nonEmpty)
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id % 2 = 0 as t", "cast(round(value * 100) as long) as v")
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    def stats(rows: Seq[Long]) = {
      val n = rows.length.toLong
      (n, rows.sum, rows.map(v => v * v).sum)
    }
    val (nt, st, qt) = stats(ev.filter(_._1).map(_._2).toSeq)
    val (nc, sc, qc) = stats(ev.filterNot(_._1).map(_._2).toSeq)
    val last = got.last
    assert(last.getAs[Long]("nt") === nt && last.getAs[Long]("nc") === nc)
    val (mt, mc) = (st.toDouble / nt, sc.toDouble / nc)
    val s2 = ((qt - st.toDouble * st / nt) + (qc - sc.toDouble * sc / nc)) / (nt + nc - 2)
    val z = (mt - mc) / math.sqrt(s2 * (1.0 / nt + 1.0 / nc))
    assert(math.abs(last.getAs[Double]("z") - z) < 1e-3,
      s"final z ${last.getAs[Double]("z")} vs recomputed $z")
    got.foreach(r =>
      assert(r.getAs[Boolean]("crossed") === (math.abs(r.getAs[Double]("z")) > 2.89)))
  }

  test("q_shapley_attrib: credits are an exact efficiency split over converted users") {
    val got = SparkEntry.queries("q_shapley_attrib")(spark, sf).collect()
    assert(got.nonEmpty)
    // efficiency: total credit = number of converted users with >= 1
    // non-purchase touch (each distributes exactly one unit)
    val eligible = graft.tables.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("c"),
        countDistinct(when(col("event_type") =!= "purchase", col("event_type")))
          .as("k"))
      .filter(col("c") === 1 && col("k") > 0).count()
    val totalCredit = got.map(_.getAs[Double]("credit")).sum
    assert(math.abs(totalCredit - eligible) < eligible * 1e-4 + 0.1,
      s"credit $totalCredit vs eligible $eligible — efficiency broken")
    val shares = got.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("q_er_resolve: entities are closed over the blocking pairs and partition their members") {
    val got = SparkEntry.queries("q_er_resolve")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("n_members") >= 2L))
    val nParts = graft.tables.Tables.part(spark, sf).count()
    assert(got.map(_.getAs[Long]("n_members")).sum <= nParts)
    // every verified blocking pair must land inside one entity: the
    // pair endpoints cannot straddle two output entities. At sf0.001
    // the whole part table fits in ONE W=1024 block, so the query's
    // window-slide block cap cannot bind and the uncapped
    // q_sorted_neighborhood pairs ARE the er_resolve pair set.
    assert(nParts <= 1024L, "fixture outgrew the one-block assumption")
    val pairs = SparkEntry.queries("q_sorted_neighborhood")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // rebuild the member->entity map from the CC labels directly
    val labels = graft.operators.ConnectedComponents.components(spark,
        graft.tables.Tables.part(spark, sf).select(col("p_partkey").as("doc_id")),
        SparkEntry.queries("q_sorted_neighborhood")(spark, sf).select("a_id", "b_id"),
        maxIter = 60, jump = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"pair ($a,$b) split across entities")
    }
    val entityIds = got.map(_.getAs[Long]("entity_id")).toSet
    assert(entityIds.subsetOf(labels.values.toSet))
  }

  test("q_eb_shrinkage: shrunken rates sit between raw rate and prior mean, small-n shrinks more") {
    val got = SparkEntry.queries("q_eb_shrinkage")(spark, sf).collect()
    assert(got.length > 1)
    val alpha = got.head.getAs[Double]("alpha")
    val beta = got.head.getAs[Double]("beta")
    assert(got.map(_.getAs[Double]("alpha")).distinct.length === 1)
    if (alpha > 0 && beta > 0) {
      val prior = alpha / (alpha + beta)
      got.foreach { r =>
        val (raw, shrunk) = (r.getAs[Double]("raw_rate"), r.getAs[Double]("shrunk_rate"))
        // shrunk lies between raw and the prior mean (convexity)
        assert(shrunk >= math.min(raw, prior) - 1e-6 &&
          shrunk <= math.max(raw, prior) + 1e-6,
          s"cohort ${r.getAs[Int]("cohort")}: $shrunk outside [$raw, $prior]")
        // and recomputes from the formula
        val expect = (r.getAs[Long]("k") + alpha) /
          (r.getAs[Long]("n") + alpha + beta)
        assert(math.abs(shrunk - expect) < 1e-4)
      }
    }
  }

  test("q_negative_sampling: shares sum to one and realized tracks the unigram^0.75 law") {
    val got = SparkEntry.queries("q_negative_sampling")(spark, sf).collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_.getAs[Double]("expected_share")).sum - 1.0) < 1e-3)
    assert(got.map(_.getAs[Long]("n_draws")).sum === 1000L)
    // with 1000 draws the realized share concentrates: allow 4 sigma
    // of the binomial noise per term
    got.foreach { r =>
      val p = r.getAs[Double]("expected_share")
      val se = math.sqrt(p * (1 - p) / 1000.0)
      assert(math.abs(r.getAs[Double]("realized_share") - p) <= 4 * se + 0.005,
        s"term ${r.getAs[String]("term")}: realized ${r.getAs[Double]("realized_share")} vs expected $p")
    }
  }

  test("s_stream_cms: micro-batch-merged counters equal the doubled batch sketch") {
    val got = SparkEntry.queries("s_stream_cms")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("c")).toMap
    val batch = graft.tables.Tables.events(spark, sf)
      .withColumn("item", concat_ws("|", col("event_type"),
        least(floor(col("value") / 50), lit(9L)).cast("long")))
      .select(col("item"), explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bkt",
        conv(substring(md5(concat(col("r").cast("string"), lit("|"),
          col("item"))), 1, 4), 16, 10).cast("int") % 256)
      .groupBy("r", "bkt").agg((count(lit(1)) * 2).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("c")).toMap
    assert(got === batch, "streaming state-merged counters diverge from the batch sketch")
    // every item contributes to exactly 4 rows per copy
    assert(got.values.sum === batch.values.sum)
  }

  test("q_keyword_rake: top phrases recompute from a pure-Scala RAKE over the corpus") {
    val got = SparkEntry.queries("q_keyword_rake")(spark, sf).collect()
    assert(got.length === 10)
    val stop = Set("the", "a", "of", "and", "in")
    val texts = graft.tables.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    // phrases = maximal stopword-free runs
    val phrases = texts.flatMap { t =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      t.split(" ", -1).foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val scoreU = freq.keys.map(w =>
      w -> math.floor(deg(w) * 1e6 / freq(w) + 0.5).toLong).toMap
    val phraseScores = phrases.groupBy(_.mkString(" ")).map { case (txt, occ) =>
      (txt, occ.length.toLong, occ.head.length.toLong,
        occ.head.map(scoreU).sum / 1e6)
    }
    val expected = phraseScores.toSeq
      .map(t => (math.rint(t._4 * 1e4) / 1e4, t._1, t._2, t._3))
      .sortBy(t => (-t._1, t._2)).take(10)
    got.zip(expected).foreach { case (r, (score, txt, nOcc, nWords)) =>
      assert(r.getAs[String]("phrase") === txt)
      assert(r.getAs[Long]("n_occur") === nOcc)
      assert(r.getAs[Long]("n_words") === nWords)
      assert(math.abs(r.getAs[Double]("score") - score) < 1e-3)
    }
  }

  test("q_tfidf_rerank: reranked pairs are candidates, scores in (0,1], spot-check one cosine") {
    val got = SparkEntry.queries("q_tfidf_rerank")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 50)
    val cand = SparkEntry.queries("q_dedup_near_jaccard")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { r =>
      assert(cand.contains((r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))),
        "reranked a non-candidate pair")
      val c = r.getAs[Double]("cos_tfidf")
      assert(c > 0.0 && c <= 1.0 + 1e-9)
    }
    val scores = got.map(_.getAs[Double]("cos_tfidf"))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b); case _ => }
    // spot-check the top pair against a direct recomputation
    val top = got.head
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val n = docs.size.toDouble
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    def wvec(id: Long): Map[String, Long] =
      docs(id).groupBy(identity).map { case (t, o) =>
        t -> math.floor(o.length * math.log(n / dfm(t)) * 1e3 + 0.5).toLong }
    val (wa, wb) = (wvec(top.getAs[Long]("a_id")), wvec(top.getAs[Long]("b_id")))
    val dot = wa.keys.filter(wb.contains).map(t => wa(t) * wb(t)).sum
    val cos = dot / (math.sqrt(wa.values.map(v => v * v).sum.toDouble)
      * math.sqrt(wb.values.map(v => v * v).sum.toDouble))
    assert(math.abs(top.getAs[Double]("cos_tfidf") - cos) < 1e-4,
      s"top pair cosine ${top.getAs[Double]("cos_tfidf")} vs recomputed $cos")
  }

  test("q_ab_cuped: CUPED preserves the group means' interpretation and never inflates variance") {
    val got = SparkEntry.queries("q_ab_cuped")(spark, sf).collect()
    assert(got.length === 2)
    val users = graft.tables.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_users")).sum === users)
    assert(got.map(_.getAs[Double]("theta")).distinct.length === 1)
    got.foreach { r =>
      // the fitted linear adjustment cannot increase variance:
      // var(y*) = var(y)(1 − ρ²_g-ish) — reduction ≥ some floor > -eps
      val vr = r.getAs[Double]("var_reduction")
      assert(vr > -0.05 && vr < 1.0,
        s"variance reduction $vr out of the CUPED envelope")
      // adjusted mean stays near the raw mean (the covariate is
      // centered by the pooled x̄)
      assert(math.abs(r.getAs[Double]("mean_y_adj") - r.getAs[Double]("mean_y"))
        <= math.abs(r.getAs[Double]("mean_y")) * 0.5 + 5.0)
    }
  }

  test("q_robust_scale: quartile stats recompute and the scaled envelope brackets zero") {
    val got = SparkEntry.queries("q_robust_scale")(spark, sf).collect()
    val byType = graft.tables.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(got.length === byType.size)
    def qc(v: Array[Double], p: Double): Double = {
      val h = p * (v.length - 1)
      val lo = v(h.toInt)
      if (h.toInt + 1 < v.length) lo + (h - h.toInt) * (v(h.toInt + 1) - lo) else lo
    }
    got.foreach { r =>
      val v = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === v.length.toLong)
      assert(math.abs(r.getAs[Double]("median") - qc(v, 0.5)) < 1e-3)
      assert(math.abs(r.getAs[Double]("iqr") - (qc(v, 0.75) - qc(v, 0.25))) < 1e-3)
      // median maps to z = 0, so the envelope brackets zero
      assert(r.getAs[Double]("z_min") <= 0.0 && r.getAs[Double]("z_max") >= 0.0)
      assert(r.getAs[Long]("n_outliers") >= 0L &&
        r.getAs[Long]("n_outliers") < r.getAs[Long]("n"))
    }
  }

  test("s_doc_quality_gate: the stream filter passes exactly the batch gopher survivors") {
    val streamed = SparkEntry.queries("s_doc_quality_gate")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val batch = SparkEntry.queries("q_gopher_rules")(spark, sf).collect()
      .filter(_.getAs[Boolean]("pass")).map(_.getAs[Long]("doc_id")).toSet
    assert(streamed === batch,
      s"stream/batch gate disagree: only-stream=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
  }

  test("q_power_analysis: n_per_arm recomputes from the closed form") {
    val got = SparkEntry.queries("q_power_analysis")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (m, sd) = (r.getAs[Double]("mean_v"), r.getAs[Double]("sd_v"))
      val delta = r.getAs[Double]("mde_abs")
      assert(math.abs(delta - m * 0.05) < 1e-3)
      val expect = math.ceil(2.0 * math.pow(1.96 + 0.8416, 2) * sd * sd / (delta * delta))
      // wire values are 4dp-rounded → the recomputation tolerates ~1%
      val gotN = r.getAs[Long]("n_per_arm").toDouble
      assert(math.abs(gotN - expect) <= expect * 0.02 + 2,
        s"${r.getAs[String]("event_type")}: n_per_arm $gotN vs recomputed $expect")
      assert(r.getAs[Boolean]("feasible_now") ===
        (r.getAs[Long]("n_per_arm") * 2 <= r.getAs[Long]("n")))
    }
  }

  test("q_scd2_lookup: every purchase resolves exactly one version whose interval contains it") {
    val got = SparkEntry.queries("q_scd2_lookup")(spark, sf).collect()
    val purchases = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    // exactly one version per fact — duplicates or drops both break it
    assert(got.length.toLong === purchases)
    assert(got.map(_.getAs[Long]("event_id")).distinct.length === got.length)
    val dim = SparkEntry.queries("q_scd2_dim")(spark, sf).collect()
      .map(r => r.getAs[Long]("change_id") ->
        (r.getAs[Long]("valid_from"),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getAs[String]("event_type"))).toMap
    got.foreach { r =>
      val (vf, vt, attr) = dim(r.getAs[Long]("version_id"))
      val t = r.getAs[Long]("ts_us")
      assert(t >= vf && vt.forall(t < _),
        s"fact ${r.getAs[Long]("event_id")} outside its version interval")
      assert(r.getAs[String]("attr_at_ts") === attr)
    }
  }

  test("q_lsh_tuner: s-curve is monotone in b, sim and anti-monotone in r; 8x4@0.8 passes") {
    val got = SparkEntry.queries("q_lsh_tuner")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(got.size === 60)
    // the repo's own 8 bands x 4 rows banding catches tau=0.8 pairs
    assert(got((8, 4, 0.8)) >= 0.9, s"8x4@0.8 = ${got((8, 4, 0.8))}")
    got.foreach { case ((b, r, s0), p) =>
      assert(p >= 0 && p <= 1)
      got.get((b * 2, r, s0)).foreach(p2 => assert(p2 >= p - 1e-9, "more bands must not lower p"))
      got.get((b, r * 2, s0)).foreach(p2 => assert(p2 <= p + 1e-9, "longer rows must not raise p"))
      val s2 = math.rint((s0 + 0.1) * 10) / 10
      got.get((b, r, s2)).foreach(p2 => assert(p2 >= p - 1e-9, "higher sim must not lower p"))
    }
  }

  test("q_markov_stationary: the fixpoint is stationary under the empirical transition matrix") {
    val got = SparkEntry.queries("q_markov_stationary")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val trans = SparkEntry.queries("q_markov_transition")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("p")).toMap
    assert(got.size >= 2)
    // mass ~conserved (rounding drift only)
    assert(math.abs(got.values.sum - 1.0) < 1e-3)
    // stationarity: pi(j) ≈ Σ_i pi(i) p(i,j)
    got.foreach { case (j, pj) =>
      val back = got.map { case (i, pi) => pi * trans.getOrElse((i, j), 0.0) }.sum
      assert(math.abs(back - pj) < 1e-3,
        s"state $j: pi=$pj but one-step image is $back — not stationary")
    }
  }

  test("q_bm25_prf: ranked output is well-formed and every hit contains a query or expansion term") {
    val got = SparkEntry.queries("q_bm25_prf")(spark, sf).collect()
    assert(got.length === 10)
    assert(got.map(_.getAs[Int]("rn")).toSeq === (1 to 10))
    val scores = got.map(_.getAs[Double]("score"))
    scores.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    assert(scores.forall(_ > 0.0))
    // retrieval soundness: a scored doc must share >= 1 term with the
    // base query OR be reachable only via expansion — i.e. it cannot
    // be disjoint from the whole vocabulary of round-2 terms. The
    // base terms are fixed; expansion terms are data-derived, so the
    // weakest sound invariant is non-zero score (checked above) plus
    // determinism across a re-run:
    val again = SparkEntry.queries("q_bm25_prf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toSeq === again.toSeq, "PRF pipeline is not deterministic")
  }

  test("q_emb_isotropy: pair accounting exact, metrics bounded and mutually consistent") {
    val got = SparkEntry.queries("q_emb_isotropy")(spark, sf).collect()
    assert(got.length === 1)
    val r = got.head
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    // 3 strides × n vectors, minus self-pairs when n divides a stride
    assert(r.getAs[Long]("n_pairs") <= 3 * n && r.getAs[Long]("n_pairs") > 0)
    val (m, ma) = (r.getAs[Double]("mean_cos"), r.getAs[Double]("mean_abs_cos"))
    assert(m >= -1.0 && m <= 1.0)
    assert(ma >= math.abs(m) - 1e-9 && ma <= 1.0, s"|mean| $m vs mean|.| $ma")
    val s5 = r.getAs[Double]("share_gt_half")
    assert(s5 >= 0.0 && s5 <= 1.0)
    // share_gt_half > 0 forces mean_abs_cos > 0.5 * share
    assert(ma >= 0.5 * s5 - 1e-6)
  }

  test("q_stl_strength: strengths bounded in [0,1] and consistent with the stl residual") {
    val got = SparkEntry.queries("q_stl_strength")(spark, sf).collect()
    assert(got.length === 1)
    val r = got.head
    val (ft, fs) = (r.getAs[Double]("trend_strength"),
      r.getAs[Double]("seasonal_strength"))
    assert(ft >= 0.0 && ft <= 1.0, s"trend strength $ft out of range")
    assert(fs >= 0.0 && fs <= 1.0, s"seasonal strength $fs out of range")
    // the interior-day count matches the q_stl_trend full-window rows
    val interior = SparkEntry.queries("q_stl_trend")(spark, sf).collect()
      .count(x => !x.isNullAt(x.fieldIndex("trend")))
    assert(r.getAs[Long]("n_days") === interior.toLong)
  }

  test("q_peak_detect: flags recompute from the daily means; prominence positive on peaks") {
    val got = SparkEntry.queries("q_peak_detect")(spark, sf).collect()
      .sortBy(_.getDate(0).toString)
    val means = got.map(_.getAs[Double]("mean_v"))
    got.zipWithIndex.foreach { case (r, i) =>
      val isPeak = i > 0 && i < got.length - 1 &&
        means(i) > means(i - 1) && means(i) > means(i + 1)
      assert(r.getAs[Boolean]("is_peak") === isPeak,
        s"day $i: flag ${r.getAs[Boolean]("is_peak")} vs recomputed $isPeak")
      if (isPeak) {
        val lmin = means.slice(math.max(0, i - 3), i).min
        val rmin = means.slice(i + 1, math.min(means.length, i + 4)).min
        val prom = means(i) - math.max(lmin, rmin)
        assert(math.abs(r.getAs[Double]("prominence") - prom) < 1e-3)
        assert(r.getAs[Double]("prominence") > 0)
      } else assert(r.isNullAt(r.fieldIndex("prominence")))
    }
  }

  test("q_recs_novelty: novelty recomputes from popularity; coverage bounded by the catalog") {
    val got = SparkEntry.queries("q_recs_novelty")(spark, sf).collect()
    assert(got.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3))
    val recs = SparkEntry.queries("q_recs_topn")(spark, sf).collect()
    val byRk = recs.groupBy(_.getAs[Int]("rk"))
    got.foreach { r =>
      val rk = r.getAs[Int]("rk")
      assert(r.getAs[Long]("n_recs") === byRk(rk).length.toLong)
      val cov = r.getAs[Double]("coverage")
      assert(cov > 0.0 && cov <= 1.0)
      // novelty is positive (no brand is owned by every customer) and
      // bounded by log2(n_customers)
      val nov = r.getAs[Double]("mean_novelty")
      assert(nov > 0.0 && nov < 30.0)
    }
  }

  test("q_tail_index: Hill alpha recomputes from the top order statistics") {
    val got = SparkEntry.queries("q_tail_index")(spark, sf).collect()
    assert(got.length === 1)
    val r = got.head
    val vals = graft.tables.Tables.events(spark, sf)
      .selectExpr("cast(round(value * 100) as long) as v").collect()
      .map(_.getLong(0)).sorted(Ordering[Long].reverse).take(101)
    val pivot = vals.last
    val terms = vals.filter(_ > pivot)
      .map(v => math.floor(math.log(v.toDouble / pivot) * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Long]("k_used") === terms.length.toLong)
    val alpha = terms.length / terms.sum
    assert(math.abs(r.getAs[Double]("hill_alpha") - alpha) < 1e-3,
      s"alpha ${r.getAs[Double]("hill_alpha")} vs recomputed $alpha")
    assert(r.getAs[Double]("x_k1") === pivot / 100.0)
  }

  test("q_entropy_rate: bounded by log(n_states) and consistent with the stationary weights") {
    val got = SparkEntry.queries("q_entropy_rate")(spark, sf).collect()
    assert(got.length === 1)
    val h = got.head.getAs[Double]("entropy_rate_nats")
    val nStates = SparkEntry.queries("q_markov_stationary")(spark, sf).count()
    assert(h > 0.0 && h <= math.log(nStates.toDouble) + 1e-6,
      s"entropy rate $h outside (0, ln($nStates)]")
    // recompute from the published stationary vector + transition probs
    val pi = SparkEntry.queries("q_markov_stationary")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val trans = SparkEntry.queries("q_markov_transition")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("p"))
    val expect = -trans.map { case ((i, _), p) =>
      if (p > 0) pi(i) * p * math.log(p) else 0.0 }.sum
    assert(math.abs(h - expect) < 1e-3, s"entropy $h vs recomputed $expect")
  }

  test("q_mm_vad: decoded activity profile equals the planted voicing pattern closed form") {
    val got = SparkEntry.queries("q_mm_vad")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .selectExpr("doc_id", "octet_length(text) as n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.length === docs.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nSamples = 256 + docs(id) % 1024
      val w = nSamples / 80
      val pattern = (0 until w).map(wi => (id + wi) % 3 != 0)
      assert(r.getAs[Int]("n_samples") === nSamples)
      assert(r.getAs[Int]("n_windows") === w)
      assert(r.getAs[Int]("n_active") === pattern.count(identity))
      val runs = pattern.foldLeft(List.empty[Int]) {
        case (acc, true) => (acc.headOption.getOrElse(0) + 1) ::
          (if (acc.isEmpty) Nil else acc.tail)
        case (acc, false) => 0 :: acc
      }
      assert(r.getAs[Int]("longest_run") === (0 :: runs).max)
      assert(r.getAs[Int]("first_active") === pattern.indexOf(true))
      assert(r.getAs[Int]("last_active") === pattern.lastIndexOf(true))
    }
  }

  /** µ-grid daily means of events.value, in date order — the shared
    * input series of the trend/drift keys, recomputed in pure Scala. */
  private def dailyMmu(): Array[Long] = {
    graft.tables.Tables.events(spark, sf)
      .selectExpr("CAST(ts AS DATE) AS d",
        "CAST(FLOOR(value * 1e6) AS BIGINT) AS v_u")
      .collect()
      .groupBy(_.getDate(0).toString).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.map(_.getLong(1)).sum / rs.length // same trunc div as `div`
      }.toArray
  }

  test("q_theil_sen: slope and intercept equal the pure-Scala pairwise-median fold") {
    val got = SparkEntry.queries("q_theil_sen")(spark, sf).collect()(0)
    val m = dailyMmu()
    val slopes = (for {
      i <- m.indices; j <- m.indices if j > i
    } yield (m(j) - m(i)).toDouble / (j - i)).sorted
    def med(xs: Seq[Double]): Double = {
      val n = xs.length
      (xs((n + 1) / 2 - 1) + xs((n + 2) / 2 - 1)) / 2
    }
    val slope = med(slopes)
    // residual intercepts at 1-based day index, like the operator
    val b = m.indices.map(i => m(i) - slope * (i + 1)).sorted
    assert(got.getAs[Long]("n_days") === m.length.toLong)
    assert(got.getAs[Long]("n_pairs") === slopes.length.toLong)
    assert(math.abs(got.getAs[Double]("slope_per_day") - slope / 1e6) < 1e-4)
    assert(math.abs(got.getAs[Double]("intercept") - med(b) / 1e6) < 1e-4)
  }

  test("q_mann_kendall: S recomputes brute-force and the trend label matches z") {
    val got = SparkEntry.queries("q_mann_kendall")(spark, sf).collect()(0)
    val m = dailyMmu()
    val sRef = (for {
      i <- m.indices; j <- m.indices if j > i
    } yield java.lang.Long.signum(m(j) - m(i)).toLong).sum
    assert(got.getAs[Long]("s_stat") === sRef)
    val z = got.getAs[Double]("z")
    val lbl = got.getAs[String]("trend")
    assert(if (z > 1.96) lbl == "increasing"
      else if (z < -1.96) lbl == "decreasing" else lbl == "no_trend")
    // variance must be positive with >2 distinct days
    assert(got.getAs[Double]("var_s") > 0.0)
  }

  test("q_spearman_daily: rho bounded and equal to pure-Scala average-rank correlation") {
    val got = SparkEntry.queries("q_spearman_daily")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
    }
    // brute-force one event type end-to-end
    val et = got.head.getAs[String]("event_type")
    val rows = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .selectExpr("CAST(ts AS DATE) AS d",
        "CAST(FLOOR(value * 1e6) AS BIGINT) AS v_u",
        "CAST(get_json_object(props, '$.k') AS BIGINT) * 1000000 AS k_u")
      .collect().groupBy(_.getDate(0).toString).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        (rs.map(_.getLong(1)).sum / rs.length,
          rs.map(_.getLong(2)).sum / rs.length)
      }
    def avgRanks(xs: Seq[Long]): Seq[Double] = {
      val sorted = xs.sorted
      xs.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        (lo + hi) / 2.0
      }
    }
    val rx = avgRanks(rows.map(_._1))
    val ry = avgRanks(rows.map(_._2))
    val n = rx.length
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    val ref = cov / math.sqrt(vx * vy)
    val gotRho = got.find(_.getString(0) == et).get.getAs[Double]("spearman_rho")
    assert(math.abs(gotRho - ref) < 1e-4)
  }

  test("q_page_hinkley: ph is the exact Scala fold, nonnegative, zero-gap on day one") {
    val got = SparkEntry.queries("q_page_hinkley")(spark, sf)
      .orderBy("d").collect()
    val m = dailyMmu()
    assert(got.length === m.length)
    var cum = 0L; var acc = 0L; var mn = Long.MaxValue
    m.indices.foreach { i =>
      cum += m(i)
      acc += m(i) - cum / (i + 1) - 1000000L
      mn = math.min(mn, acc)
      val ph = (acc - mn) / 1e6
      assert(math.abs(got(i).getAs[Double]("ph") - ph) < 1e-3)
      assert(got(i).getAs[Double]("ph") >= 0.0)
      assert(got(i).getAs[Boolean]("alarm") === (acc - mn > 5000000L))
    }
    assert(got(0).getAs[Double]("ph") === 0.0) // day 1: m == min
  }

  test("q_cohens_kappa: po/pe/kappa recompute from brute-force counts per type") {
    val got = SparkEntry.queries("q_cohens_kappa")(spark, sf).collect()
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("event_type", "value > 100 AS ra",
        "CAST(get_json_object(props, '$.k') AS INT) > 50 AS rb")
      .collect()
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val rs = ev.filter(_.getString(0) == et)
      val n = rs.length.toDouble
      val a1 = rs.count(_.getBoolean(1)); val b1 = rs.count(_.getBoolean(2))
      val agree = rs.count(x => x.getBoolean(1) == x.getBoolean(2))
      val po = agree / n
      val pe = (a1.toDouble * b1 + (n - a1) * (n - b1)) / (n * n)
      assert(math.abs(r.getAs[Double]("po") - po) < 1e-5)
      assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-5)
      assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-4)
      assert(r.getAs[Double]("kappa") <= 1.0 + 1e-9)
    }
  }

  test("q_cramers_v: V in [0,1] and chi2 recomputes from the brute-force contingency table") {
    val got = SparkEntry.queries("q_cramers_v")(spark, sf).collect()(0)
    val rows = graft.tables.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).map { case (k, v) => k -> v.length }
    val rt = rows.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ct = rows.groupBy(_._2).map { case (k, v) => k -> v.length }
    val chi = cells.map { case ((p, st), o) =>
      val e = rt(p) * ct(st) / n
      (o - e) * (o - e) / e
    }.sum
    assert(got.getAs[Long]("n") === rows.length.toLong)
    assert(got.getAs[Long]("r") === rt.size.toLong)
    assert(got.getAs[Long]("c") === ct.size.toLong)
    assert(math.abs(got.getAs[Double]("chi2") - chi) < 1e-2)
    val v = got.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(math.abs(v - math.sqrt(
      chi / (n * math.min(rt.size - 1, ct.size - 1)))) < 1e-4)
  }

  test("q_ldiversity: l bounded by the sensitive domain and entropy-l <= l per group") {
    val got = SparkEntry.queries("q_ldiversity")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      val el = r.getAs[Double]("entropy_l")
      assert(l >= 1L && l <= 5L) // o_orderpriority has 5 values
      assert(el >= 1.0 - 1e-9 && el <= l + 1e-6,
        s"entropy-l $el out of [1, $l]")
      assert(r.getAs[Boolean]("meets_l3") === (l >= 3L))
    }
  }

  test("q_adamic_adar: top-20 equals the pure-Scala wedge recomputation on the same edges") {
    val got = SparkEntry.queries("q_adamic_adar")(spark, sf).collect()
    val edges = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.95)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val direct = edges.toSet
    val scores = (for {
      (u, nu) <- adj.toSeq; v <- adj.keys
      if u < v && !direct((u, v)) && !direct((v, u))
      common = nu.intersect(adj(v)) if common.nonEmpty
    } yield {
      val aaU = common.toSeq.map(w =>
        math.round(1e9 / math.log(adj(w).size.toDouble))).sum
      (u, v, common.size.toLong, aaU / 1e9)
    }).sortBy { case (u, v, _, aa) => (-aa, u, v) }.take(20)
    assert(got.length === scores.length)
    got.zip(scores).foreach { case (r, (u, v, cn, aa)) =>
      assert(r.getAs[Long]("a_id") === u)
      assert(r.getAs[Long]("b_id") === v)
      assert(r.getAs[Long]("cn") === cn)
      assert(math.abs(r.getAs[Double]("adamic_adar") - aa) < 1e-5)
    }
  }

  test("q_matryoshka_trunc: full-dim recall is exactly 1 and every row is in range") {
    val got = SparkEntry.queries("q_matryoshka_trunc")(spark, sf).collect()
    assert(got.map(_.getAs[Int]("k_dim")).sorted === Array(8, 16, 32, 64))
    got.foreach { r =>
      val rec = r.getAs[Double]("recall10")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Double]("mean_cos_top10") >= -1.0 - 1e-9)
      assert(r.getAs[Double]("mean_cos_top10") <= 1.0 + 1e-9)
    }
    assert(got.find(_.getAs[Int]("k_dim") == 64).get
      .getAs[Double]("recall10") === 1.0)
    // brute-force the k=8 prefix recall in pure Scala
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = e.find(_._1 == 0L).get._2
    def cosK(a: Array[Float], k: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until k).foreach { i =>
        dot += a(i).toDouble * q(i); na += a(i).toDouble * a(i)
        nb += q(i).toDouble * q(i)
      }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    def top10(k: Int): Set[Long] =
      e.filter(_._1 != 0L).map { case (id, v) => (id, cosK(v, k)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val ref8 = top10(8).intersect(top10(64)).size / 10.0
    assert(got.find(_.getAs[Int]("k_dim") == 8).get
      .getAs[Double]("recall10") === ref8)
  }

  test("q_code_detect and q_tokenizer_fertility recompute brute-force per group") {
    val kw = Set("select", "join", "table", "index", "query", "scan",
      "filter", "merge", "sort", "group", "order", "key")
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val cd = SparkEntry.queries("q_code_detect")(spark, sf).collect()
    cd.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = docs.filter(_._1 == src)
      val densities = ds.map { case (_, _, t) =>
        val toks = t.split(" ", -1)
        toks.count(kw) * 1000000L / toks.length
      }
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_kw_density")
        - (densities.sum / densities.length) / 1e6) < 1e-5)
      assert(r.getAs[Double]("code_share")
        === densities.count(_ >= 250000L).toDouble / ds.length)
    }
    val tf = SparkEntry.queries("q_tokenizer_fertility")(spark, sf).collect()
    tf.foreach { r =>
      val lg = r.getAs[String]("lang")
      val ds = docs.filter(_._2 == lg)
      val words = ds.map(_._3.split(" ", -1)).flatten
      val nsw = words.map(w => (w.length + 3) / 4).map(_.toLong).sum
      assert(r.getAs[Long]("n_words") === words.length.toLong)
      assert(r.getAs[Long]("n_subwords") === nsw)
      assert(r.getAs[Double]("fertility") >= 1.0 - 1e-9)
      assert(math.abs(r.getAs[Double]("fertility")
        - nsw.toDouble / words.length) < 1e-5)
    }
  }
}
