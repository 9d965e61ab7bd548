package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r6 session-4 statistical operators: AUC (tie-corrected Mann-Whitney
  * vs brute-force pair counting), chi-squared independence, Markov
  * transition normalization, and the lagged-autocorrelation series.
  */
class StatsOpsSpec extends AnyFunSuite with SparkFixture {

  test("q_auc equals brute-force pair-counted AUC with tie credit") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select(col("value"),
        (col("event_type") === "purchase").cast("int").as("y"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    var credit = 0.0
    for (p <- pos; n <- neg)
      credit += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = credit / (pos.length.toDouble * neg.length)

    val got = graft.queries.EventsQ.queries("q_auc")(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_pos") === pos.length.toLong)
    assert(got.getAs[Long]("n_neg") === neg.length.toLong)
    assert(math.abs(got.getAs[Double]("auc") - brute) < 1e-6)
  }

  test("q_chisq_indep matches a driver-side contingency recompute") {
    val obs = graft.tables.Tables.events(spark, sf)
      .groupBy(col("event_type"), (dayofmonth(col("ts")) % 7).as("dow"))
      .count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val n = obs.values.sum.toDouble
    val rt = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val chi2 = obs.map { case ((t, d), o) =>
      val e = rt(t) * ct(d) / n
      (o - e) * (o - e) / e
    }.sum

    val got = graft.queries.EventsQ.queries("q_chisq_indep")(spark, sf).collect()(0)
    assert(got.getAs[Long]("n_cells") === obs.size.toLong)
    assert(math.abs(got.getAs[Double]("chi2") - chi2) < 1e-3)
  }

  test("q_markov_transition rows normalize to 1 and conserve transitions") {
    val df = graft.queries.EventsQ.queries("q_markov_transition")(spark, sf)
      .localCheckpoint(true)
    val rowSums = df.groupBy("cur").agg(sum("p").as("sp")).collect()
    rowSums.foreach(r =>
      assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-4, s"row ${r.getString(0)}"))
    // total transition count = events - one per user (last has no next)
    val ev = graft.tables.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === expected)
  }

  test("q_target_encode shrinks each segment mean toward the global mean") {
    val rows = graft.queries.Analytics.queries("q_target_encode")(spark, sf)
      .collect()
    assert(rows.length === 5)
    val seg = graft.tables.Tables.orders(spark, sf)
      .join(graft.tables.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), avg("o_totalprice").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val gm = seg.values.map { case (n, m) => n * m }.sum / seg.values.map(_._1).sum
    rows.foreach { r =>
      val (n, m) = seg(r.getString(0))
      val want = (n * m + 10.0 * gm) / (n + 10.0)
      assert(math.abs(r.getAs[Double]("enc") - want) < 1e-5)
      // shrinkage: enc strictly between the segment mean and the global mean
      assert((r.getAs[Double]("enc") - m) * (gm - m) >= 0.0)
    }
  }

  test("q_kanon partitions all customers and flags exactly k<5 groups") {
    val df = graft.queries.Analytics.queries("q_kanon")(spark, sf)
      .localCheckpoint(true)
    val total = df.agg(sum("k_size")).collect()(0).getLong(0)
    assert(total === graft.tables.Tables.customer(spark, sf).count())
    assert(df.filter(col("at_risk") =!= (col("k_size") < 5)).isEmpty)
    assert(df.filter(col("l_div") > col("k_size")).isEmpty)
  }

  test("q_freq_pairs supports meet the 1% floor and recount exactly") {
    val df = graft.queries.Analytics.queries("q_freq_pairs")(spark, sf)
      .localCheckpoint(true)
    val nOrders = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(df.filter(col("n") < nOrders * 0.01).isEmpty)
    // recount one pair brute-force
    val first = df.orderBy("brand_a", "brand_b").limit(1).collect()(0)
    val (ba, bb) = (first.getString(0), first.getString(1))
    val basket = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val brute = basket.filter(col("p_brand") === ba).select("l_orderkey")
      .intersect(basket.filter(col("p_brand") === bb).select("l_orderkey"))
      .count()
    assert(first.getAs[Long]("n") === brute)
  }

  test("q_stl_trend nulls the 3-row edges and resid = x - trend inside") {
    val rows = graft.queries.EventsQ.queries("q_stl_trend")(spark, sf).collect()
    val n = rows.length
    rows.zipWithIndex.foreach { case (r, i) =>
      val edge = i < 3 || i >= n - 3
      assert(r.isNullAt(r.fieldIndex("trend")) === edge, s"row $i")
      if (!edge)
        assert(math.abs(r.getAs[Double]("x") - r.getAs[Double]("trend")
          - r.getAs[Double]("resid")) < 2e-4)
    }
  }

  test("q_dpp_prune result equals the statically-filtered aggregate") {
    val got = graft.queries.Relational.queries("q_dpp_prune")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val want = graft.tables.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) <= 1996)
      .groupBy(year(col("o_orderdate")).as("y")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("q_nb_langid confusion matrix covers every test doc; diagonal dominates") {
    val df = graft.queries.Training.queries("q_nb_langid")(spark, sf)
      .localCheckpoint(true)
    val testDocs = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === testDocs)
    // the vocab is shared across langs in this corpus, so don't demand
    // high accuracy — but the classifier must beat the 1/5 prior
    val correct = df.filter(col("lang") === col("pred"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(correct.toDouble / testDocs > 0.2,
      s"NB no better than chance: $correct/$testDocs")
  }

  test("q_graph_degree_stats conserves nodes and edge endpoints") {
    val df = graft.queries.TextSim.queries("q_graph_degree_stats")(spark, sf)
      .localCheckpoint(true)
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(df.agg(sum("n_nodes")).collect()(0).getLong(0) === nDocs)
    val pairs = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8).count()
    val endpoints = df.agg(sum(col("degree") * col("n_nodes")))
      .collect()(0).getLong(0)
    assert(endpoints === 2 * pairs)
  }

  test("q_corr_matrix emits all 6 pairs; qty-price strongly positive") {
    val rows = graft.queries.Analytics.queries("q_corr_matrix")(spark, sf)
      .collect()
    assert(rows.length === 6)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("r")) <= 1.0))
    // cross-check one cell against a direct single-pair recompute
    val qp = rows.find(r => r.getString(0) == "l_quantity"
      && r.getString(1) == "l_extendedprice").get
    val direct = graft.tables.Tables.lineitem(spark, sf)
      .agg(corr("l_quantity", "l_extendedprice")).collect()(0).getDouble(0)
    assert(math.abs(qp.getAs[Double]("r") - direct) < 1e-6)
  }

  test("q_mutual_info is bounded by the smaller marginal entropy") {
    val r = graft.queries.Analytics.queries("q_mutual_info")(spark, sf)
      .collect()(0)
    val (mi, hx, hy) = (r.getAs[Double]("mi"), r.getAs[Double]("h_type"),
      r.getAs[Double]("h_band"))
    assert(mi >= -1e-9 && mi <= math.min(hx, hy) + 1e-9)
    assert(r.getAs[Double]("nmi") >= -1e-9 && r.getAs[Double]("nmi") <= 1.0 + 1e-9)
    assert(hx > 0 && hy > 0)
  }

  test("q_benford shares sum to 1 over digits 1..9") {
    val rows = graft.queries.Analytics.queries("q_benford")(spark, sf).collect()
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("digit"))))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val want = math.log10(1.0 + 1.0 / r.getAs[Int]("digit"))
      assert(math.abs(r.getAs[Double]("benford") - want) < 1e-6)
    }
  }

  test("q_dataset_card conserves docs and bounds dup_rate") {
    val df = graft.queries.Training.queries("q_dataset_card")(spark, sf)
      .localCheckpoint(true)
    assert(df.agg(sum("n_docs")).collect()(0).getLong(0) ===
      graft.tables.Tables.documents(spark, sf).count())
    assert(df.filter(col("dup_rate") < 0 || col("dup_rate") > 1).isEmpty)
    assert(df.filter(col("n_uniq") > col("n_docs")).isEmpty)
    assert(df.filter(col("n_tokens") <= 0).isEmpty)
  }

  test("q_grid_cluster: adjacency implies same cluster; label is min member id") {
    val rows = graft.queries.EventsQ.queries("q_grid_cluster")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getInt(0).toLong * 1000 + r.getInt(1), r.getAs[Long]("cluster")))
    val byCell = rows.map(t => t._1 -> t._3).toMap
    // every pair of 8-adjacent dense cells shares a cluster label
    for (((ax, ay), _, ac) <- rows; ((bx, by), _, bc) <- rows
         if math.abs(ax - bx) <= 1 && math.abs(ay - by) <= 1)
      assert(ac === bc, s"adjacent cells ($ax,$ay)/($bx,$by) split")
    // cluster label = smallest member id
    rows.groupBy(_._3).foreach { case (label, members) =>
      assert(members.map(_._2).min === label)
    }
    assert(rows.nonEmpty && byCell.size === rows.length)
  }

  test("q_ks_test D matches a driver-side ECDF recompute") {
    val rows = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val xs = rows.filter(_._1 == "purchase").map(_._2).sorted
    val ys = rows.filter(_._1 == "view").map(_._2).sorted
    val grid = (xs ++ ys).distinct.sorted
    def ecdf(s: Array[Double], v: Double) =
      s.count(_ <= v).toDouble / s.length
    val d = grid.map(v => math.abs(ecdf(xs, v) - ecdf(ys, v))).max
    val got = graft.queries.EventsQ.queries("q_ks_test")(spark, sf).collect()(0)
    assert(got.getAs[Long]("n1") === xs.length.toLong)
    assert(got.getAs[Long]("n2") === ys.length.toLong)
    assert(math.abs(got.getAs[Double]("d") - d) < 1e-6)
  }

  test("q_cusum_drift ends near zero and flags at least one peak") {
    val rows = graft.queries.EventsQ.queries("q_cusum_drift")(spark, sf).collect()
    // sum over all days of (m - mu) telescopes to ~0
    assert(math.abs(rows.last.getAs[Double]("cusum")) < 1e-2)
    assert(rows.count(_.getAs[Boolean]("is_peak")) >= 1)
    val peak = rows.map(r => math.abs(r.getAs[Double]("cusum"))).max
    rows.filter(_.getAs[Boolean]("is_peak"))
      .foreach(r => assert(math.abs(math.abs(r.getAs[Double]("cusum")) - peak) < 1e-9))
  }

  test("q_seasonality_profile partitions the corpus over <=168 cells") {
    val df = graft.queries.EventsQ.queries("q_seasonality_profile")(spark, sf)
      .localCheckpoint(true)
    assert(df.count() <= 168)
    assert(df.agg(sum("n")).collect()(0).getLong(0) ===
      graft.tables.Tables.events(spark, sf).count())
    assert(df.filter(col("dow") < 0 || col("dow") > 6
      || col("hr") < 0 || col("hr") > 23).isEmpty)
  }

  test("q_precision_recall_k conserves sampled queries; p@10 in [0,1]") {
    val df = graft.queries.LlmOps.queries("q_precision_recall_k")(spark, sf)
      .localCheckpoint(true)
    // the query side is the deterministic 1-in-17 eval sample (r9);
    // every sampled vector must appear exactly once as a query
    val n = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 17 === 0).count()
    assert(df.agg(sum("n_queries")).collect()(0).getLong(0) === n)
    assert(df.filter(col("p_at_10") < 0 || col("p_at_10") > 1).isEmpty)
  }

  test("q_isolation_grid surfaces the rarest cells first") {
    val rows = graft.queries.EventsQ.queries("q_isolation_grid")(spark, sf)
      .collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // score must decrease as cell count grows
    val byN = rows.map(r => (r.getAs[Long]("n"), r.getAs[Double]("score")))
    byN.combinations(2).foreach { case Array((n1, s1), (n2, s2)) =>
      if (n1 < n2) assert(s1 >= s2)
    }
  }

  test("q_conversion_lag conserves purchases; buckets non-negative or -1") {
    val df = graft.queries.EventsQ.queries("q_conversion_lag")(spark, sf)
      .localCheckpoint(true)
    val purchases = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.agg(sum("n_purchases")).collect()(0).getLong(0) === purchases)
    assert(df.filter(col("lag_hours") < -1).isEmpty)
  }

  test("q_seasonal_index averages to 1 within each year") {
    val df = graft.queries.Analytics.queries("q_seasonal_index")(spark, sf)
      .localCheckpoint(true)
    df.groupBy("yr").agg(avg("idx").as("m"), count(lit(1)).as("n"))
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("m") - 1.0) < 1e-3,
          s"year ${r.getInt(0)}: mean idx ${r.getAs[Double]("m")}")
      }
  }

  test("q_vocab_growth is monotone and lands on corpus totals") {
    val rows = graft.queries.Training.queries("q_vocab_growth")(spark, sf)
      .collect()
    val vs = rows.map(_.getAs[Long]("vocab_size"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    val docs = graft.tables.Tables.documents(spark, sf)
    assert(rows.last.getAs[Long]("cum_docs") === docs.count())
    val vocab = docs.select(explode(split(col("text"), " "))).distinct().count()
    assert(rows.last.getAs[Long]("vocab_size") === vocab)
  }

  test("q_decile_lift partitions the corpus into ~equal deciles; lift avg 1") {
    val rows = graft.queries.Analytics.queries("q_decile_lift")(spark, sf)
      .collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === graft.tables.Tables.events(spark, sf).count())
    // deciles are population-balanced up to score-grid granularity
    rows.foreach(r => assert(math.abs(r.getAs[Long]("n") - total / 10.0)
      < total * 0.02, s"decile ${r.getInt(0)} size ${r.getAs[Long]("n")}"))
    // weighted mean of rates = overall rate => weighted mean lift = 1
    val wl = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("lift")).sum / total
    assert(math.abs(wl - 1.0) < 1e-2)
  }

  test("q_rare_collapse conserves parts and only folds sub-1% labels") {
    val df = graft.queries.Analytics.queries("q_rare_collapse")(spark, sf)
      .localCheckpoint(true)
    val total = graft.tables.Tables.part(spark, sf).count()
    assert(df.agg(sum("n_parts")).collect()(0).getLong(0) === total)
    // every kept (non-OTHER) label is itself >= 1%
    assert(df.filter(col("recoded") =!= "OTHER"
      && col("n_parts") < total * 0.01).isEmpty)
    assert(df.filter(col("recoded") =!= "OTHER")
      .filter(col("n_source_labels") =!= 1).isEmpty)
  }

  test("q_embed_outlier: every listed dist >= any unlisted vector's dist") {
    val top = graft.queries.LlmOps.queries("q_embed_outlier")(spark, sf)
      .collect()
    assert(top.length === 20)
    val ds = top.map(_.getAs[Double]("dist"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    assert(ds.forall(d => d >= 0.0 && d <= 2.0))
  }

  test("q_cf_item_sim: cosines bounded; one value recounts brute-force") {
    val rows = graft.queries.Analytics.queries("q_cf_item_sim")(spark, sf)
      .collect()
    rows.foreach(r => assert(r.getAs[Double]("cos") >= 0.0
      && r.getAs[Double]("cos") <= 1.0 + 1e-9))
    val first = rows.minBy(r => (r.getString(0), r.getString(1)))
    val cb = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.tables.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .groupBy("o_custkey", "p_brand").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    def vec(b: String) = cb.collect { case ((c, bb), n) if bb == b => c -> n.toDouble }.toMap
    val (va, vb) = (vec(first.getString(0)), vec(first.getString(1)))
    val dot = va.keySet.intersect(vb.keySet).toSeq.map(c => va(c) * vb(c)).sum
    val want = dot / (math.sqrt(va.values.map(x => x * x).sum)
      * math.sqrt(vb.values.map(x => x * x).sum))
    assert(math.abs(first.getAs[Double]("cos") - want) < 1e-6)
  }

  test("q_share_of_parent: region shares sum to 1; nation shares per region sum to 1") {
    val df = graft.queries.Analytics.queries("q_share_of_parent")(spark, sf)
      .localCheckpoint(true)
    df.groupBy("r_name").agg(sum("share_of_region").as("s")).collect()
      .foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-3))
    val regionShares = df.select("r_name", "region_share_of_total").distinct()
      .collect().map(_.getDouble(1))
    assert(math.abs(regionShares.sum - 1.0) < 1e-3)
  }

  test("q_token_len_hist conserves total token occurrences") {
    val df = graft.queries.TextSim.queries("q_token_len_hist")(spark, sf)
      .localCheckpoint(true)
    val total = graft.tables.Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(df.agg(sum("n")).collect()(0).getLong(0) === total)
    assert(df.filter(col("wlen") <= 0).isEmpty)
  }

  test("q_lag_features: head rows null, delta1 = v - lag1 elsewhere") {
    val df = graft.queries.EventsQ.queries("q_lag_features")(spark, sf)
      .localCheckpoint(true)
    assert(df.count() === graft.tables.Tables.events(spark, sf).count())
    // per-user first event has no lag features
    assert(df.filter(col("lag1").isNull).count() ===
      graft.tables.Tables.events(spark, sf).select("user_id").distinct().count())
    val bad = df.filter(col("lag1").isNotNull &&
      abs(col("delta1") - (col("v") - col("lag1"))) > 2e-4)
    assert(bad.isEmpty, bad.limit(3).collect().mkString(","))
  }

  test("q_skew_stats reports the true heaviest key first") {
    val r = graft.queries.Analytics.queries("q_skew_stats")(spark, sf)
      .collect()(0)
    val kc = graft.tables.Tables.lineitem(spark, sf)
      .groupBy("l_suppkey").count().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.getAs[Long]("n_keys") === kc.length.toLong)
    assert(r.getAs[Long]("max_n") === kc.map(_._2).max)
    val heaviest = kc.minBy { case (k, n) => (-n, k) }._1
    assert(r.getAs[String]("top5_keys").split(",").head === heaviest.toString)
    assert(r.getAs[Double]("skew_factor") >= 1.0)
  }

  test("q_pareto_abc partitions all parts; A holds ~80% of revenue") {
    val rows = graft.queries.Analytics.queries("q_pareto_abc")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val nParts = graft.tables.Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_.getAs[Long]("n_parts")).sum === nParts)
    assert(math.abs(rows.values.map(_.getAs[Double]("rev_share")).sum - 1.0) < 1e-3)
    assert(rows("A").getAs[Double]("rev_share") <= 0.8 + 0.01)
  }

  test("q_recs_topn never recommends an owned brand; ranks are 1..3 descending") {
    val df = graft.queries.Analytics.queries("q_recs_topn")(spark, sf)
      .localCheckpoint(true)
    val owned = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.tables.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("cust"), col("p_brand").as("rec")).distinct()
    assert(df.join(owned, Seq("cust", "rec")).isEmpty,
      "a recommendation duplicated an owned brand")
    assert(df.filter(col("rk") < 1 || col("rk") > 3).isEmpty)
    // scores are non-increasing within each customer
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cust").orderBy("rk")
    assert(df.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev")).isEmpty)
  }

  test("q_string_cluster covers all parts; canonical is a member") {
    val df = graft.queries.Analytics.queries("q_string_cluster")(spark, sf)
      .localCheckpoint(true)
    assert(df.agg(sum("n_parts")).collect()(0).getLong(0) ===
      graft.tables.Tables.part(spark, sf).count())
    assert(df.filter(col("n_variants") > col("n_parts")).isEmpty)
    // the canonical name's own fingerprint is the cluster key
    val bad = df.withColumn("cfp", array_join(array_sort(array_distinct(
      split(lower(regexp_replace(col("canonical"), "[^a-z0-9 ]", "")), " "))),
      " ")).filter(col("cfp") =!= col("fp"))
    assert(bad.isEmpty, bad.limit(3).collect().mkString(","))
  }

  test("q_ctr_wilson bound is below the rate and within [0,1]") {
    val rows = graft.queries.Analytics.queries("q_ctr_wilson")(spark, sf)
      .collect()
    rows.foreach { r =>
      val (rate, w) = (r.getAs[Double]("rate"), r.getAs[Double]("wilson"))
      assert(w <= rate + 1e-9, s"${r.getString(0)}: bound above rate")
      assert(w >= -1e-9 && w <= 1.0)
    }
    // bounds are sorted descending (the ranking contract)
    val ws = rows.map(_.getAs[Double]("wilson"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("q_src_diversity entropy bounded by ln(n_langs)") {
    val rows = graft.queries.Training.queries("q_src_diversity")(spark, sf)
      .collect()
    rows.foreach { r =>
      val (h, nl) = (r.getAs[Double]("entropy"), r.getAs[Long]("n_langs"))
      assert(h >= -1e-9 && h <= math.log(nl.toDouble) + 1e-6)
      assert(r.getAs[Double]("norm_entropy") <= 1.0 + 1e-6)
    }
  }

  test("q_survival_km is a monotone step function matching hand KM on day 1") {
    val rows = graft.queries.EventsQ.queries("q_survival_km")(spark, sf)
      .collect()
    val ss = rows.map(_.getAs[Double]("surv"))
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b - 1e-9 },
      "survival must be non-increasing")
    assert(ss.forall(v => v >= 0.0 && v <= 1.0))
    // first listed event time: S = Π over all grid days ≤ t of (1-d/n);
    // recompute just the first row's factor chain endpoint
    val first = rows.head
    val nRisk = first.getAs[Long]("n_risk")
    val d = first.getAs[Long]("d")
    assert(first.getAs[Double]("surv") <= 1.0 - d.toDouble / nRisk + 1e-6)
    // at-risk counts strictly decrease over event times
    val ns = rows.map(_.getAs[Long]("n_risk"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b })
  }

  test("q_near_dup_rate conserves docs and matches the pair membership") {
    val df = graft.queries.TextSim.queries("q_near_dup_rate")(spark, sf)
      .localCheckpoint(true)
    val docs = graft.tables.Tables.documents(spark, sf)
    assert(df.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    val pairs = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8)
    val members = pairs.select(col("a_id").as("doc_id"))
      .unionAll(pairs.select(col("b_id").as("doc_id"))).distinct().count()
    assert(df.agg(sum("n_dup")).collect()(0).getLong(0) === members)
    assert(df.filter(col("dup_rate") < 0 || col("dup_rate") > 1).isEmpty)
  }

  test("q_cohort_ltv is cumulative and normalized by cohort size") {
    val rows = graft.queries.EventsQ.queries("q_cohort_ltv")(spark, sf)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("week_offset"))
      val ltv = sorted.map(_.getAs[Double]("cum_ltv"))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
        "cumulative LTV must be non-decreasing")
      // cum_ltv at the first offset = rev / n_users
      val h = sorted.head
      assert(math.abs(h.getAs[Double]("cum_ltv")
        - h.getAs[Double]("rev") / h.getAs[Long]("n_users")) < 1e-3)
    }
  }

  test("q_gdpr_forget removes exactly the bucketed users' events") {
    val df = graft.queries.EventsQ.queries("q_gdpr_forget")(spark, sf)
      .localCheckpoint(true)
    val ev = graft.tables.Tables.events(spark, sf)
    assert(df.agg(sum("n_before")).collect()(0).getLong(0) === ev.count())
    val removed = df.agg(sum("n_removed")).collect()(0).getLong(0)
    val expected = ev.filter(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 20 === 0).count()
    assert(removed === expected)
    assert(df.filter(col("n_after") > col("n_before")).isEmpty)
  }

  test("q_streak_detect finds each user's true longest run (brute recheck)") {
    val rows = graft.queries.EventsQ.queries("q_streak_detect")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toEpochDay)).toMap
    byUser.foreach { case (u, ds) =>
      var best = 1L; var cur = 1L
      ds.zip(ds.tail).foreach { case (a, b) =>
        cur = if (b.toEpochDay == a.toEpochDay + 1) cur + 1 else 1
        best = math.max(best, cur)
      }
      assert(rows(u) === best, s"user $u")
    }
  }

  test("q_path_mining counts conserve: each path n <= its prefix pair count") {
    val paths = graft.queries.EventsQ.queries("q_path_mining")(spark, sf)
      .collect()
    assert(paths.length === 10)
    val ns = paths.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val pairCounts = graft.queries.EventsQ.queries("q_markov_transition")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    paths.foreach { p =>
      val prefix = pairCounts((p.getString(0), p.getString(1)))
      assert(p.getAs[Long]("n") <= prefix,
        s"path ${p.getString(0)}->${p.getString(1)}->${p.getString(2)}")
    }
  }

  test("q_calibration_bins: bins partition events, ECE parts bounded") {
    val rows = graft.queries.EventsQ.queries("q_calibration_bins")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      graft.tables.Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("bin") >= 0 && r.getAs[Int]("bin") <= 9)
      assert(r.getAs[Double]("ece_part") >= 0.0 && r.getAs[Double]("ece_part") <= 1.0)
      // avg_pred must fall inside its own bin's range
      assert(r.getAs[Double]("avg_pred") >= r.getAs[Int]("bin") / 10.0 - 1e-9)
      assert(r.getAs[Double]("avg_pred") <= (r.getAs[Int]("bin") + 1) / 10.0 + 1e-9)
    }
  }

  test("q_emb_margin pair counts conserve; means bounded") {
    val r = graft.queries.LlmOps.queries("q_emb_margin")(spark, sf).collect()(0)
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(r.getAs[Long]("n_intra") + r.getAs[Long]("n_inter") === n * (n - 1) / 2)
    assert(math.abs(r.getAs[Double]("mean_intra")) <= 1.0)
    assert(math.abs(r.getAs[Double]("mean_inter")) <= 1.0)
    assert(math.abs(r.getAs[Double]("margin")
      - (r.getAs[Double]("mean_intra") - r.getAs[Double]("mean_inter"))) < 1e-9)
  }

  test("q_sorted_neighborhood pairs are window-bounded and JW-verified") {
    val rows = graft.queries.Analytics.queries("q_sorted_neighborhood")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("jw") >= 0.92
      && r.getAs[Double]("jw") <= 1.0))
    // every pair must be within 2 positions in the name-sorted order
    val pos = graft.tables.Tables.part(spark, sf)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getString(1), r.getLong(0))).sorted.zipWithIndex
      .map { case ((_, k), i) => k -> i }.toMap
    rows.foreach { r =>
      val gap = math.abs(pos(r.getAs[Long]("a_id")) - pos(r.getAs[Long]("b_id")))
      assert(gap >= 1 && gap <= 2, s"pair ${r.getLong(0)}/${r.getLong(1)} gap $gap")
    }
  }

  test("q_log_odds_terms: top terms are source-frequent; 3 per source desc") {
    val rows = graft.queries.Training.queries("q_log_odds_terms")(spark, sf)
      .collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (_, rs) =>
      assert(rs.length === 3)
      val ds = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("delta"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    }
    // a top-distinctive term must actually occur in its source
    val st = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    rows.foreach(r => assert(st((r.getString(0), r.getString(2)))))
  }

  test("q_forecast_naive: forecast equals the actual seven days earlier") {
    val rows = graft.queries.EventsQ.queries("q_forecast_naive")(spark, sf)
      .collect()
    val actualByDay = (rows.map(r => r.getDate(0).toLocalDate -> r.getAs[Double]("actual")) ++
      Seq.empty).toMap
    rows.foreach { r =>
      val prior = r.getDate(0).toLocalDate.minusDays(7)
      actualByDay.get(prior).foreach { a =>
        assert(math.abs(r.getAs[Double]("forecast") - a) < 1e-9,
          s"day ${r.getDate(0)}")
      }
      assert(r.getAs[Double]("ape") >= 0.0)
    }
    assert(rows.nonEmpty)
  }

  test("q_abc_xyz partitions all parts into the 3x3 matrix") {
    val df = graft.queries.Analytics.queries("q_abc_xyz")(spark, sf)
      .localCheckpoint(true)
    val nParts = graft.tables.Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(df.agg(sum("n_parts")).collect()(0).getLong(0) === nParts)
    assert(df.filter(!col("abc").isin("A", "B", "C")
      || !col("xyz").isin("X", "Y", "Z")).isEmpty)
  }

  test("q_dedup_threshold_sweep is monotone and agrees with the 0.8 memo") {
    val rows = graft.queries.TextSim.queries("q_dedup_threshold_sweep")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0.7, 0.8, 0.9))
    // stricter tau => fewer pairs and fewer docs
    assert(rows.map(_._2).zip(rows.map(_._2).tail).forall { case (a, b) => a >= b })
    assert(rows.map(_._3).zip(rows.map(_._3).tail).forall { case (a, b) => a >= b })
    // the 0.8 band must match the independently-derived 0.8 pair memo
    val p08 = graft.operators.EdgeGraph.pairs(spark, sf, "token", 0.8).count()
    assert(rows.find(_._1 == 0.8).get._2 === p08)
  }

  test("q_stopword_detect candidates exceed the df floor; occ >= df") {
    val df = graft.queries.TextSim.queries("q_stopword_detect")(spark, sf)
      .localCheckpoint(true)
    val nd = graft.tables.Tables.documents(spark, sf).count()
    assert(df.filter(col("df") <= nd * 0.5).isEmpty)
    assert(df.filter(col("occ") < col("df")).isEmpty)
    assert(df.filter(col("df_share") > 1.0).isEmpty)
  }

  test("q_text_burstiness: VMR non-negative, sorted desc; one brute recount") {
    val rows = graft.queries.TextSim.queries("q_text_burstiness")(spark, sf)
      .collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val vs = rows.map(_.getAs[Double]("vmr"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a >= b })
    assert(vs.forall(_ >= 0.0))
    // brute recompute for the top term (zeros included)
    val top = rows.head.getString(0)
    val nd = graft.tables.Tables.documents(spark, sf).count().toDouble
    val counts = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === top).groupBy("doc_id").count()
      .collect().map(_.getLong(1).toDouble)
    val s1 = counts.sum; val s2 = counts.map(x => x * x).sum
    val mu = s1 / nd
    val want = (s2 / nd - mu * mu) / mu
    assert(math.abs(rows.head.getAs[Double]("vmr") - want) < 1e-5)
  }

  test("q_ngram_coverage is monotone in N and saturates at the vocab") {
    val rows = graft.queries.TextSim.queries("q_ngram_coverage")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("top_n")).toSeq === Seq(10L, 100L, 1000L))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(cov.forall(c => c > 0.0 && c <= 1.0 + 1e-9))
    val vocab = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).distinct().count()
    rows.foreach(r => assert(r.getAs[Long]("n_terms")
      === math.min(r.getAs[Long]("top_n"), vocab)))
  }

  test("q_acf yields one bounded point per lag with |acf| <= 1") {
    val rows = graft.queries.EventsQ.queries("q_acf")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("lag_n")).toSeq === (1 to 7))
    val nDays = graft.tables.Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") === nDays - r.getAs[Int]("lag_n"))
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0)
    }
  }
}
