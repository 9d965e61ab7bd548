package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r5 operator semantics: RAG-chunking coverage invariants, chunk
  * containment vs an independent Scala brute force, SemDeDup drop
  * justification, embedding-norm QA invariants. (Cross-engine
  * equality is the DuckDB oracle's job; these pin the semantic
  * properties the oracle can't express.) */
class R5OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_rag_chunk covers every token: dense stride-24 chunks, tail reached") {
    val rows = SparkEntry.queries("q_rag_chunk")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, ch) =>
      val n = docs(id)
      val sorted = ch.sortBy(_.getInt(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) === i, "chunk_idx must be dense from 0")
        assert(r.getInt(2) === i * 24, "start_tok must follow the stride")
        assert(r.getInt(3) >= 1 && r.getInt(3) <= 32)
      }
      val last = sorted.last
      assert(last.getInt(2) + last.getInt(3) === n,
        s"doc $id tail not covered: ${last.getInt(2)} + ${last.getInt(3)} != $n")
    }
  }

  test("rag chunk arithmetic: stride-24/size-32 windows cover any doc length without gaps") {
    (1 to 2000).foreach { n =>
      val kmax = if (n <= 32) 0 else (n - 32 + 23) / 24
      val starts = (0 to kmax).map(_ * 24)
      assert(starts.head === 0)
      assert(starts.last < n, s"n=$n: empty last chunk")
      assert(starts.last + 32 >= n, s"n=$n: tail uncovered")
      starts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a === 24 && b < a + 32, s"n=$n: gap between chunks")
        case _ =>
      }
    }
  }

  test("q_chunk_contain equals an independent Scala brute force") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    def chunks(l: Seq[String]): Set[String] =
      (0 to (l.size - 1) / 8).map(i => l.slice(i * 8, i * 8 + 8).mkString(" ")).toSet
    val sets = docs.map { case (id, l) => id -> chunks(l) }
    val expected = (for {
      (a, ca) <- sets; (b, cb) <- sets
      if a != b && ca.size >= 2 && ca.subsetOf(cb)
    } yield (a, b, ca.size.toLong)).toSet
    val got = SparkEntry.queries("q_chunk_contain")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("q_semdedup: keep flag is exactly the tau cut over prior-member cosine") {
    val out = SparkEntry.queries("q_semdedup")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val keep = r.getBoolean(3)
      if (keep) assert(r.isNullAt(2) || r.getDouble(2) < 0.45)
      else assert(!r.isNullAt(2) && r.getDouble(2) >= 0.45,
        s"dropped vec ${r.getLong(0)} lacks a prior member at cos >= 0.45")
    }
    // the 4 seed-cluster ids are the only clusters
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("q_hll_sketch: every group estimate and the merged total within 2% of exact") {
    val out = SparkEntry.queries("q_hll_sketch")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).contains("ALL"), "merged-sketch row missing")
    out.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.02,
        s"group ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("q_scd2_dim: intervals chain per user and change points differ from predecessors") {
    val out = SparkEntry.queries("q_scd2_dim")(spark, sf).collect()
    assert(out.nonEmpty)
    // valid_from/valid_to are unix_micros longs (r7 ntz-safe wire
    // convention)
    out.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      val sorted = rows.sortBy(r => (r.getLong(3), r.getLong(1)))
      // exactly one open (current) interval per user, and it is last
      assert(sorted.count(_.getBoolean(5)) === 1)
      assert(sorted.last.getBoolean(5))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3),
            s"user $user: valid_to of one interval must be the next valid_from")
          assert(a.getString(2) !== b.getString(2),
            s"user $user: consecutive intervals must change the attribute")
        case _ =>
      }
    }
  }

  test("q_dedup_lsh_resolve: sound exactly, recall floor vs the exact tau=0.8 resolution") {
    // the approximate contract of the LSH path: the exact verify makes
    // over-merging IMPOSSIBLE (soundness is a hard assertion — every
    // LSH cluster sits inside one exact cluster), while banding recall
    // is probabilistic, so coverage is pinned as a floor, not equality
    // (a tau=0.5 variant of this test failed honestly: per-pair
    // candidate probability at the J=0.5 boundary is only 0.40)
    graft.expr.Registry.ensure(spark)
    val docs = graft.tables.Tables.documents(spark, sf)
    val exactPairs = graft.operators.SetSimJoin.auto(spark,
      docs.select(col("doc_id"), col("lang"),
        expr("token_hashes(split(text, ' '))").as("hs")), tau = 0.8)
      .select("a_id", "b_id")
    val exact = graft.operators.ConnectedComponents
      .components(spark, docs.select("doc_id"), exactPairs)
      .select(col("doc_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = SparkEntry.queries("q_dedup_lsh_resolve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exactLabel = exact.toMap
    // soundness: docs sharing an LSH cluster share the exact cluster
    got.groupBy(_._2).foreach { case (lshCluster, members) =>
      val exactLabels = members.map(m => exactLabel(m._1)).toSet
      assert(exactLabels.size === 1,
        s"LSH cluster $lshCluster merges exact clusters $exactLabels")
    }
    // recall: >= 90% of the docs the exact resolution clusters as
    // duplicates are also clustered by the LSH path
    def dupDocs(labels: Array[(Long, Long)]): Set[Long] = {
      val sizes = labels.groupBy(_._2).view.mapValues(_.length).toMap
      labels.filter(l => sizes(l._2) >= 2).map(_._1).toSet
    }
    val exactDups = dupDocs(exact)
    val gotDups = dupDocs(got)
    assert(exactDups.nonEmpty)
    val recall = (exactDups & gotDups).size.toDouble / exactDups.size
    assert(recall >= 0.9, s"LSH dedup recall $recall below floor")
  }

  test("q_dedup_lsh_resolve: pair recall >= 0.98 vs exact tau=0.8 pairs at sf0.01") {
    // the s-curve bound: with 8 bands x 4 rows, a J >= 0.8 pair is a
    // band candidate with p = 1-(1-J^4)^8 >= 0.985, and the exact
    // verify never drops a true candidate — so pair-level recall of
    // the full resolve pipeline at the larger corpus must clear 0.98
    // (r6, VERDICT item 7; measured value emitted below)
    val sf01 = "/root/testdata/sf0.01"
    val exactPairs = graft.operators.EdgeGraph.pairs(spark, sf01, "token", 0.8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lshLabel = SparkEntry.queries("q_dedup_lsh_resolve")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exactPairs.nonEmpty)
    val recalled = exactPairs.count { case (a, b) => lshLabel(a) == lshLabel(b) }
    val recall = recalled.toDouble / exactPairs.length
    info(f"LSH pair recall at sf0.01: $recall%.4f ($recalled/${exactPairs.length})")
    assert(recall >= 0.98, s"LSH pair recall $recall below the s-curve floor")
  }

  test("LSH banding recall sweep: s-curve floors at tau in {0.6, 0.7, 0.8} (8 bands x 4 rows)") {
    // r6 VERDICT task 6: the single-tau floor couldn't catch a banding
    // change that silently degrades recall at LOWER thresholds (e.g.
    // 4x8 banding keeps tau=0.8 recall near 0.94 but collapses tau=0.6
    // to ~0.07). Pin the whole operating curve: candidate recall of
    // the 8-band x 4-row scheme against the exact tau-pairs must clear
    // the worst-case per-pair s-curve probability 1-(1-tau^4)^8 at
    // each tau (every true pair sits at J >= tau, so aggregate recall
    // dominates the single-point floor; 0.05 slack for the finite
    // sample).
    graft.expr.Registry.ensure(spark)
    val sigs = graft.operators.EdgeGraph.minhashSigs(spark, sf, 32)
    val bands = sigs.select(col("doc_id"), col("lang"), explode(expr(
      "transform(sequence(0, 7), b -> xxhash64(slice(sig, b * 4 + 1, 4), b))"))
      .as("bsig"))
    val cands = bands.alias("a").join(bands.alias("b"),
        col("a.lang") === col("b.lang") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (tau <- Seq(0.6, 0.7, 0.8)) {
      val exact = graft.operators.EdgeGraph.pairs(spark, sf, "token", tau)
        .select("a_id", "b_id").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1))))
      assert(exact.nonEmpty, s"no exact pairs at tau=$tau — fixture too sparse")
      val recall = exact.count(cands).toDouble / exact.length
      val floor = 1.0 - math.pow(1.0 - math.pow(tau, 4), 8)
      info(f"banding candidate recall at tau=$tau%.1f: $recall%.4f " +
        f"(${exact.length} exact pairs, floor ${floor}%.3f)")
      assert(recall >= floor - 0.05,
        f"banding recall $recall%.4f at tau=$tau%.1f fell below the " +
        f"s-curve floor $floor%.3f — banding scheme changed?")
    }
  }

  test("bloom_agg: sized capacity argument works; wrong arity errors loudly") {
    graft.expr.Registry.ensure(spark)
    val hit = spark.sql(
      """SELECT bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(id), 2048L) FROM range(100)),
        |  xxhash64(50L)) AS hit""".stripMargin).head().getBoolean(0)
    assert(hit, "sized bloom must contain an inserted key")
    intercept[Exception] {
      spark.sql("SELECT bloom_agg(xxhash64(id), 10L, 20L) FROM range(10)").collect()
    }
  }

  test("s_tws_running_total (transformWithState) equals the batch groupBy totals") {
    val got = SparkEntry.queries("s_tws_running_total")(spark, sf).collect()
    val expected = graft.tables.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .orderBy("user_id").collect()
    assert(got === expected)
  }

  test("q_embed_norm: norms positive, per-label z-scores center on 0") {
    val out = SparkEntry.queries("q_embed_norm")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) > 0))
    out.groupBy(_.getInt(0)).foreach { case (label, rs) =>
      if (rs.length > 2) {
        val meanZ = rs.map(_.getDouble(3)).sum / rs.length
        assert(math.abs(meanZ) < 0.01, s"label $label mean z = $meanZ")
      }
    }
  }

  test("q_merge_apply is the inverse of q_snapshot_diff: apply(diff) rebuilds NEW exactly") {
    // the CDC pair's defining algebra — diff(old, new) applied onto
    // old must reproduce new, row for row, price for price
    import org.apache.spark.sql.expressions.Window
    val o = graft.tables.Tables.orders(spark, sf)
    val oldSnap = o.filter(col("o_orderkey") % 10 =!= 3)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 10 === 7, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("price"))
    val newSnap = o.filter(col("o_orderkey") % 10 =!= 5)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val diff = SparkEntry.queries("q_snapshot_diff")(spark, sf)
    val applied = oldSnap.join(
        diff.select(col("o_orderkey").as("dk"), col("change_type").as("op"),
          col("price_new").as("dprice")),
        col("k") === col("dk"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(coalesce(col("dk"), col("k")).as("k"),
        coalesce(col("dprice"), col("price")).as("price"))
    assert(applied.exceptAll(newSnap).isEmpty && newSnap.exceptAll(applied).isEmpty,
      "apply(diff(old, new)) must equal new exactly")
  }

  test("q_winsorize invariants: lo <= hi, clips bounded by n, clamped sum within bounds") {
    SparkEntry.queries("q_winsorize")(spark, sf).collect().foreach { r =>
      val (lo, hi) = (r.getDouble(1), r.getDouble(2))
      val (n, nLo, nHi) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val sumMicro = r.getLong(6)
      assert(lo <= hi, s"$r")
      assert(nLo + nHi <= n, s"$r")
      // every clamped value lies in [lo, hi] → so must the mean
      val mean = sumMicro / 1e6 / n
      assert(mean >= lo - 1e-6 && mean <= hi + 1e-6, s"$r")
    }
  }

  test("q_label_balance: every class kept exactly the min class size, kept ⊆ class") {
    val rows = SparkEntry.queries("q_label_balance")(spark, sf).collect()
    val kept = rows.map(_.getLong(2)).toSet
    assert(kept.size === 1, s"all classes must be capped at ONE min size: ${rows.mkString(",")}")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"kept must not exceed total: $r")
    }
    assert(kept.head === rows.map(_.getLong(1)).min,
      "the cap must equal the smallest class's total")
  }

  test("q_salted_distinct semantics survive any salt width") {
    // the two-phase rewrite is exact for EVERY modulus, not just 64 —
    // pin the algebra, not the constant
    val ev = graft.tables.Tables.events(spark, sf)
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(1, 7, 256).foreach { m =>
      val salted = ev
        .select(col("event_type"), pmod(hash(col("user_id")), lit(m)).as("salt"),
          col("user_id"))
        .groupBy("event_type", "salt").agg(countDistinct("user_id").as("pd"))
        .groupBy("event_type").agg(sum("pd").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(salted === exact, s"salt width $m changed the distinct counts")
    }
  }
}
