package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 invariants: CDC merge semantics against an independent
  * Scala re-derivation, the tombstone search contract (no deleted id
  * reachable), the compaction rewrite's one-file-per-bin layout, and
  * the µ-grid sign invariant the div-vs-floor cross-engine contract
  * depends on (r12 ADVICE).
  */
class R13OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_cdc_merge matches an independent driver-side merge at the fixture SF") {
    // the fixture is small enough to replay the I/U/D semantics in
    // plain Scala — an oracle INDEPENDENT of both Spark plan and
    // DuckDB SQL (those two check each other in the hash gate)
    val base = graft.tables.Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ops = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map { r =>
        val ok = r.getLong(0); val m = ok % 5
        val k = if (m == 3) ok + 1000000L else r.getLong(1)
        val op = if (m == 0) "D" else if (m == 3) "I" else "U"
        (k, ok, op, r.getDouble(2))
      }
    val latest = ops.groupBy(_._1).map { case (k, rows) =>
      val (_, _, op, nv) = rows.maxBy(_._2); k -> (op, nv)
    }
    val merged = (base.keySet ++ latest.keySet).toSeq.flatMap { k =>
      latest.get(k) match {
        case Some(("D", _)) => None
        case Some((_, nv))  => Some(k -> nv)
        case None           => Some(k -> base(k))
      }
    }
    val expect = merged.groupBy(_._1 % 8).map { case (b, rows) =>
      b -> (rows.size.toLong,
        rows.map(r => math.round(r._2 * 100)).sum,
        rows.map(_._1).min, rows.map(_._1).max)
    }
    val got = SparkEntry.queries("q_cdc_merge")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
    // the D and I op kinds both fired at this SF (the fixture is
    // live); the keep-base path (a key with NO ops) does not occur at
    // sf0.001 — every customer has orders — so pin it only where it
    // exists (it binds at sf0.01+ through the DuckDB oracle's FULL
    // OUTER join either way)
    assert(latest.values.exists(_._1 == "D"))
    assert(latest.keys.exists(_ > 1000000L))
    val untouched = base.keySet -- latest.keySet
    untouched.foreach { k =>
      assert(merged.toMap.get(k).contains(base(k)),
        s"key $k has no ops but lost its base value")
    }
  }

  test("q_ann_tombstone: no deleted id appears, and a beam over the repaired graph reaches only survivors") {
    graft.expr.Registry.ensure(spark)
    val dead = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"))
      .filter((conv(substring(md5(col("vec_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100) < 5)
      .collect().map(_.getLong(0)).toSet
    assert(dead.nonEmpty, "fixture has no tombstoned ids — rule dead")
    val env = SparkEntry.queries("q_ann_tombstone")(spark, sf).collect()
    assert(env.nonEmpty)
    val nodes = env.map(_.getLong(0)).toSet
    assert(nodes.intersect(dead).isEmpty, "deleted id kept its edges")
    // search contract: 3 greedy hops over the REPAIRED graph from the
    // smallest surviving node touch survivors only (the RTBF bar: a
    // deleted vector must be unreachable, not merely down-ranked)
    val g = queries.StatsR11.corpusCellGraph(spark, sf)
      .join(broadcast(graft.tables.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("a_id"))
        .filter((conv(substring(md5(col("a_id").cast("string")), 1, 4),
          16, 10).cast("int") % 100) < 5)), Seq("a_id"), "left_anti")
      .join(broadcast(graft.tables.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("b_id"))
        .filter((conv(substring(md5(col("b_id").cast("string")), 1, 4),
          16, 10).cast("int") % 100) < 5)), Seq("b_id"), "left_anti")
      .select("a_id", "b_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    var frontier = Set(nodes.min)
    var visited = frontier
    for (_ <- 1 to 3) {
      frontier = frontier.flatMap(g.getOrElse(_, Set.empty)) -- visited
      visited ++= frontier
    }
    assert(visited.intersect(dead).isEmpty,
      s"beam reached deleted ids: ${visited.intersect(dead).take(3)}")
    assert(visited.size > 1, "repaired graph disconnected at the entry")
  }

  test("tombstone conservation: live edges + retractions - double-counted = full graph") {
    // the two r13 deletion faces must account for every edge exactly
    // once: q_ann_tombstone keeps edges with BOTH endpoints alive;
    // s_stream_graph_delete's feed emits one out-row per edge whose
    // source died and one in-row per edge whose target died (an edge
    // with both endpoints dead appears in both) — so
    // live + out + in − both == all edges of the full graph
    graft.expr.Registry.ensure(spark)
    val dead = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"))
      .filter((conv(substring(md5(col("vec_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100) < 5)
      .collect().map(_.getLong(0)).toSet
    val edges = queries.StatsR11.corpusCellGraph(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val live = edges.count { case (a, b) => !dead(a) && !dead(b) }
    val out = edges.count { case (a, _) => dead(a) }
    val in = edges.count { case (_, b) => dead(b) }
    val both = edges.count { case (a, b) => dead(a) && dead(b) }
    assert(live + out + in - both === edges.length)
    // and the shipped keys see exactly these masses
    val liveKey = SparkEntry.queries("q_ann_tombstone")(spark, sf)
      .agg(sum("n_nb")).head.getLong(0)
    assert(liveKey === live.toLong)
    val del = SparkEntry.queries("s_stream_graph_delete")(spark, sf)
      .agg(sum("n_out"), sum("n_in")).head
    assert((del.getLong(0), del.getLong(1)) === ((out.toLong, in.toLong)))
  }

  test("q_compaction_rewrite lands exactly one file per (source, bin)") {
    val res = SparkEntry.queries("q_compaction_rewrite")(spark, sf)
    val bins = res.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(bins.nonEmpty)
    val out = graft.util.Scratch.pidDirFor("compaction_rw", sf)
    bins.foreach { case (src, bin) =>
      val dir = new java.io.File(s"$out/source=$src/bin=$bin")
      assert(dir.isDirectory, s"missing partition dir $dir")
      val files = dir.listFiles().map(_.getName)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      assert(files.length === 1,
        s"bin ($src, $bin) has ${files.length} files — compaction " +
          s"must land one: ${files.mkString(",")}")
    }
  }

  test("µ-grid sign invariant: every per-node cosine sum feeding a half-up div is non-negative") {
    // the Spark side divides with `div` (truncation) and the oracle
    // with DuckDB `//` (floor); they agree ONLY for non-negative
    // numerators (r12 ADVICE). The 6dp/µ grids make the contract
    // data-dependent, so pin it where it binds: the NN-descent
    // rounds' per-node top-8 sums. The sf0.01/sf0.1 hash sweeps
    // guard the same invariant at the driver SFs — this names the
    // failing side if a future fixture breaks it.
    graft.expr.Registry.ensure(spark)
    val all = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val gA = queries.StatsR11.corpusCellGraph(spark, sf)
    val gB = queries.StatsR11.corpusCellGraph(spark, sf, altSeeds = true)
    val g0 = gA.unionByName(gB).distinct()
    val g1 = graft.operators.NnDescent.round(all, g0)
    val g2 = graft.operators.NnDescent.round(all, g1)
    for ((g, tag) <- Seq((g1, "g1"), (g2, "g2"))) {
      val minSu = g.groupBy("a_id").agg(sum("cu").as("su"))
        .agg(min("su")).head.getLong(0)
      assert(minSu >= 0L,
        s"$tag: a node's top-8 µ-cosine sum went negative ($minSu) — " +
          "the div/floor halves of the mean contract now disagree")
    }
    // the cell-assignment µ means (s_stream_cell_assign and friends)
    // divide the per-CELL sum of best-centroid cosines — individual
    // elements CAN be negative (measured −0.095 at sf0.001); the
    // contract needs the per-cell SUM ≥ 0
    val k = graft.operators.Cells.k(all.count())
    val cents = all.filter(col("vec_id").between(1, k))
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").as("c_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs").desc, col("cell"))
    // bounded grain: per-vector window over k candidate rows
    val minCellSu = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        round(expr("cosine_sim(embedding, c_emb)"), 6).as("cs"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("cell")
      .agg(sum(expr("CAST(ROUND(cs * 1e6) AS BIGINT)")).as("su"))
      .agg(min("su")).head.getLong(0)
    assert(minCellSu >= 0L,
      s"a cell's cosine sum went negative ($minCellSu) — the " +
        "div/floor halves of the mean contract now disagree")
  }
}
