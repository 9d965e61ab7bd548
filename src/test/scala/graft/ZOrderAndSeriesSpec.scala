package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{Registry, ZOrderKey}
import graft.tables.Tables

/** Semantic tests for the late-r4 operators beyond the oracle compare:
  * z-order interleave properties (roundtrip, containment-box bound,
  * codegen-only compilation), rolling-median and gap-stats full
  * driver-side recomputes, TPC-H Q10 exact-decimal recompute.
  */
class ZOrderAndSeriesSpec extends AnyFunSuite with SparkFixture {

  // ---- zorder2 expression ----

  test("zorder2 roundtrips and bounds: deinterleave inverts, quad-tree containment") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      val z = ZOrderKey.interleave16(x, y)
      assert(z >= 0L && z < (1L << 32))
      assert(ZOrderKey.deinterleave16(z) === ((x, y)))
      // quad-tree containment: z < 4^k  <=>  x < 2^k && y < 2^k — the
      // property that makes a zkey range scan a 2-D box scan
      (1 to 16).foreach { k =>
        assert((z < (1L << (2 * k))) === (x < (1L << k) && y < (1L << k)))
      }
    }
  }

  test("zorder2 DataFrame path matches the reference implementation; ints widen") {
    Registry.ensure(spark)
    val rows = spark.range(0, 1000).selectExpr(
      "cast(pmod(id * 2654435761, 65536) as long) AS x",
      "cast(pmod(id * 40503, 65536) as long) AS y",
      "cast(pmod(id * 40503, 65536) as int) AS y_int")
    val got = rows.selectExpr("x", "y", "zorder2(x, y) AS z", "zorder2(x, y_int) AS z2")
      .collect()
    got.foreach { r =>
      val expect = ZOrderKey.interleave16(r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === expect)
      assert(r.getLong(3) === expect, "int input must widen, not fail")
    }
  }

  test("fused zorder2 projection compiles under CODEGEN_ONLY (freshName'd locals)") {
    Registry.ensure(spark)
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = spark.range(1, 100).selectExpr(
        "zorder2(id, id + 1) AS z1",
        "zorder2(id + 1, id) AS z2").collect()
      out.zipWithIndex.foreach { case (r, i) =>
        val id = i + 1L
        assert(r.getLong(0) === ZOrderKey.interleave16(id, id + 1))
        assert(r.getLong(1) === ZOrderKey.interleave16(id + 1, id))
      }
    } finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("q_zorder_layout buckets are ntile-balanced with sane dim ranges") {
    val got = SparkEntry.queries("q_zorder_layout")(spark, sf).collect()
    assert(got.length === 16)
    val total = got.map(_.getLong(1)).sum
    assert(total === Tables.orders(spark, sf).count())
    val sizes = got.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile must balance bucket sizes")
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // x_min <= x_max
      assert(r.getLong(4) <= r.getLong(5)) // y_min <= y_max
      assert(r.getLong(2) >= 0 && r.getLong(3) < 65536)
    }
  }

  // ---- q_gap_stats: full driver-side recompute ----

  test("q_gap_stats matches a driver-side recompute at sf0.001") {
    import spark.implicits._
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val gaps = raw.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._4)).map(_._3)
      sorted.zip(sorted.drop(1)).map { case (a, b) => (evs.head._2, b - a) }
    }
    val expected = gaps.groupBy(_._1).map { case (tpe, gs) =>
      val v = gs.map(_._2)
      tpe -> ((v.size.toLong, v.sum, v.min, v.max,
        BigDecimal(v.sum.toDouble / v.size / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = SparkEntry.queries("q_gap_stats")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, sum, mn, mx, avg) = expected(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === sum)
      assert(r.getLong(3) === mn)
      assert(r.getLong(4) === mx)
      assert(math.abs(r.getDouble(5) - avg) < 1e-9)
    }
  }

  // ---- q_rolling_median: full driver-side recompute ----

  test("q_rolling_median matches a driver-side recompute at sf0.001") {
    import spark.implicits._
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[(String, Long, Long, Double)].collect()
    // interpolated median over the trailing <=11-row frame, identical
    // ordering (ts, event_id)
    val expected = raw.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 10), i + 1).map(_._4).sorted
        val n = frame.length
        val med =
          if (n % 2 == 1) frame(n / 2)
          else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        sorted(i)._3 -> math.round(med * 10000).toDouble / 10000
      }
    }
    val got = SparkEntry.queries("q_rolling_median")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      assert(r.getDouble(3) === expected(r.getLong(0)),
        s"event_id=${r.getLong(0)}")
    }
  }

  // ---- q_skyline: brute-force dominance recompute + tie semantics ----

  test("q_skyline matches the quadratic dominance definition at sf0.001") {
    import spark.implicits._
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[(Long, Double, Int)].collect()
    val expected = parts.filter { p =>
      !parts.exists(q =>
        (q._2 < p._2 && q._3 >= p._3) || (q._2 <= p._2 && q._3 > p._3))
    }.map(_._1).sorted
    val got = SparkEntry.queries("q_skyline")(spark, sf)
      .collect().map(_.getLong(0))
    assert(got.toSeq === expected.toSeq)
  }

  test("q_skyline keeps BOTH members of an exact (price, size) tie") {
    // two parts at the identical Pareto point: neither strictly
    // dominates the other, so the frontier must contain both
    val dir = java.nio.file.Files.createTempDirectory("graft_skyline").toString
    import spark.implicits._
    Seq(
      (1L, "a", 10.0, 5), // frontier (tied with 2)
      (2L, "b", 10.0, 5), // frontier (tied with 1)
      (3L, "c", 12.0, 5), // dominated by 1/2 (pricier, same size)
      (4L, "d", 9.0, 3),  // frontier (cheapest overall ceiling below)
      (5L, "e", 9.5, 3)   // dominated by 4 (pricier, same size)
    ).toDF("p_partkey", "p_name", "p_retailprice", "p_size")
      .write.parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q_skyline")(spark, dir)
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L, 2L, 4L))
  }

  // ---- q_dup_cluster_sizes: consistency with the component labels ----

  test("q_dup_cluster_sizes partitions the corpus and matches q_dedup_components") {
    val sizes = SparkEntry.queries("q_dup_cluster_sizes")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(sizes.map(_.getLong(2)).sum === nDocs, "every doc in exactly one cluster")
    sizes.foreach(r => assert(r.getLong(0) * r.getLong(1) === r.getLong(2)))
    // the distribution must agree with the raw component labels
    val labels = SparkEntry.queries("q_dedup_components")(spark, sf)
      .collect().map(_.getLong(1))
    val expected = labels.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sizes.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  // ---- q_sliding_distinct: driver-side recompute ----

  test("q_sliding_distinct matches a driver-side trailing-window recompute") {
    import spark.implicits._
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().as[(java.sql.Date, Long)].collect()
      .map(p => (p._1.toLocalDate, p._2))
    val days = du.map(_._1).distinct.sorted
    val expected = days.map { d =>
      d -> du.filter(p => !p._1.isAfter(d) && !p._1.isBefore(d.minusDays(6)))
        .map(_._2).distinct.size.toLong
    }.toMap
    val got = SparkEntry.queries("q_sliding_distinct")(spark, sf)
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got === expected)
  }

  // ---- bloom_agg / bloom_might_contain: no false negatives ----

  test("bloom filter admits every inserted key and rejects most others") {
    Registry.ensure(spark)
    spark.range(0, 5000).createOrReplaceTempView("bloom_in")
    // every inserted key must probe true (the property the semi-join
    // pre-filter's correctness rests on)
    val misses = spark.sql(
      """SELECT COUNT(*) FROM bloom_in
        |WHERE NOT bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(id)) FROM bloom_in), xxhash64(id))""".stripMargin)
      .head().getLong(0)
    assert(misses === 0L, "bloom filters must have no false negatives")
    // and the false-positive rate on disjoint keys stays far below 1
    val fp = spark.sql(
      """SELECT COUNT(*) FROM (SELECT id + 1000000 AS id FROM bloom_in)
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(xxhash64(id)) FROM bloom_in), xxhash64(id))""".stripMargin)
      .head().getLong(0)
    assert(fp < 500, s"false-positive rate implausibly high: $fp/5000")
  }

  // ---- q_join_asof_merge ≡ q_join_asof ----

  test("q_join_asof_merge produces exactly q_join_asof's rows") {
    val a = SparkEntry.queries("q_join_asof")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_join_asof_merge")(spark, sf).collect().toSeq
    assert(b === a)
  }

  // ---- q_graph_triangles: brute-force recompute ----

  test("q_graph_triangles matches a brute-force triangle count at sf0.001") {
    import spark.implicits._
    // independent edge derivation at the query's τ=0.95: distinct-token
    // Jaccard per same-lang doc pair, brute force over the 500 docs
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
      .map(d => (d._1, d._2, d._3.split(" ").toSet))
    val edges = (for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._2 == b._2
      inter = (a._3 & b._3).size
      j = inter.toDouble / (a._3.size + b._3.size - inter)
      if j >= 0.95
    } yield (a._1, b._1)).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if edges((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if edges((nodes(j), nodes(k))) && edges((nodes(i), nodes(k)))
    } Seq(nodes(i), nodes(j), nodes(k)).foreach { n =>
      expected(n) = expected.getOrElse(n, 0L) + 1
    }
    val got = SparkEntry.queries("q_graph_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected.toMap)
  }

  // ---- q_cte_recursive: driver-side BFS recompute ----

  test("q_cte_recursive matches a driver-side BFS over the shingle pairs") {
    val pairs = SparkEntry.queries("q_dedup_shingle")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seed = pairs.map(_._1).min
    var depths = Map(seed -> 0)
    var frontier = Set(seed)
    (1 to 3).foreach { d =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(depths.contains)
      depths ++= frontier.map(_ -> d)
    }
    val got = SparkEntry.queries("q_cte_recursive")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === depths)
  }

  // ---- q_tpch_q18: driver-side recompute ----

  test("q_tpch_q18 matches a driver-side recompute at sf0.001") {
    import spark.implicits._
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 > 250).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[(Long, Long, Double)].collect()
      .filter(o => qty.contains(o._1))
    val expected = orders.sortBy(o => (-o._3, o._1)).take(100)
    val got = SparkEntry.queries("q_tpch_q18")(spark, sf).collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (ok, ck, price)) =>
      assert(r.getLong(2) === ok)
      assert(r.getLong(0) === ck)
      assert(r.getDouble(4) === price)
      assert(r.getDouble(5) === qty(ok))
    }
  }

  // ---- q_tpch_q10: exact-decimal recompute ----

  test("q_tpch_q10 matches a driver-side exact-decimal recompute at sf0.001") {
    import spark.implicits._
    val lo = lit("1997-01-01").cast("timestamp_ntz")
    val hi = lit("1997-04-01").cast("timestamp_ntz")
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
      .as[(Long, Long)].collect().toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .as[(Long, String, Int)].collect().map(c => c._1 -> c).toMap
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)].collect()
    val byCust = li.flatMap { case (ok, price, disc) =>
      orders.get(ok).map { ck =>
        ck -> (BigInt(math.round(price * 100)) * BigInt(math.round(100 - disc * 100)))
      }
    }.groupBy(_._1).map { case (ck, xs) => ck -> xs.map(_._2).sum }
    val expectTop = byCust.toSeq.sortBy { case (ck, r4) => (-r4, ck) }.take(20)
    val got = SparkEntry.queries("q_tpch_q10")(spark, sf).collect()
    assert(got.length === expectTop.length)
    got.zip(expectTop).foreach { case (r, (ck, r4)) =>
      assert(r.getLong(0) === ck)
      assert(r.getString(1) === cust(ck)._2)
      assert(BigInt(r.getString(4)) === r4)
    }
  }
}
