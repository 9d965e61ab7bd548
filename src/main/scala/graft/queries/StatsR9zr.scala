package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Round-9 wave 45 (SURVEY.md §2 B.10b): optimizer/planner audit
  * keys — the statistics a distributed engine actually plans with,
  * measured against ground truth: hash-bucket collision counts vs
  * the birthday expectation at three widths, hash-shard skew under
  * two candidate shard keys, textbook join-cardinality estimates
  * |A||B|/max(d_a,d_b) vs actual, equi-width-histogram selectivity
  * vs actual for a non-boundary predicate, partition-pruning
  * fractions for a quarter predicate over month partitions, and
  * byte-size broadcast eligibility per dimension table.
  *
  * All measurements exact (counts, octet lengths, integer hashes);
  * expectations are one double chain each.
  */
object StatsR9zr {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Hash collisions of customer keys into m ∈ {2^10, 2^14, 2^18}
    // buckets (Knuth multiplicative, stated): collisions = n −
    // occupied, vs the birthday expectation n − m(1−(1−1/m)^n).
    "q_hash_collisions" -> ((s, d) => {
      import s.implicits._
      val keys = Tables.customer(s, d)
        .select(col("c_custkey").as("k")).distinct()
        .localCheckpoint(eager = true)
      val ms = Seq(1024L, 16384L, 262144L).toDF("m")
      val occ = keys.crossJoin(broadcast(ms))
        .select(col("m"),
          // mod-2^63 DECIMAL reduction: k·C overflows BIGINT for keys
          // above ~3.5e9 (ANSI Spark throws, DuckDB raises); identity
          // for smaller keys (oracle mirrors via HUGEINT)
          expr("CAST(pmod(CAST(k AS DECIMAL(38,0)) * 2654435761," +
            " 9223372036854775808) AS BIGINT) % 4294967296 % m").as("b"))
        .groupBy("m").agg(countDistinct("b").as("occupied"))
      val n = keys.count()
      occ.select(col("m").as("n_buckets"), lit(n).as("n_keys"),
          (lit(n) - col("occupied")).as("collisions"),
          round(lit(n.toDouble) - col("n_buckets")
            * (lit(1.0) - pow(lit(1.0) - lit(1.0) / col("n_buckets"),
              lit(n.toDouble))), 4).as("expected_collisions"))
        .orderBy("n_buckets")
    }),

    // Shard skew over 32 hash shards for two candidate keys on
    // orders: max/mean and the CV of shard sizes.
    "q_shard_skew" -> ((s, d) => {
      def skew(keyCol: String, name: String) =
        Tables.orders(s, d)
          .select(expr(s"CAST(pmod(CAST($keyCol AS DECIMAL(38,0))" +
            " * 2654435761, 9223372036854775808) AS BIGINT)" +
            " % 4294967296 % 32").as("shard"))
          .groupBy("shard").agg(count(lit(1)).as("c"))
          .agg(lit(name).as("shard_key"),
            count(lit(1)).as("n_shards"), sum("c").as("n_rows"),
            max("c").as("max_shard"),
            sum(col("c") * col("c")).as("scc"))
          .select(col("shard_key"), col("n_shards"), col("n_rows"),
            round(col("max_shard").cast("double") * col("n_shards")
              / col("n_rows"), 6).as("max_over_mean"),
            round(sqrt(col("n_shards").cast("double") * col("scc")
              / (col("n_rows").cast("double") * col("n_rows"))
              - lit(1.0)), 6).as("cv"))
      skew("o_custkey", "custkey").union(skew("o_orderkey", "orderkey"))
        .orderBy("shard_key")
    }),

    // Join-cardinality estimates vs actual for the two core joins:
    // est = |A|·|B| / max(d_A(k), d_B(k)).
    "q_join_card_audit" -> ((s, d) => {
      val li = Tables.lineitem(s, d).localCheckpoint(eager = true)
      val j1 = li.join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("actual"))
        .withColumn("join_name", lit("lineitem_orders"))
      val s1 = li.agg(count(lit(1)).as("na"),
        countDistinct("l_orderkey").as("da"))
        .crossJoin(Tables.orders(s, d).agg(count(lit(1)).as("nb"),
          countDistinct("o_orderkey").as("db")))
      val j2 = li.join(Tables.part(s, d),
        col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("actual"))
        .withColumn("join_name", lit("lineitem_part"))
      val s2 = li.agg(count(lit(1)).as("na"),
        countDistinct("l_partkey").as("da"))
        .crossJoin(Tables.part(s, d).agg(count(lit(1)).as("nb"),
          countDistinct("p_partkey").as("db")))
      val r1 = j1.crossJoin(s1)
      val r2 = j2.crossJoin(s2)
      r1.union(r2)
        .select(col("join_name"), col("actual"),
          round(col("na").cast("double") * col("nb")
            / greatest(col("da"), col("db")), 4).as("estimate"),
          round(col("na").cast("double") * col("nb")
            / greatest(col("da"), col("db")) / col("actual"), 6)
            .as("est_over_actual"))
        .orderBy("join_name")
    }),

    // Histogram selectivity for value > 147 (non-boundary, stated)
    // from a 20-bucket equi-width histogram on [0, 200): est = full
    // buckets above + the uniform 3/10 fraction of bucket 14.
    "q_selectivity_audit" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("value"),
          least(floor(col("value") / 10).cast("long"), lit(19L))
            .as("b"))
        .localCheckpoint(eager = true)
      val hist = ev.groupBy("b").agg(count(lit(1)).as("c"))
      val est = hist.agg(sum(when(col("b") >= 15, col("c"))
          .otherwise(0L)).as("full_part"),
        sum(when(col("b") === 14, col("c")).otherwise(0L))
          .as("boundary"),
        sum("c").as("n"))
      val act = ev.filter(col("value") > 147)
        .agg(count(lit(1)).as("actual"))
      est.crossJoin(act)
        .select(col("n").as("n_events"), col("actual"),
          round(col("full_part") + lit(0.3) * col("boundary"), 4)
            .as("estimate"),
          round((col("full_part") + lit(0.3) * col("boundary"))
            / col("actual"), 6).as("est_over_actual"))
    }),

    // Partition pruning for 1997Q2 over month partitions of
    // lineitem.shipdate: partitions hit and the row fraction.
    "q_partition_prune_audit" -> ((s, d) => {
      val pm = Tables.lineitem(s, d)
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
          .as("m"))
        .agg(count(lit(1)).as("c"))
        .withColumn("hit", col("m") >= lit("1997-04-01").cast("date")
          && col("m") < lit("1997-07-01").cast("date"))
      pm.agg(count(lit(1)).as("n_partitions"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"),
          sum("c").as("n_rows"),
          sum(when(col("hit"), col("c")).otherwise(0L)).as("rows_hit"))
        .select(col("n_partitions"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_partitions"), 6)
            .as("partition_fraction"),
          round(col("rows_hit").cast("double") / col("n_rows"), 6)
            .as("row_fraction"))
    }),

    // Broadcast eligibility per dimension table: est bytes = 20/row
    // overhead + 8 per numeric + octet_length per string (stated
    // model); broadcastable under 10 MiB.
    "q_broadcast_audit" -> ((s, d) => {
      def est(df: DataFrame, name: String, numCols: Int,
          strCols: Seq[String]) = {
        val strBytes = strCols.map(c => octet_length(col(c))
          .cast("long")).reduceOption(_ + _).getOrElse(lit(0L))
        df.agg(lit(name).as("table_name"),
          count(lit(1)).as("n_rows"),
          sum(lit(20L + 8L * numCols) + strBytes).as("est_bytes"))
      }
      val rows = Seq(
        est(Tables.region(s, d), "region", 1, Seq("r_name")),
        est(Tables.nation(s, d), "nation", 2, Seq("n_name")),
        est(Tables.supplier(s, d), "supplier", 3, Seq("s_name")),
        est(Tables.customer(s, d), "customer", 3,
          Seq("c_name", "c_mktsegment")),
        est(Tables.part(s, d), "part", 3,
          Seq("p_name", "p_brand", "p_type")))
      rows.reduce(_ union _)
        .select(col("table_name"), col("n_rows"), col("est_bytes"),
          (col("est_bytes") < 10L * 1024 * 1024).as("broadcastable"))
        .orderBy("table_name")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical Knuth buckets + birthday expectation
    "q_hash_collisions" ->
      """WITH keys AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys),
        |ms AS (SELECT UNNEST([1024, 16384, 262144]) AS m),
        |occ AS (
        |  SELECT ms.m,
        |    CAST(COUNT(DISTINCT ((CAST(k.k AS HUGEINT) * 2654435761)
        |      % 9223372036854775808) % 4294967296
        |      % ms.m) AS BIGINT) AS occupied
        |  FROM keys k, ms GROUP BY 1)
        |SELECT CAST(occ.m AS BIGINT) AS n_buckets, n.n AS n_keys,
        |  n.n - occ.occupied AS collisions,
        |  ROUND(CAST(n.n AS DOUBLE) - occ.m
        |    * (1.0 - POW(1.0 - 1.0 / occ.m, CAST(n.n AS DOUBLE))), 4)
        |    AS expected_collisions
        |FROM occ, n ORDER BY n_buckets""".stripMargin,

    // identical shard-size moments
    "q_shard_skew" ->
      """WITH a AS (
        |  SELECT ((CAST(o_custkey AS HUGEINT) * 2654435761)
        |      % 9223372036854775808) % 4294967296 % 32 AS shard,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT ((CAST(o_orderkey AS HUGEINT) * 2654435761)
        |      % 9223372036854775808) % 4294967296 % 32 AS shard,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |sa AS (
        |  SELECT 'custkey' AS shard_key,
        |    CAST(COUNT(*) AS BIGINT) AS n_shards,
        |    CAST(SUM(c) AS BIGINT) AS n_rows,
        |    MAX(c) AS mx, SUM(c * c) AS scc
        |  FROM a),
        |sb AS (
        |  SELECT 'orderkey' AS shard_key,
        |    CAST(COUNT(*) AS BIGINT) AS n_shards,
        |    CAST(SUM(c) AS BIGINT) AS n_rows,
        |    MAX(c) AS mx, SUM(c * c) AS scc
        |  FROM b),
        |u AS (SELECT * FROM sa UNION ALL SELECT * FROM sb)
        |SELECT shard_key, n_shards, n_rows,
        |  ROUND(CAST(mx AS DOUBLE) * n_shards / n_rows, 6)
        |    AS max_over_mean,
        |  ROUND(sqrt(CAST(n_shards AS DOUBLE) * scc
        |    / (CAST(n_rows AS DOUBLE) * n_rows) - 1.0), 6) AS cv
        |FROM u ORDER BY shard_key""".stripMargin,

    // identical textbook estimates
    "q_join_card_audit" ->
      """WITH j1 AS (
        |  SELECT 'lineitem_orders' AS join_name,
        |    CAST(COUNT(*) AS BIGINT) AS actual
        |  FROM lineitem l JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey),
        |s1 AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
        |      AS na,
        |    (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
        |      FROM lineitem) AS da,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS nb,
        |    (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
        |      FROM orders) AS db),
        |j2 AS (
        |  SELECT 'lineitem_part' AS join_name,
        |    CAST(COUNT(*) AS BIGINT) AS actual
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |s2 AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
        |      AS na,
        |    (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        |      FROM lineitem) AS da,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS nb,
        |    (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT)
        |      FROM part) AS db),
        |u AS (
        |  SELECT j1.join_name, j1.actual, s1.na, s1.nb, s1.da, s1.db
        |  FROM j1, s1
        |  UNION ALL
        |  SELECT j2.join_name, j2.actual, s2.na, s2.nb, s2.da, s2.db
        |  FROM j2, s2)
        |SELECT join_name, actual,
        |  ROUND(CAST(na AS DOUBLE) * nb / GREATEST(da, db), 4)
        |    AS estimate,
        |  ROUND(CAST(na AS DOUBLE) * nb / GREATEST(da, db) / actual,
        |    6) AS est_over_actual
        |FROM u ORDER BY join_name""".stripMargin,

    // identical histogram estimate
    "q_selectivity_audit" ->
      """WITH ev AS (
        |  SELECT value,
        |    LEAST(CAST(FLOOR(value / 10) AS BIGINT), 19) AS b
        |  FROM events),
        |hist AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM ev GROUP BY 1),
        |est AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN b >= 15 THEN c ELSE 0 END) AS BIGINT)
        |      AS full_part,
        |    CAST(SUM(CASE WHEN b = 14 THEN c ELSE 0 END) AS BIGINT)
        |      AS boundary,
        |    CAST(SUM(c) AS BIGINT) AS n
        |  FROM hist),
        |act AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS actual FROM ev
        |  WHERE value > 147)
        |SELECT n AS n_events, actual,
        |  ROUND(full_part + 0.3 * CAST(boundary AS DOUBLE), 4) AS estimate,
        |  ROUND((full_part + 0.3 * CAST(boundary AS DOUBLE)) / actual, 6)
        |    AS est_over_actual
        |FROM est, act""".stripMargin,

    // identical month-partition pruning fractions
    "q_partition_prune_audit" ->
      """WITH pm AS (
        |  SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
        |      AS DATE) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |fl AS (
        |  SELECT *, m >= DATE '1997-04-01' AND m < DATE '1997-07-01'
        |      AS hit
        |  FROM pm)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hit,
        |  ROUND(CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS partition_fraction,
        |  ROUND(CAST(SUM(CASE WHEN hit THEN c ELSE 0 END) AS DOUBLE)
        |    / SUM(c), 6) AS row_fraction
        |FROM fl""".stripMargin,

    // identical byte model
    "q_broadcast_audit" ->
      """WITH r_ AS (
        |  SELECT 'region' AS table_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(20 + 8 * 1 + strlen(r_name)) AS BIGINT)
        |      AS est_bytes
        |  FROM region),
        |n_ AS (
        |  SELECT 'nation', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(20 + 8 * 2 + strlen(n_name)) AS BIGINT)
        |  FROM nation),
        |s_ AS (
        |  SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(20 + 8 * 3 + strlen(s_name)) AS BIGINT)
        |  FROM supplier),
        |c_ AS (
        |  SELECT 'customer', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(20 + 8 * 3 + strlen(c_name)
        |      + strlen(c_mktsegment)) AS BIGINT)
        |  FROM customer),
        |p_ AS (
        |  SELECT 'part', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(20 + 8 * 3 + strlen(p_name)
        |      + strlen(p_brand) + strlen(p_type))
        |      AS BIGINT)
        |  FROM part),
        |u AS (
        |  SELECT * FROM r_ UNION ALL SELECT * FROM n_
        |  UNION ALL SELECT * FROM s_ UNION ALL SELECT * FROM c_
        |  UNION ALL SELECT * FROM p_)
        |SELECT table_name, n_rows, est_bytes,
        |  est_bytes < 10 * 1024 * 1024 AS broadcastable
        |FROM u ORDER BY table_name""".stripMargin
  )
}
