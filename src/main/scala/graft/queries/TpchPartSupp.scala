package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** The five partsupp-dependent TPC-H queries (Q2, Q9, Q11, Q16, Q20),
  * completing full 22/22 TPC-H coverage (the other 17 live in
  * queries/Aggs.scala Q1, queries/Joins.scala Q3/5/7/10/14/18/19 and
  * queries/TpchExtra.scala Q4/6/8/12/13/15/17/21/22).
  *
  * This testdata has no partsupp table, so one is DERIVED — the same
  * move B.11 makes for the eth columns (SURVEY §2 B.11: synthesized
  * inputs where the corpus lacks the column). `partsupp` :=
  * the DISTINCT (l_partkey, l_suppkey) pairs actually present in
  * lineitem (referential integrity with the fact table holds by
  * construction, exactly as dbgen guarantees it), carrying
  * deterministic integer-formula attributes:
  *
  *   ps_availqty        = (pk*37 + sk*61)  % 9999  + 1     (1..9999)
  *   ps_supplycost_cents= (pk*73 + sk*151) % 99901 + 100   ($1.00..$1000.00)
  *
  * Pure positive-integer arithmetic, so Spark and the DuckDB oracle
  * compute bit-identical values (no float, no engine-specific mod
  * semantics — both operands are non-negative).
  *
  * Scale posture: the derivation is a 2-column projected scan +
  * DISTINCT (map-side partial agg, then one shuffle on the pair) —
  * at 100 TB this is the standard build-the-dimension-once pattern;
  * a real deployment materializes it (the q_io_partitioned /
  * q_join_bucketed write path) instead of re-deriving per query.
  * All money math follows the house rule (queries/Joins.scala): exact
  * integer 1e-4-dollar units end-to-end, doubles only in final
  * display columns.
  */
object TpchPartSupp {

  private val psCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), DataFrame]()

  /** Derived partsupp: ps_partkey, ps_suppkey, ps_availqty (long),
    * ps_supplycost_cents (long). Memoized per (context, sfDir) and
    * localCheckpoint'd like the EdgeGraph derivations — five queries
    * consume it, and a real deployment materializes the dimension
    * once per corpus snapshot rather than re-running the DISTINCT
    * per query. */
  private[graft] def partsupp(s: SparkSession, d: String): DataFrame = {
    val it = psCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.isStopped) it.remove()
    psCache.computeIfAbsent((s.sparkContext, d), _ =>
      Tables.lineitem(s, d)
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .distinct()
        .withColumn("ps_availqty",
          (col("ps_partkey") * 37 + col("ps_suppkey") * 61) % 9999 + 1)
        .withColumn("ps_supplycost_cents",
          (col("ps_partkey") * 73 + col("ps_suppkey") * 151) % 99901 + 100)
        .localCheckpoint(true))
  }

  /** The oracle-side CTE mirroring [[partsupp]] exactly. */
  private val psCte: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    (l_partkey * 37 + l_suppkey * 61) % 9999 + 1 AS ps_availqty,
      |    (l_partkey * 73 + l_suppkey * 151) % 99901 + 100 AS ps_supplycost_cents
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))""".stripMargin

  /** l_extendedprice * (1 - l_discount) in exact 1e-4-dollar units. */
  private def rev4: Column =
    (round(col("l_extendedprice") * 100, 0).cast(DecimalType(20, 0))
      * round(lit(100) - col("l_discount") * 100, 0).cast(DecimalType(20, 0)))
      .cast(DecimalType(38, 0))

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q2 (minimum-cost supplier), ADAPTED filters only (p_type
    // equality for the like-'%BRASS' suffix; no mfgr/address/phone
    // columns in the reduced schemas). The correlated-min subquery is
    // the operator under test and is intact, realized as a PER-PART
    // WINDOW MIN: the part slice prunes partsupp FIRST (min-per-part
    // commutes with selecting which parts survive), then one
    // partition-only window (no sort — min needs no ordering) tags
    // every row with its part's min and the filter keeps the
    // minimum-cost rows. One shuffle on ps_partkey total, vs the
    // agg + join-back decorrelation's two — and the pruned side never
    // re-derives partsupp. region→nation is broadcast (structurally
    // bounded); supplier/part are corpus-proportional and carry no
    // hint (SURVEY §7.5). Cost compare happens in exact integer
    // cents, so "= min" cannot flap.
    "q_tpch_q2" -> ((s, d) => {
      val eurNations = Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "EUROPE")
            .select("r_regionkey"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val eurSupp = Tables.supplier(s, d)
        .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val p = Tables.part(s, d)
        .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
        .select("p_partkey", "p_type")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ps_partkey")
      partsupp(s, d)
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(eurSupp, col("ps_suppkey") === col("s_suppkey"))
        .withColumn("mc", min("ps_supplycost_cents").over(w))
        .filter(col("ps_supplycost_cents") === col("mc"))
        .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"), col("p_type"),
          col("ps_suppkey"), col("ps_supplycost_cents"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"), col("ps_suppkey"))
        .limit(100)
    }),

    // TPC-H Q9 (product-type profit), ADAPTED filter: p_name LIKE
    // '%red%' (the corpus p_name is "color noun", mirroring dbgen's
    // color-in-name predicate). Shape intact: the part slice prunes
    // lineitem first, the (partkey, suppkey) composite-key join picks
    // up supplycost, orders contributes the year, nation the group.
    // profit = revenue − supplycost·qty in exact 1e-4 units
    // (quantity is integral in this corpus, so cost·qty is exact).
    "q_tpch_q9" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select("p_partkey")
      val cost4 = col("ps_supplycost_cents") * 100 *
        col("l_quantity").cast("long")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), rev4.as("r4"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(partsupp(s, d),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("r4") - cost4).cast(DecimalType(38, 0)).as("p4"))
        .select(col("nation"), col("o_year"),
          col("p4").cast("string").as("profit_e4"),
          round(col("p4").cast("double") / 1e4, 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 (important stock identification), ADAPTED scope: the
    // supplier slice is region EUROPE (the single-nation original
    // leaves too few pairs at test SF) and the threshold is
    // SCALE-INVARIANT — 2× the average per-part value rather than the
    // original's fixed fraction of the total (whose pass-set shrinks
    // to zero as |parts| grows with SF; TPC-H itself scales the
    // fraction by 1/SF for the same reason). Compared in exact
    // integer cross-multiplied form: value·n_parts > 2·total — no
    // float boundary. Shape intact: per-part Σ(supplycost·availqty) over the
    // slice, HAVING against fraction·total where the total is the
    // same aggregate re-scoped globally. The per-part table is
    // materialized ONCE (localCheckpoint — it is post-aggregation,
    // |parts| rows, not corpus-sized) and the global total derives
    // from IT as a 1-row broadcast bound table, so the corpus-sized
    // slice is scanned exactly once. All value math in exact integer
    // cents·qty units; only the displayed value is scaled.
    "q_tpch_q11" -> ((s, d) => {
      val eurSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(Tables.region(s, d).filter(col("r_name") === "EUROPE")
                .select("r_regionkey"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val byPart = partsupp(s, d)
        .join(eurSupp, col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
        .groupBy("ps_partkey")
        .agg(sum("v").as("value_cq"))
        .localCheckpoint(true)
      val total = byPart.agg(sum("value_cq").as("tot"),
        count(lit(1)).as("nparts"))
      byPart
        .crossJoin(broadcast(total))
        .filter(col("value_cq") * col("nparts") > lit(2) * col("tot"))
        .select(col("ps_partkey"), col("value_cq"),
          round(col("value_cq") / 100.0, 2).as("value_dollars"))
        .orderBy(col("value_cq").desc, col("ps_partkey"))
    }),

    // TPC-H Q16 (part/supplier relationship), ADAPTED exclusions:
    // negative account balance stands in for the complaints comment
    // scan (no s_comment column). Shape intact: anti-join the
    // excluded suppliers, join the part slice, COUNT(DISTINCT
    // suppkey) per (brand, type, size) — the distinct-agg shuffles on
    // the group key then dedups supplier within group, the exact
    // two-phase plan the original exercises.
    "q_tpch_q16" -> ((s, d) => {
      val badSupp = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      partsupp(s, d)
        .join(badSupp, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 (potential part promotion), ADAPTED filters (p_name
    // color predicate, NATION_3 suppliers). The nested correlated
    // structure is intact and decorrelated the standard way: the
    // per-(part, supplier) 1997 shipped-quantity aggregate joins back
    // to the partsupp slice on the composite key; availqty > ½·qty
    // filters; a SEMI join lifts the surviving suppliers. Quantity is
    // integral, so the ½·qty compare runs in doubled-integer space
    // (availqty·2 > qty) — no float boundary.
    "q_tpch_q20" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").like("%blue%"))
        .select("p_partkey")
      val shipped = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("l_partkey").as("qk"), col("l_suppkey").as("qs"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val okSupp = partsupp(s, d)
        .join(p, col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(shipped,
          col("ps_partkey") === col("qk") && col("ps_suppkey") === col("qs"))
        .filter(col("ps_availqty") * 2 > col("qty"))
        .select(col("ps_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(okSupp, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_tpch_q2" ->
      s"""WITH $psCte,
        |eur AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |pse AS (
        |  SELECT ps.*, eur.s_name, eur.s_acctbal, eur.n_name
        |  FROM ps JOIN eur ON ps_suppkey = s_suppkey),
        |mc AS (SELECT ps_partkey AS mk, MIN(ps_supplycost_cents) AS mc
        |       FROM pse GROUP BY 1)
        |SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
        |  p_partkey, p_type, ps_suppkey, ps_supplycost_cents
        |FROM pse
        |JOIN (SELECT p_partkey, p_type FROM part
        |      WHERE p_size <= 15 AND p_type = 'STANDARD') p
        |  ON ps_partkey = p_partkey
        |JOIN mc ON ps_partkey = mk AND ps_supplycost_cents = mc
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q9" ->
      s"""WITH $psCte
        |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |                  * CAST(ROUND(100 - l_discount * 100) AS BIGINT)
        |                - ps_supplycost_cents * 100 * CAST(l_quantity AS BIGINT))
        |       AS BIGINT) AS VARCHAR) AS profit_e4,
        |  ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |            * CAST(ROUND(100 - l_discount * 100) AS BIGINT)
        |          - ps_supplycost_cents * 100 * CAST(l_quantity AS BIGINT))
        |        / 1e4, 2) AS sum_profit
        |FROM lineitem
        |JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') p
        |  ON l_partkey = p_partkey
        |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q11" ->
      s"""WITH $psCte,
        |slice AS (
        |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
        |  FROM ps
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
        |SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cq,
        |  ROUND(SUM(v) / 100.0, 2) AS value_dollars
        |FROM slice
        |GROUP BY ps_partkey
        |HAVING CAST(SUM(v) AS BIGINT)
        |       * (SELECT COUNT(DISTINCT ps_partkey) FROM slice)
        |     > 2 * (SELECT CAST(SUM(v) AS BIGINT) FROM slice)
        |ORDER BY value_cq DESC, ps_partkey""".stripMargin,

    "q_tpch_q16" ->
      s"""WITH $psCte
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM ps
        |JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND ps_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q20" ->
      s"""WITH $psCte,
        |shipped AS (
        |  SELECT l_partkey AS qk, l_suppkey AS qs,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |WHERE s_suppkey IN (
        |  SELECT ps_suppkey FROM ps
        |  JOIN shipped ON ps_partkey = qk AND ps_suppkey = qs
        |  WHERE ps_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
        |    AND ps_availqty * 2 > qty)
        |ORDER BY s_suppkey""".stripMargin
  )
}
