package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Round-9 wave 35 (SURVEY.md §2 B.10b): graph centralities on the
  * supplier handoff digraph (the wave-27 fixture — HITS
  * hub/authority hops, sampled-seed harmonic closeness, per-edge
  * neighbor Jaccard) and three training-prep audits on documents —
  * inverse-frequency + effective-number class weights, the padding
  * waste saved by 32-token length bucketing, and truncation loss at
  * the 128-token cap.
  *
  * Graph keys are |E|-row joins (the katz posture — hop vectors,
  * never path enumeration; the wedge join orients through the
  * shared-neighbor column and is degree-bounded). Token audits are
  * per-doc rollups with exact integer token counts; the one pow()
  * (effective numbers) rides a 6dp round on both engines.
  */
object StatsR9zh {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // HITS, 2 unnormalized exact hops (stated): a1 = indegree,
    // h1(u) = Σ_out a1, a2(v) = Σ_in h1; top 20 by (a2, suppkey).
    "q_hits" -> ((s, d) => {
      val e = StatsR9za.handoff(s, d) // session memo — already materialized
      val a1 = e.groupBy(col("dst").as("n")).agg(count(lit(1)).as("a1"))
      val h1 = e.join(a1, col("dst") === col("n"))
        .groupBy(col("src").as("u")).agg(sum("a1").as("h1"))
      val a2 = e.join(h1, col("src") === col("u"))
        .groupBy(col("dst").as("v")).agg(sum("h1").as("a2"))
      a2.join(h1, col("v") === col("u"), "left")
        .select(col("v").as("suppkey"), col("a2").as("authority2"),
          coalesce(col("h1"), lit(0L)).as("hub1"))
        .orderBy(col("authority2").desc, col("suppkey").asc)
        .limit(20)
    }),

    // Harmonic closeness within 3 hops from the 5 smallest source
    // nodes (stated seeds): per-seed BFS layers via three |E| joins,
    // harmonic×6 = 6c1 + 3c2 + 2c3 exact.
    "q_closeness_sampled" -> ((s, d) => {
      val e = StatsR9za.handoff(s, d) // session memo — already materialized
      val seeds = e.select(col("src").as("seed")).distinct()
        .orderBy("seed").limit(5).localCheckpoint(eager = true)
      val d1 = seeds.join(e, col("seed") === col("src"))
        .select(col("seed"), col("dst").as("n")).distinct()
        .filter(col("n") =!= col("seed"))
        .localCheckpoint(eager = true)
      val d2 = d1.join(e, col("n") === col("src"))
        .select(col("seed"), col("dst").as("n2")).distinct()
        .filter(col("n2") =!= col("seed"))
        .join(d1.select(col("seed"), col("n").as("n2")),
          Seq("seed", "n2"), "left_anti")
        .localCheckpoint(eager = true)
      val d3 = d2.join(e, col("n2") === col("src"))
        .select(col("seed"), col("dst").as("n3")).distinct()
        .filter(col("n3") =!= col("seed"))
        .join(d1.select(col("seed"), col("n").as("n3")),
          Seq("seed", "n3"), "left_anti")
        .join(d2.select(col("seed"), col("n2").as("n3")),
          Seq("seed", "n3"), "left_anti")
      val c1 = d1.groupBy("seed").agg(count(lit(1)).as("c1"))
      val c2 = d2.groupBy("seed").agg(count(lit(1)).as("c2"))
      val c3 = d3.groupBy("seed").agg(count(lit(1)).as("c3"))
      seeds.join(c1, Seq("seed"), "left")
        .join(c2, Seq("seed"), "left")
        .join(c3, Seq("seed"), "left")
        .select(col("seed"),
          coalesce(col("c1"), lit(0L)).as("n_d1"),
          coalesce(col("c2"), lit(0L)).as("n_d2"),
          coalesce(col("c3"), lit(0L)).as("n_d3"),
          round((lit(6L) * coalesce(col("c1"), lit(0L))
            + lit(3L) * coalesce(col("c2"), lit(0L))
            + lit(2L) * coalesce(col("c3"), lit(0L))) / 6.0, 6)
            .as("harmonic_3"))
        .orderBy("seed")
    }),

    // Per-edge neighbor Jaccard on the symmetrized handoff graph:
    // common via the wedge join through the shared neighbor, union =
    // deg(u)+deg(v)−common; top 20 by (jaccard, u, v).
    "q_edge_jaccard" -> ((s, d) => {
      val e0 = StatsR9za.handoff(s, d)
      val adj = e0.select(col("src").as("u"), col("dst").as("w"))
        .union(e0.select(col("dst").as("u"), col("src").as("w")))
        .distinct()
        .localCheckpoint(eager = true)
      val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
      val edges = adj.filter(col("u") < col("w"))
        .select(col("u"), col("w").as("v"))
      val common = edges
        .join(adj.select(col("u").as("u"), col("w").as("cw")), Seq("u"))
        .join(adj.select(col("u").as("v"), col("w").as("cw")),
          Seq("v", "cw"))
        .groupBy("u", "v").agg(count(lit(1)).as("common"))
      edges.join(common, Seq("u", "v"), "left")
        .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
        .withColumn("c", coalesce(col("common"), lit(0L)))
        .select(col("u"), col("v"),
          round(col("c").cast("double")
            / (col("du") + col("dv") - col("c")), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("u").asc, col("v").asc)
        .limit(20)
    }),

    // Class weights over event types: inverse-frequency N/(K·n_c) and
    // the effective-number weight (1−β)/(1−β^n) at β=0.999 (stated).
    "q_class_weights" -> ((s, d) => {
      val c = Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n_c"))
      val tot = c.agg(sum("n_c").as("n"), count(lit(1)).as("k"))
      c.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_c"),
          round(col("n").cast("double") / (col("k") * col("n_c")), 6)
            .as("inv_freq_weight"),
          round((lit(1.0) - lit(0.999))
            / (lit(1.0) - pow(lit(0.999), col("n_c").cast("double"))),
            6).as("eff_num_weight"))
        .orderBy("event_type")
    }),

    // Padding waste saved by 32-token length bucketing: bucket cap =
    // ((n+31) DIV 32)·32, waste vs padding every doc to the corpus
    // max (stated baseline).
    "q_pad_waste" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("n"))
        .withColumn("cap", expr("((n + 31) div 32) * 32"))
      t.agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"),
          sum(col("cap") - col("n")).as("waste_bucketed"),
          max("n").as("maxlen"))
        .select(col("n_docs"), col("total_tokens"),
          col("waste_bucketed"),
          (col("n_docs") * col("maxlen") - col("total_tokens"))
            .as("waste_unbucketed"),
          round(lit(1.0) - col("waste_bucketed").cast("double")
            / (col("n_docs") * col("maxlen") - col("total_tokens")), 6)
            .as("savings_ratio"))
    }),

    // Truncation loss at the 128-token cap, per language: tokens
    // beyond the cap, the lost fraction, and docs affected.
    "q_truncation_loss" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"),
          sum(greatest(col("n") - 128, lit(0L))).as("lost_tokens"),
          sum(when(col("n") > 128, 1L).otherwise(0L))
            .as("n_truncated"))
        .select(col("lang"), col("n_docs"), col("total_tokens"),
          col("lost_tokens"), col("n_truncated"),
          round(col("lost_tokens").cast("double") / col("total_tokens"),
            6).as("loss_frac"))
        .orderBy("lang")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical two exact hops
    "q_hits" -> (s"WITH ${StatsR9za.edgeCte}," +
      """
        |a1 AS (SELECT dst AS n, CAST(COUNT(*) AS BIGINT) AS a1
        |       FROM e GROUP BY 1),
        |h1 AS (
        |  SELECT e.src AS u, CAST(SUM(a1.a1) AS BIGINT) AS h1
        |  FROM e JOIN a1 ON e.dst = a1.n GROUP BY 1),
        |a2 AS (
        |  SELECT e.dst AS v, CAST(SUM(h1.h1) AS BIGINT) AS a2
        |  FROM e JOIN h1 ON e.src = h1.u GROUP BY 1)
        |SELECT a2.v AS suppkey, a2.a2 AS authority2,
        |  COALESCE(h1.h1, 0) AS hub1
        |FROM a2 LEFT JOIN h1 ON a2.v = h1.u
        |ORDER BY authority2 DESC, suppkey ASC LIMIT 20""".stripMargin),

    // identical unrolled BFS layers
    "q_closeness_sampled" -> (s"WITH ${StatsR9za.edgeCte}," +
      """
        |seeds AS (
        |  SELECT DISTINCT src AS seed FROM e ORDER BY 1 LIMIT 5),
        |d1 AS (
        |  SELECT DISTINCT s.seed, e.dst AS n
        |  FROM seeds s JOIN e ON e.src = s.seed
        |  WHERE e.dst <> s.seed),
        |d2 AS (
        |  SELECT DISTINCT d1.seed, e.dst AS n2
        |  FROM d1 JOIN e ON e.src = d1.n
        |  WHERE e.dst <> d1.seed
        |    AND NOT EXISTS (SELECT 1 FROM d1 x
        |      WHERE x.seed = d1.seed AND x.n = e.dst)),
        |d3 AS (
        |  SELECT DISTINCT d2.seed, e.dst AS n3
        |  FROM d2 JOIN e ON e.src = d2.n2
        |  WHERE e.dst <> d2.seed
        |    AND NOT EXISTS (SELECT 1 FROM d1 x
        |      WHERE x.seed = d2.seed AND x.n = e.dst)
        |    AND NOT EXISTS (SELECT 1 FROM d2 y
        |      WHERE y.seed = d2.seed AND y.n2 = e.dst)),
        |c1 AS (SELECT seed, CAST(COUNT(*) AS BIGINT) AS c1
        |       FROM d1 GROUP BY 1),
        |c2 AS (SELECT seed, CAST(COUNT(*) AS BIGINT) AS c2
        |       FROM d2 GROUP BY 1),
        |c3 AS (SELECT seed, CAST(COUNT(*) AS BIGINT) AS c3
        |       FROM d3 GROUP BY 1)
        |SELECT s.seed, COALESCE(c1.c1, 0) AS n_d1,
        |  COALESCE(c2.c2, 0) AS n_d2, COALESCE(c3.c3, 0) AS n_d3,
        |  ROUND((6 * COALESCE(c1.c1, 0) + 3 * COALESCE(c2.c2, 0)
        |    + 2 * COALESCE(c3.c3, 0)) / 6.0, 6) AS harmonic_3
        |FROM seeds s
        |LEFT JOIN c1 ON s.seed = c1.seed
        |LEFT JOIN c2 ON s.seed = c2.seed
        |LEFT JOIN c3 ON s.seed = c3.seed
        |ORDER BY s.seed""".stripMargin),

    // identical wedge-join common counts
    "q_edge_jaccard" -> (s"WITH ${StatsR9za.edgeCte}," +
      """
        |adj AS (
        |  SELECT DISTINCT u, w FROM (
        |    SELECT src AS u, dst AS w FROM e
        |    UNION ALL SELECT dst AS u, src AS w FROM e)),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM adj GROUP BY 1),
        |ed AS (SELECT u, w AS v FROM adj WHERE u < w),
        |cm AS (
        |  SELECT ed.u, ed.v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM ed
        |  JOIN adj a ON a.u = ed.u
        |  JOIN adj b ON b.u = ed.v AND b.w = a.w
        |  GROUP BY 1, 2)
        |SELECT ed.u, ed.v,
        |  ROUND(CAST(COALESCE(cm.c, 0) AS DOUBLE)
        |    / (du.deg + dv.deg - COALESCE(cm.c, 0)), 6) AS jaccard
        |FROM ed
        |LEFT JOIN cm ON ed.u = cm.u AND ed.v = cm.v
        |JOIN deg du ON ed.u = du.u
        |JOIN deg dv ON ed.v = dv.u
        |ORDER BY jaccard DESC, ed.u ASC, ed.v ASC
        |LIMIT 20""".stripMargin),

    // identical inverse-frequency and effective-number chains
    "q_class_weights" ->
      """WITH c AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(n_c) AS n, CAST(COUNT(*) AS BIGINT) AS k
        |        FROM c)
        |SELECT event_type, n_c,
        |  ROUND(CAST(n AS DOUBLE) / (k * n_c), 6) AS inv_freq_weight,
        |  ROUND((1.0 - 0.999)
        |    / (1.0 - POW(0.999, CAST(n_c AS DOUBLE))), 6)
        |    AS eff_num_weight
        |FROM c, tot ORDER BY event_type""".stripMargin,

    // identical integer bucket caps
    "q_pad_waste" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    ((CAST(len(string_split(text, ' ')) AS BIGINT) + 31) // 32)
        |      * 32 AS cap
        |  FROM documents),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n) AS BIGINT) AS total_tokens,
        |    CAST(SUM(cap - n) AS BIGINT) AS waste_bucketed,
        |    MAX(n) AS maxlen
        |  FROM t)
        |SELECT n_docs, total_tokens, waste_bucketed,
        |  CAST(n_docs * maxlen - total_tokens AS BIGINT)
        |    AS waste_unbucketed,
        |  ROUND(1.0 - CAST(waste_bucketed AS DOUBLE)
        |    / (n_docs * maxlen - total_tokens), 6) AS savings_ratio
        |FROM ag""".stripMargin,

    // identical per-lang truncation accounting
    "q_truncation_loss" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS total_tokens,
        |  CAST(SUM(GREATEST(n - 128, 0)) AS BIGINT) AS lost_tokens,
        |  CAST(SUM(CASE WHEN n > 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_truncated,
        |  ROUND(CAST(SUM(GREATEST(n - 128, 0)) AS DOUBLE) / SUM(n), 6)
        |    AS loss_frac
        |FROM t GROUP BY 1 ORDER BY lang""".stripMargin
  )
}
