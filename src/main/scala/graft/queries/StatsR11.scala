package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-11 wave 1 (SURVEY.md §2 B.10): graph-based approximate
  * nearest neighbor — the NSW/HNSW-class search mode the r10 VERDICT
  * named as the remaining ANN gap beyond IVF (q_sim_ivf) and RP-LSH
  * (q_ann_rplsh). Two stages, both deterministic end to end:
  *
  *  1. GRAPH BUILD: a cell-local top-M=8 cosine neighbor graph over
  *     the corpus (query vec 0 held out) — the IVF-graph hybrid:
  *     vectors assign to packed broadcast seeds by projection-only
  *     argmax (the q_semdedup shape, 6dp grid, min-cid tiebreak) and
  *     neighbor edges stay within the assigned cell, so pair work is
  *     Σ|cell|² = n²/k and becomes LINEAR when production swaps the
  *     4 fixture seeds for k ∝ corpus/cell-budget IVF centroids. The
  *     oracle replicates the assignment exactly, so the graph is
  *     hash-checked, and the recall column is the honest meter for
  *     what cell-locality costs the search. The graph is the
  *     write-once artifact a deployment materializes next to the
  *     embeddings (NN-descent refinement is the documented upgrade
  *     path when cells alone under-recall).
  *
  *  2. BEAM SEARCH: greedy best-first from the deterministic entry
  *     point (vec_id 1), beam B=4, 3 unrolled hops: each hop expands
  *     the frontier's out-edges, drops visited vertices, and keeps
  *     the top-B by (cos-to-query DESC, vec_id) on the 6dp grid.
  *     Every frontier/visited table is ≤ 1+B·hops rows, so the whole
  *     walk is bounded broadcast joins — no driver loop, no
  *     collect(). Output: the top-5 of the visited set with each
  *     row's membership in the EXACT top-5 (the per-rank recall a
  *     retrieval eval reads; exact side is one broadcast 1×n pass).
  */
object StatsR11 {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    "q_ann_nsw" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val M = 8
      val B = 4
      val hops = 3
      val cellsK = 4
      val e = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      // ---- stage 1: cell-local top-M graph (IVF-graph hybrid) ----
      // assignment = the q_semdedup shape: packed broadcast seeds,
      // projection-only argmax on the 6dp grid, min-cid tiebreak;
      // neighbor edges stay WITHIN the assigned cell, so build pair
      // work is Σ|cell|² = n²/k — with k ∝ corpus/cell-budget seeds
      // (production) the build is linear in the corpus, and the
      // recall column below is the honest quality meter for what
      // cell-locality costs the search
      val packed = e.filter(col("vec_id").between(1, cellsK))
        .select(col("vec_id").cast("int").as("cell"),
          col("embedding").as("c_emb"))
        .agg(array_sort(collect_list(struct(col("cell"), col("c_emb"))))
          .as("cents"))
      val cand = (1 to cellsK).map { i =>
        struct(
          round(expr(s"cosine_sim(embedding, try_element_at(cents, $i).c_emb)"), 6)
            .as("cs"),
          lit(-i).as("negcell"))
      }
      val assigned = e.crossJoin(broadcast(packed))
        .withColumn("best", greatest(cand: _*))
        .select(col("vec_id"), col("embedding"),
          (-col("best.negcell")).as("cell"))
        .localCheckpoint(true) // both sides of the cell-local join
      val members = assigned.select(col("cell").as("cb"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      val wTop = Window.partitionBy("a_id")
        .orderBy(col("cos").desc, col("b_id"))
      val graph = assigned
        .select(col("cell"), col("vec_id").as("a_id"),
          col("embedding").as("a_emb"))
        .join(members,
          col("cell") === col("cb") && col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(expr("cosine_sim(a_emb, b_emb)"), 6).as("cos"))
        .withColumn("rnk", row_number().over(wTop))
        .filter(col("rnk") <= M)
        .select("a_id", "b_id")
        .localCheckpoint(true) // scanned once per hop
      // ---- stage 2: beam search, unrolled bounded broadcasts ----
      val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val scores = e.crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(expr("cosine_sim(embedding, q_emb)"), 6).as("cq"))
        .localCheckpoint(true) // one leg per hop + exact top-5
      var visited = scores.filter(col("vec_id") === 1)
        .localCheckpoint(true)
      var frontier = visited
      for (_ <- 1 to hops) {
        val cand = graph
          .join(broadcast(frontier.select(col("vec_id").as("a_id"))), "a_id")
          .select(col("b_id").as("vec_id")).distinct()
        val next = cand.join(scores, "vec_id")
          .join(broadcast(visited.select(col("vec_id").as("vv"))),
            col("vec_id") === col("vv"), "left_anti")
          .orderBy(col("cq").desc, col("vec_id")).limit(B)
          .localCheckpoint(true) // ≤ B rows, feeds visited + next hop
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
      }
      val exact = scores.orderBy(col("cq").desc, col("vec_id")).limit(5)
        .select(col("vec_id").as("ev"), lit(1L).as("hit"))
      visited.orderBy(col("cq").desc, col("vec_id")).limit(5)
        // bounded grain: ranks the 5-row limit output
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cq").desc, col("vec_id"))).cast("long"))
        .join(broadcast(exact), col("vec_id") === col("ev"), "left")
        .select(col("rnk"), col("vec_id"), col("cq").as("cos_q"),
          coalesce(col("hit"), lit(0L)).as("in_exact_top5"))
        .orderBy("rnk")
    })
  )

  val oracle: Map[String, String] = Map(
    // brute-force top-8 graph + the identical unrolled beam walk
    "q_ann_nsw" -> {
      val cosAB = LlmOps.duckCos("a.embedding", "b.embedding")
      val cosEQ = LlmOps.duckCos("e.embedding", "q.q_emb")
      def hop(h: Int): String = {
        val pf = s"f${h - 1}"
        val pv = s"v${h - 1}"
        s"""f$h AS MATERIALIZED (
           |  SELECT sc.vec_id, sc.cq
           |  FROM (SELECT DISTINCT nb.b_id FROM nb
           |        JOIN $pf ON nb.a_id = $pf.vec_id) c
           |  JOIN sc ON sc.vec_id = c.b_id
           |  WHERE c.b_id NOT IN (SELECT vec_id FROM $pv)
           |  ORDER BY sc.cq DESC, sc.vec_id LIMIT 4),
           |v$h AS MATERIALIZED (
           |  SELECT * FROM $pv UNION ALL SELECT * FROM f$h)""".stripMargin
      }
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id <> 0),
         |q AS (SELECT embedding AS q_emb FROM embeddings
         |  WHERE vec_id = 0),
         |sc AS MATERIALIZED (
         |  SELECT e.vec_id, ROUND($cosEQ, 6) AS cq
         |  FROM e CROSS JOIN q),
         |c0 AS (SELECT vec_id AS cid, embedding AS c FROM e
         |  WHERE vec_id BETWEEN 1 AND 4),
         |s1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cid) AS rn
         |  FROM (SELECT e.vec_id, c0.cid, e.embedding,
         |      ROUND(${LlmOps.duckCos("e.embedding", "c0.c")}, 6) AS cos
         |    FROM e CROSS JOIN c0)),
         |asg AS MATERIALIZED (SELECT vec_id, cid, embedding FROM s1
         |  WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ROUND($cosAB, 6) AS cos
         |  FROM asg a JOIN asg b
         |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
         |nb AS MATERIALIZED (
         |  SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
         |      ORDER BY cos DESC, b_id) AS rnk
         |    FROM pairs) t
         |  WHERE rnk <= 8),
         |f0 AS (SELECT vec_id, cq FROM sc WHERE vec_id = 1),
         |v0 AS (SELECT * FROM f0),
         |${hop(1)},
         |${hop(2)},
         |${hop(3)},
         |res AS (
         |  SELECT vec_id, cq,
         |    CAST(row_number() OVER (ORDER BY cq DESC, vec_id)
         |      AS BIGINT) AS rnk
         |  FROM (SELECT * FROM v3 ORDER BY cq DESC, vec_id LIMIT 5) t),
         |ex AS (SELECT vec_id FROM sc ORDER BY cq DESC, vec_id LIMIT 5)
         |SELECT rnk, res.vec_id, cq AS cos_q,
         |  CAST(CASE WHEN res.vec_id IN (SELECT vec_id FROM ex)
         |    THEN 1 ELSE 0 END AS BIGINT) AS in_exact_top5
         |FROM res ORDER BY rnk""".stripMargin
    }
  )
}
