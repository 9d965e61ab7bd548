package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import StreamOps.{runToParquet, stageTable, tmp}

import graft.tables.Tables

/** Round-11 streaming wave (SURVEY.md §2 B.9): the streaming face of
  * the r11 graph-ANN family — arriving embeddings assigned to the
  * STATIC cell structure in flight. Ingest-time cell assignment is
  * how a production vector pipeline keeps its IVF/NSW index fresh:
  * the cell id decides which index shard an arriving vector lands in,
  * so the assignment must be a stateless stream-side projection, not
  * a batch job. Here the packed seed row (the q_semdedup /
  * q_ann_nsw assignment contract: 6dp grid argmax, min-cid tiebreak)
  * is a 1-row broadcast static side of a stream-static equi-join, and
  * the whole query is stateless APPEND — no watermark, no state
  * store, replayable from any offset. Read-back = per-cell envelope
  * (count, exact µ-grid half-up mean own-cosine, id span), fully
  * DuckDB-oracled.
  */
object StreamOpsR11 {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    "s_stream_cell_assign" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      // data-derived cell count (operators/Cells, r11 VERDICT task 2):
      // one-row count of the STATIC corpus — bounded by design, read
      // once at query start exactly like a production index's nlist
      val cellsK = graft.operators.Cells.k(Tables.embeddings(s, d).count())
      val out = tmp("sca_out")
      val dir = stageTable(d, "embeddings", "sca_in")
      val packed = Tables.embeddings(s, d)
        .filter(col("vec_id").between(1, cellsK))
        .select(col("vec_id").cast("int").as("cell"),
          col("embedding").as("c_emb"))
        .agg(array_sort(collect_list(struct(col("cell"), col("c_emb"))))
          .as("cents"))
        .withColumn("k", lit(1))
      val cand = (1 to cellsK).map { i =>
        struct(
          round(expr(s"cosine_sim(embedding, try_element_at(cents, $i).c_emb)"), 6)
            .as("cs"),
          lit(-i).as("negcell"))
      }
      val assigned = s.readStream.schema(embSchema).parquet(dir)
        .withColumn("k", lit(1))
        .join(broadcast(packed), "k") // stream-static, 1-row static side
        .withColumn("best", greatest(cand: _*))
        .select(col("vec_id"), (-col("best.negcell")).as("cell"),
          expr("CAST(ROUND(best.cs * 1e6) AS BIGINT)").as("cs_u"))
      runToParquet(assigned, out, tmp("sca_ckpt"))
      s.read.parquet(out)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), sum("cs_u").as("su"),
          min("vec_id").as("min_vec"), max("vec_id").as("max_vec"))
        .select(col("cell").cast("long").as("cell"), col("n_vecs"),
          // µ-grid half-up mean (the q_ann_nndescent tie rule)
          round(expr("(2 * su + n_vecs) div (2 * n_vecs)") / 1e6, 6)
            .as("mean_own_cos"),
          col("min_vec"), col("max_vec"))
        .orderBy("cell")
    })
  )

  val queriesB: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Streaming semantic-dedup gate — the ingest-time decision a
    // training pipeline actually runs: does this arriving embedding
    // near-duplicate anything already in the corpus? Each arriving
    // vector assigns to its cell (the stateless projection above)
    // and joins ONLY that cell's static members (stream-static
    // equi-join on the cell id — the IVF-list probe, never a corpus
    // cross join); flag = max cosine ≥ τ. Self-matches excluded
    // (the staged stream IS the corpus, so the honest fixture reads
    // "would this doc be flagged against everyone else"). Stateless
    // APPEND, offset-replayable. Read-back: per-cell arrival count,
    // flagged count, µ-grid half-up mean of the max-cos.
    "s_stream_neardup_gate" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val tau = 0.45 // the q_semdedup boundary (p99 of prior-cos)
      val out = tmp("sng_out")
      val dir = stageTable(d, "embeddings", "sng_in")
      val stat = Tables.embeddings(s, d)
      // data-derived cell count from the static corpus (one-row
      // count, bounded by design — operators/Cells)
      val cellsK = graft.operators.Cells.k(stat.count())
      val packed = stat
        .filter(col("vec_id").between(1, cellsK))
        .select(col("vec_id").cast("int").as("cell"),
          col("embedding").as("c_emb"))
        .agg(array_sort(collect_list(struct(col("cell"), col("c_emb"))))
          .as("cents"))
        .withColumn("k", lit(1))
      def cand(in: DataFrame): DataFrame = {
        val cs = (1 to cellsK).map { i =>
          struct(
            round(expr(s"cosine_sim(embedding, try_element_at(cents, $i).c_emb)"), 6)
              .as("cs"),
            lit(-i).as("negcell"))
        }
        in.withColumn("k", lit(1))
          .join(broadcast(packed), "k")
          .withColumn("best", greatest(cs: _*))
          .select(col("vec_id"), col("embedding"),
            (-col("best.negcell")).as("cell"))
      }
      // static members with their cells, batch-side once
      val members = cand(stat).select(col("cell").as("cb"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb"))
        .localCheckpoint(true)
      val arriving = cand(s.readStream.schema(embSchema).parquet(dir)
        .select(col("vec_id"), col("embedding")))
      // per-vector running max via flatMapGroupsWithState (the
      // s_stream_slo posture): state = ONE long per (vec, cell) —
      // max-merge commutes, so the state is ORDER-INDEPENDENT and the
      // sink carries one row per vector per batch, never the n²/k
      // candidate stream (the first draft sank the raw join and paid
      // 100M parquet rows at sf1)
      import s.implicits._
      val gated0 = arriving.join(members,
          col("cell") === col("cb") && col("vec_id") =!= col("b_id"))
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          expr("CAST(ROUND(ROUND(cosine_sim(embedding, b_emb), 6) * 1e6) AS BIGINT)")
            .as("c_u"))
        .as[(Long, Int, Long)]
      val gated = StreamOps.withBoundedStatePartitions(s) {
        gated0.groupByKey(r => (r._1, r._2))
          .flatMapGroupsWithState[Long, (Long, Int, Long)](
            org.apache.spark.sql.streaming.OutputMode.Append,
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
            case ((vid, cell), rows,
                state: org.apache.spark.sql.streaming.GroupState[Long]) =>
              var mx = state.getOption.getOrElse(Long.MinValue)
              rows.foreach(r => if (r._3 > mx) mx = r._3)
              state.update(mx)
              Iterator((vid, cell, mx))
          }.toDF("vec_id", "cell", "mx_u")
      }
      runToParquet(gated, out, tmp("sng_ckpt"))
      s.read.parquet(out)
        .groupBy("vec_id", "cell")
        .agg(max("mx_u").as("mx_u"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_arrived"),
          sum(when(col("mx_u") >= (tau * 1e6).toLong, 1L).otherwise(0L))
            .as("n_flagged"),
          sum("mx_u").as("su"))
        .select(col("cell").cast("long").as("cell"), col("n_arrived"),
          col("n_flagged"),
          round(expr("(2 * su + n_arrived) div (2 * n_arrived)") / 1e6, 6)
            .as("mean_max_cos"))
        .orderBy("cell")
    }),

    // Streaming index maintenance (r11 VERDICT task 8): an arriving
    // vector acquires its top-8 NSW edges by a stateless stream-static
    // equi-join against the MATERIALIZED cell graph (the write-once
    // artifact q_ann_nsw builds) — the shard-freshness path a vector
    // pipeline runs so new arrivals are searchable without rebuilding
    // the index. Stateless APPEND, no watermark/state store,
    // offset-replayable; the static side is the checkpointed graph, so
    // each micro-batch pays one hash join probe per arrival. Read-back
    // = per-vector edge envelope (count + id span + exact id sum),
    // DuckDB-oracled against the batch-twin graph.
    "s_stream_graph_insert" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val out = tmp("sgi_out")
      val dir = stageTable(d, "embeddings", "sgi_in")
      // the session-memoized corpus graph (k data-derived inside)
      val graph = graft.queries.StatsR11.corpusCellGraph(s, d)
      val arriving = s.readStream.schema(embSchema).parquet(dir)
        .select(col("vec_id").as("a_id"))
      val edges = arriving.join(graph, Seq("a_id")) // stream-static probe
      runToParquet(edges, out, tmp("sgi_ckpt"))
      s.read.parquet(out)
        .groupBy("a_id")
        .agg(count(lit(1)).as("n_nb"), min("b_id").as("min_nb"),
          max("b_id").as("max_nb"), sum("b_id").as("sum_nb"))
        .select(col("a_id").as("vec_id"), col("n_nb"), col("min_nb"),
          col("max_nb"), col("sum_nb"))
        .orderBy("vec_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // batch-twin cell graph (the q_ann_nsw_multi graph CTEs over the
    // full corpus, k data-derived), rolled up per vector
    "s_stream_graph_insert" -> {
      val cosAB = graft.queries.LlmOps.duckCos("a.embedding", "b.embedding")
      val cosEC = graft.queries.LlmOps.duckCos("e.embedding", "c0.c")
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND ${graft.operators.Cells.kSql("embeddings")}),
         |s1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cid) AS rn
         |  FROM (SELECT e.vec_id, c0.cid, e.embedding,
         |      ROUND($cosEC, 6) AS cos
         |    FROM embeddings e CROSS JOIN c0)),
         |asg AS MATERIALIZED (SELECT vec_id, cid, embedding FROM s1
         |  WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ROUND($cosAB, 6) AS cos
         |  FROM asg a JOIN asg b
         |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
         |nb AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
         |      ORDER BY cos DESC, b_id) AS rnk
         |    FROM pairs) t
         |  WHERE rnk <= 8)
         |SELECT a_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_nb,
         |  MIN(b_id) AS min_nb, MAX(b_id) AS max_nb,
         |  CAST(SUM(b_id) AS BIGINT) AS sum_nb
         |FROM nb GROUP BY 1 ORDER BY vec_id""".stripMargin
    },

    // identical assignment + within-cell max-cos gate, batch-side
    "s_stream_neardup_gate" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c
         |  FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND ${graft.operators.Cells.kSql("embeddings")}),
         |s1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cid) AS rn
         |  FROM (SELECT e.vec_id, c0.cid, e.embedding,
         |      ROUND(${graft.queries.LlmOps.duckCos("e.embedding", "c0.c")}, 6)
         |        AS cos
         |    FROM embeddings e CROSS JOIN c0)),
         |a AS MATERIALIZED (SELECT vec_id, cid, embedding FROM s1
         |  WHERE rn = 1),
         |mx AS (
         |  SELECT x.vec_id, x.cid,
         |    MAX(CAST(ROUND(ROUND(${graft.queries.LlmOps.duckCos("x.embedding", "y.embedding")}, 6)
         |      * 1e6) AS BIGINT)) AS mx_u
         |  FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id <> y.vec_id
         |  GROUP BY 1, 2),
         |g AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_arrived,
         |    CAST(SUM(CASE WHEN mx_u >= 450000 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_flagged,
         |    SUM(mx_u) AS su
         |  FROM mx GROUP BY 1)
         |SELECT CAST(cid AS BIGINT) AS cell, n_arrived, n_flagged,
         |  ROUND(((2 * su + n_arrived) // (2 * n_arrived)) / 1e6, 6)
         |    AS mean_max_cos
         |FROM g ORDER BY cell""".stripMargin,

    // identical packed-seed assignment, batch-side in DuckDB
    "s_stream_cell_assign" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c
         |  FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND ${graft.operators.Cells.kSql("embeddings")}),
         |s1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cid) AS rn
         |  FROM (SELECT e.vec_id, c0.cid,
         |      ROUND(${graft.queries.LlmOps.duckCos("e.embedding", "c0.c")}, 6)
         |        AS cos
         |    FROM embeddings e CROSS JOIN c0)),
         |a AS (SELECT vec_id, cid,
         |    CAST(ROUND(cos * 1e6) AS BIGINT) AS cs_u
         |  FROM s1 WHERE rn = 1),
         |g AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    SUM(cs_u) AS su,
         |    MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
         |  FROM a GROUP BY 1)
         |SELECT CAST(cid AS BIGINT) AS cell, n_vecs,
         |  ROUND(((2 * su + n_vecs) // (2 * n_vecs)) / 1e6, 6)
         |    AS mean_own_cos,
         |  min_vec, max_vec
         |FROM g ORDER BY cell""".stripMargin
  )
}
