package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import StreamOps.{runToParquet, stageTable, tmp}

/** Round-13 streaming wave (SURVEY.md §2 B.9): HNSW UPPER-LAYER
  * maintenance (r12 VERDICT task 5) — s_stream_graph_insert keeps the
  * L0 cell graph fresh, but an arriving vector whose md5 level ≥ 1
  * must ALSO join the layer-1/2 graphs or the hierarchy goes stale
  * with ingest (the staleness gap the r12 verdict named). The
  * arriving vector's level is a STREAM-SIDE stateless projection of
  * the exact batch layer rule (StatsR12.levelCol — md5-geometric, so
  * stream and batch can never disagree on a vector's level), and each
  * upper layer it belongs to is probed by a stateless stream-static
  * equi-join against that layer's MATERIALIZED graph
  * (StatsR12.layerGraph, session-memoized — the same artifacts
  * q_ann_hnsw descends). Stateless APPEND, no watermark/state store,
  * offset-replayable. Read-back = per-(layer, vector) edge envelope,
  * DuckDB-oracled against the batch-twin per-layer graph CTEs.
  */
object StreamOpsR13 {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    "s_stream_hnsw_insert" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val out = tmp("shi_out")
      val dir = stageTable(d, "embeddings", "shi_in")
      // the session-memoized per-layer graphs (k data-derived per
      // layer inside the memo — upper layers get small k)
      val g1 = graft.queries.StatsR12.layerGraph(s, d, 1)
      val g2 = graft.queries.StatsR12.layerGraph(s, d, 2)
      val arriving = s.readStream.schema(embSchema).parquet(dir)
        .filter(col("vec_id") =!= 0) // the held-out query vector
        .select(col("vec_id").as("a_id"),
          graft.queries.StatsR12.levelCol(col("vec_id")).as("lvl"))
      val e1 = arriving.filter(col("lvl") >= 1)
        .join(g1, Seq("a_id")) // stream-static probe, layer 1
        .select(lit(1L).as("layer"), col("a_id"), col("b_id"))
      val e2 = arriving.filter(col("lvl") >= 2)
        .join(g2, Seq("a_id")) // stream-static probe, layer 2
        .select(lit(2L).as("layer"), col("a_id"), col("b_id"))
      runToParquet(e1.unionByName(e2), out, tmp("shi_ckpt"))
      s.read.parquet(out)
        .groupBy("layer", "a_id")
        .agg(count(lit(1)).as("n_nb"), min("b_id").as("min_nb"),
          max("b_id").as("max_nb"), sum("b_id").as("sum_nb"))
        .select(col("layer"), col("a_id").as("vec_id"), col("n_nb"),
          col("min_nb"), col("max_nb"), col("sum_nb"))
        .orderBy("layer", "vec_id")
    }),

    // Streaming ANN DELETION (the r12 VERDICT task 4's streaming
    // face, complementing batch q_ann_tombstone): a tombstone FEED —
    // arriving ids in the md5 delete bucket, the RTBF event stream —
    // emits the edge RETRACTIONS each delete implies: its out-edges
    // and its in-edges, found by two stateless stream-static probes
    // of the MATERIALIZED cell graph (no rebuild, no corpus scan; the
    // retraction log is what a downstream index shard consumes to
    // repair itself). Stateless APPEND, offset-replayable. Read-back
    // = per-deleted-vector retraction envelope (out/in counts + peer
    // id sum), DuckDB-oracled against the batch-twin graph + the
    // identical tombstone rule; R13OpsSpec pins the conservation law
    // live + retractions = full graph across the two tombstone keys.
    "s_stream_graph_delete" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val out = tmp("sgd_out")
      val dir = stageTable(d, "embeddings", "sgd_in")
      val graph = graft.queries.StatsR11.corpusCellGraph(s, d)
      val deletes = s.readStream.schema(embSchema).parquet(dir)
        .select(col("vec_id"))
        .filter((conv(substring(md5(col("vec_id").cast("string")), 1, 4),
          16, 10).cast("int") % 100) < 5)
      val outE = deletes.join(graph, col("vec_id") === col("a_id"))
        .select(col("vec_id"), lit(0L).as("is_in"), col("b_id").as("peer"))
      val inE = deletes.join(graph, col("vec_id") === col("b_id"))
        .select(col("vec_id"), lit(1L).as("is_in"), col("a_id").as("peer"))
      runToParquet(outE.unionByName(inE), out, tmp("sgd_ckpt"))
      s.read.parquet(out)
        .groupBy("vec_id")
        .agg(sum(when(col("is_in") === 0L, 1L).otherwise(0L)).as("n_out"),
          sum(when(col("is_in") === 1L, 1L).otherwise(0L)).as("n_in"),
          sum("peer").as("sum_peer"))
        .orderBy("vec_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // batch-twin per-layer graphs (the exact q_ann_hnsw layer CTEs),
    // rolled up per (layer, vector)
    "s_stream_hnsw_insert" ->
      s"""WITH ${graft.queries.StatsR12.eLvCtes},
         |${graft.queries.StatsR12.layerCtes(2)},
         |${graft.queries.StatsR12.layerCtes(1)},
         |env AS (
         |  SELECT CAST(1 AS BIGINT) AS layer, a_id, b_id FROM nb1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT) AS layer, a_id, b_id FROM nb2)
         |SELECT layer, a_id AS vec_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_nb,
         |  MIN(b_id) AS min_nb, MAX(b_id) AS max_nb,
         |  CAST(SUM(b_id) AS BIGINT) AS sum_nb
         |FROM env GROUP BY 1, 2 ORDER BY layer, vec_id""".stripMargin,

    // batch-twin full-corpus graph + the identical md5 tombstone rule,
    // retractions unioned out+in and rolled up per deleted vector
    "s_stream_graph_delete" -> {
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
         |prs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ROUND($cosAB, 6) AS cos
         |  FROM asg a JOIN asg b
         |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
         |nb AS MATERIALIZED (
         |  SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
         |      ORDER BY cos DESC, b_id) AS rnk
         |    FROM prs) t
         |  WHERE rnk <= 8),
         |dead AS (SELECT vec_id FROM embeddings
         |  WHERE CAST(CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
         |    1, 4) AS INT) % 100 AS INT) < 5),
         |env AS (
         |  SELECT nb.a_id AS vec_id, 0 AS is_in, nb.b_id AS peer FROM nb
         |  WHERE nb.a_id IN (SELECT vec_id FROM dead)
         |  UNION ALL
         |  SELECT nb.b_id, 1, nb.a_id FROM nb
         |  WHERE nb.b_id IN (SELECT vec_id FROM dead))
         |SELECT vec_id,
         |  CAST(SUM(CASE WHEN is_in = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_out,
         |  CAST(SUM(CASE WHEN is_in = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_in,
         |  CAST(SUM(peer) AS BIGINT) AS sum_peer
         |FROM env GROUP BY 1 ORDER BY vec_id""".stripMargin
    }
  )
}
