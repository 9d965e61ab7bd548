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
         |FROM env GROUP BY 1, 2 ORDER BY layer, vec_id""".stripMargin
  )
}
