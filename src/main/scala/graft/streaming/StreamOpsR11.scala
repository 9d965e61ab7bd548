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
      val cellsK = 4
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

  val oracle: Map[String, String] = Map(
    // identical packed-seed assignment, batch-side in DuckDB
    "s_stream_cell_assign" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
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
