package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 7 (SURVEY.md §2 B.10b): dataset provenance — the
  * order-canonical Merkle-style fingerprint a training run records
  * per source slice (and for the whole corpus) so a later audit can
  * prove WHICH data went in. Chain = md5 over the doc_id-ordered
  * concatenation of per-doc md5s: any added, dropped, reordered or
  * edited document changes the slice fingerprint.
  */
object StatsR10g {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Per-source + ALL fingerprints with doc/char mass. The sorted
    // collect_list is slice-bounded (per-source doc md5s, 32 bytes a
    // doc — at 100 TB the chain would roll up per shard first, the
    // same two-level shape as the HLL registers; stated).
    "q_dataset_fingerprint" -> ((s, d) => {
      val doc = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          md5(col("text")).as("h"))
        .localCheckpoint(eager = true) // per-source leg + ALL leg
      def chain(g: org.apache.spark.sql.RelationalGroupedDataset) = g
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          expr("md5(array_join(transform(" +
            "array_sort(collect_list(struct(doc_id, h)))," +
            " p -> p.h), ''))").as("fingerprint"))
      chain(doc.groupBy("source"))
        .unionByName(chain(doc.groupBy())
          .select(lit("ALL").as("source"), col("n_docs"),
            col("total_chars"), col("fingerprint")))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical doc_id-ordered md5 chain
    "q_dataset_fingerprint" ->
      """WITH doc AS (
        |  SELECT source, doc_id, n_chars, md5(text) AS h
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  md5(string_agg(h, '' ORDER BY doc_id)) AS fingerprint
        |FROM doc GROUP BY 1
        |UNION ALL
        |SELECT 'ALL', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(n_chars) AS BIGINT),
        |  md5(string_agg(h, '' ORDER BY doc_id))
        |FROM doc
        |ORDER BY source""".stripMargin
  )
}
