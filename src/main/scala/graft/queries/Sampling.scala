package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Deterministic sampling / sharding operators for training-data
  * pipelines (B.10 extension): reproducible across runs, engines and
  * cluster sizes because the selector is a pure hash of the row key —
  * never `rand()`, never partition-dependent.
  *
  * The hash is md5 (identical in Spark and DuckDB) reduced to a
  * 0..9999 bucket via the first 4 hex digits — cheap, uniform, and
  * exactly reproducible in the oracle.
  */
object Sampling {

  /** md5-derived bucket in [0, 10000) for a long key column. */
  private def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % 10000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~10% deterministic sample of documents by key hash.
    "q_sample_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", bucket(col("doc_id")))
        .filter(col("bucket") < 1000)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")),

    // 80/10/10 train/val/test split — every row labeled, stable under
    // reshuffling/re-partitioning/scale-out.
    "q_train_test_split" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", bucket(col("doc_id")))
        .withColumn("split",
          when(col("bucket") < 8000, "train")
            .when(col("bucket") < 9000, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split")),

    // Stratified deterministic sample: 20 docs per language, chosen by
    // hash order (not arrival order) so the stratum sample is stable.
    "q_stratified_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("bucket"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("bucket", bucket(col("doc_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("lang", "doc_id", "bucket", "rn")
        .orderBy("lang", "rn")
    })
  )

  private val bucketSql =
    "CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 10000 AS INT)"

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, $bucketSql AS bucket
         |FROM documents WHERE $bucketSql < 1000 ORDER BY doc_id""".stripMargin,

    "q_train_test_split" ->
      s"""SELECT split, COUNT(*) AS n_docs FROM (
         |  SELECT CASE WHEN $bucketSql < 8000 THEN 'train'
         |              WHEN $bucketSql < 9000 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents)
         |GROUP BY split ORDER BY split""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT lang, doc_id, bucket, rn FROM (
         |  SELECT lang, doc_id, bucket,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS INT) AS rn
         |  FROM (SELECT lang, doc_id, $bucketSql AS bucket FROM documents))
         |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin
  )
}
