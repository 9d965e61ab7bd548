package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Further analytic operators: string aggregation, histogramming, the
  * bucketed range join (equi-join realization of a theta join — the
  * 100TB-scale shape), and a one-pass vector centroid via a typed
  * array Aggregator.
  */
object Analytics {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic string aggregation (sorted before joining, so no
    // engine-specific aggregation-order dependence).
    "q_string_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(array_join(sort_array(collect_set("o_orderstatus")), ",").as("statuses"),
             count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // fixed-width histogram of events.value: identical bucket
    // arithmetic on both engines (floor of a shared double division).
    "q_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .select(floor(col("value") / 10.0).cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // Bucketed range join: |purchase.ts - view.ts| <= 1h for the same
    // user, realized as an equi-join on hour buckets (each left row
    // probes bucket b-1, b, b+1) + exact residual filter. Same result
    // as the pure theta join (the oracle), but the candidate space is
    // bounded per bucket — this is how a time-range join survives
    // 100 TB where a nested-loop theta join cannot.
    "q_join_range_bucket" -> ((s, d) => {
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .withColumn("base", floor(unix_micros(col("ts")) / 3600000000L).cast("long"))
        .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
          col("ts").as("v_ts"),
          explode(array(col("base") - 1, col("base"), col("base") + 1)).as("bkt"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts"),
          floor(unix_micros(col("ts")) / 3600000000L).cast("long").as("bkt_p"))
      v.join(p, col("v_user") === col("p_user") && col("bkt") === col("bkt_p") &&
                abs(unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) <= 3600000000L)
        .select(col("v_id"), col("p_id"))
        .dropDuplicates("v_id", "p_id")
        .orderBy("v_id", "p_id")
    }),

    // one-pass full-width centroid via the typed VectorSum Aggregator
    // (no posexplode row multiplication). The final column is the
    // micro-unit (x1e6, rounded) component vector joined to a string:
    // integers render identically on both engines, and the driver's
    // comparator cannot hash array columns.
    "q_vec_centroid_full" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val vecSum = udaf(new graft.expr.VectorSum(64))
      e.groupBy("label")
        .agg(vecSum(col("embedding")).as("sums"), count(lit(1)).as("n"))
        .select(col("label"),
          array_join(expr(
            "transform(sums, x -> cast(cast(round(x / n * 1000000, 0) as bigint) as string))"),
            ",").as("centroid"))
        .orderBy("label")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_string_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 10.0) AS INT) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // oracle = the plain theta join (semantics, not algorithm)
    "q_join_range_bucket" ->
      """SELECT v.event_id AS v_id, p.event_id AS p_id
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        | AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 3600000000
        |ORDER BY v_id, p_id""".stripMargin,

    "q_vec_centroid_full" ->
      """SELECT label,
        |  array_to_string(
        |    list(CAST(CAST(round(m * 1000000) AS BIGINT) AS VARCHAR) ORDER BY pos),
        |    ',') AS centroid
        |FROM (
        |  SELECT label, pos, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS m
        |  FROM (SELECT label, unnest(embedding) AS v,
        |          generate_subscripts(embedding, 1) AS pos
        |        FROM embeddings)
        |  GROUP BY label, pos)
        |GROUP BY label ORDER BY label""".stripMargin
  )
}
