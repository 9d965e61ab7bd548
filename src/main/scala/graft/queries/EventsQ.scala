package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** B.9 time-windowed queries in batch form (SURVEY.md §2).
  *
  * These are the batch oracles for their Structured Streaming twins in
  * `graft.streaming`: the exact same `window`/`session_window` plans
  * run under `readStream` with watermarks; result equality is asserted
  * by the streaming test suite (SURVEY.md §5.2.3).
  *
  * Scale: windowed group-bys shuffle on (window, key) — bounded state,
  * partial aggregation applies. Session windows shuffle on user_id;
  * state per user is bounded by the watermark horizon when streamed.
  */
object EventsQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_val"))
        // final projection: ntz timestamp (parquet timestamp[us], no tz
        // annotation) — the driver's comparator treats Spark's
        // tz-carrying timestamps as a schema mismatch vs DuckDB's naive
        .select(col("window.start").cast("timestamp_ntz").as("wstart"),
          col("event_type"), col("n"), col("sum_val"))
        .orderBy("wstart", "event_type")),

    "q_win_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("timestamp_ntz").as("wstart"), col("n"))
        .orderBy("wstart")),

    "q_session_gaps" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(min("ts").as("s_start"), max("ts").as("s_end"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          round(avg((unix_micros(col("s_end")) - unix_micros(col("s_start"))) / 1000000.0), 4)
            .as("avg_len_sec"))
        .orderBy("user_id")),

    // MapType surface: per-user event-type counts as a map built with
    // map_from_entries over a SORTED entry list (deterministic key
    // order), then read back through map_keys / element_at /
    // map_filter. The oracle needs no map type at all — every output
    // is re-expressible as conditional aggregation, which is exactly
    // what makes the map column checkable cross-engine.
    "q_map_funcs" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).cast("int").as("c"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("c")))))
          .as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), "purchase"), lit(0)).as("n_purchase"),
          size(expr("map_filter(m, (k, v) -> v >= 3)")).as("n_frequent"),
          concat_ws(",", expr(
            "transform(map_keys(m), k -> concat(k, ':', cast(element_at(m, k) as string)))"))
            .as("kv"))
        .orderBy("user_id")
    }),

    // Time-series resample with gap fill: fixed 15-minute grid over the
    // first two days x every event type, left-joined against the real
    // buckets; counts fill with 0, sums forward-fill from the last
    // non-empty bucket (last_value IGNORE NULLS over an unbounded
    // running frame — one window pass, no self-join chains).
    "q_resample_interp" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      val agg = ev.groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(sum("value").as("sv"), count(lit(1)).as("n"))
        .select(col("event_type"), col("window.start").as("wstart"), col("sv"), col("n"))
      val grid = ev.select("event_type").distinct()
        .select(col("event_type"), explode(expr(
          "sequence(timestamp'2024-01-01 00:00:00', timestamp'2024-01-02 23:45:00', interval 15 minutes)"))
          .as("wstart"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("wstart")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      grid.join(agg, Seq("event_type", "wstart"), "left")
        .select(col("event_type"),
          col("wstart").cast("timestamp_ntz").as("wstart"),
          coalesce(col("n"), lit(0L)).as("n"),
          round(coalesce(last(col("sv"), ignoreNulls = true).over(w), lit(0.0)), 4)
            .as("filled"))
        .orderBy("event_type", "wstart")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Each event lands in exactly two 1h/30min sliding windows: the one
    // starting at its 30-min bucket and the one 30 min earlier.
    "q_win_sliding" ->
      """SELECT wstart, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS wstart
        |  FROM events CROSS JOIN (VALUES (0), (1)) t(k))
        |GROUP BY wstart ORDER BY wstart""".stripMargin,

    // Gaps-and-islands translation of session_window semantics: a new
    // session starts only when the gap STRICTLY exceeds 30 min —
    // Spark merges sessions whose windows touch (verified empirically:
    // a gap of exactly the gap duration merges; SessionBoundarySpec).
    "q_session_gaps" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR ts - pts > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS flag
        |  FROM o),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(flag) OVER (PARTITION BY user_id ORDER BY ts
        |                    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |sess AS (
        |  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
        |  FROM g GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  ROUND(AVG(date_diff('microsecond', s_start, s_end) / 1000000.0), 4) AS avg_len_sec
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS INT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS INT) AS n_types,
        |  CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN c END), 0) AS INT) AS n_purchase,
        |  CAST(SUM(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS INT) AS n_frequent,
        |  string_agg(event_type || ':' || CAST(c AS VARCHAR), ',' ORDER BY event_type) AS kv
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_resample_interp" ->
      """WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
        |agg AS (
        |  SELECT event_type, time_bucket(INTERVAL '15 minutes', ts) AS wstart,
        |    SUM(value) AS sv, COUNT(*) AS n
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.wstart
        |  FROM (SELECT DISTINCT event_type FROM ev) t
        |  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-02 23:45:00', INTERVAL 15 MINUTE)) AS wstart) g),
        |j AS (
        |  SELECT grid.event_type, grid.wstart, agg.sv, COALESCE(agg.n, 0) AS n
        |  FROM grid LEFT JOIN agg USING (event_type, wstart))
        |SELECT event_type, wstart, n,
        |  ROUND(COALESCE(last_value(sv IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY wstart ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 4) AS filled
        |FROM j ORDER BY event_type, wstart""".stripMargin
  )
}
