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
        .orderBy("user_id"))
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
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
