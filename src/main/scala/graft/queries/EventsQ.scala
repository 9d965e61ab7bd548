package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](
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
    }),

    // Robust anomaly detection: per-type median + MAD (median absolute
    // deviation), flag |value − med| > 3·MAD. Classic ops-analytics
    // outlier rule that, unlike z-scores, survives the outliers it
    // hunts. Med/MAD are snapped via round(x·1e4)/1e4 — the identical-
    // scaling form — before the threshold compare, so the two engines'
    // percentile-interpolation ulp differences can't flip a boundary
    // row. Exact percentile shuffles once per level; the 5-row stats
    // table broadcasts back onto the stream.
    "q_anomaly_mad" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def r4(c: Column): Column = round(c * lit(10000)) / lit(10000)
      // both medians through the distributed exact-quantile plan
      // (r6, §7.5): value-count + rank window, never a per-group
      // full-value buffer
      val med = graft.operators.ExactQuantiles
        .byGroup(ev, Seq("event_type"), "value", Seq(0.5))
        .select(col("event_type"), r4(col("v")).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("value") - col("med")).as("_dev"))
      val mad = graft.operators.ExactQuantiles
        .byGroup(dev, Seq("event_type"), "_dev", Seq(0.5))
        .select(col("event_type"), r4(col("v")).as("mad"))
        .join(broadcast(med), "event_type")
      val out = ev.join(broadcast(mad), "event_type")
        .filter(abs(col("value") - col("med")) > lit(3) * col("mad"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_out"), sum("event_id").as("s"))
      mad.join(out, Seq("event_type"), "left")
        .select(col("event_type"), col("med"), col("mad"),
          coalesce(col("n_out"), lit(0L)).as("n_out"),
          coalesce(col("s"), lit(0L)).as("sum_out_id"))
        .orderBy("event_type")
    }),

    // Winsorization (r5): per-type p05/p99 clamp of value — the
    // outlier-robust normalization a feature pipeline applies before
    // scaling (clip, don't drop: row count is preserved). Boundaries
    // are exact percentiles snapped round(x·1e4)/1e4 (the
    // q_anomaly_mad interpolation-ulp guard); the clip itself is
    // least/greatest against the snapped bounds. Output is the per-type
    // audit row — n, clipped-low/high counts, and the clamped sum in
    // exact micro-units (round(x·1e6) per row, THEN integer sum: no
    // summation-order surface at all). One percentile shuffle, stats
    // broadcast back, one agg — same two-pass shape as q_anomaly_mad;
    // at 100 TB pass 1 becomes approx_percentile on the same plan.
    "q_winsorize" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def r4(c: Column): Column = round(c * lit(10000)) / lit(10000)
      // bounds through the distributed exact-quantile plan (r6, §7.5)
      val bounds = graft.operators.ExactQuantiles
        .byGroup(ev, Seq("event_type"), "value", Seq(0.05, 0.99))
        .groupBy("event_type")
        .agg(r4(max(when(col("q") === 0.05, col("v")))).as("lo"),
          r4(max(when(col("q") === 0.99, col("v")))).as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"), col("lo"), col("hi"), col("value"),
          least(greatest(col("value"), col("lo")), col("hi")).as("w"))
        .groupBy("event_type")
        .agg(max("lo").as("lo"), max("hi").as("hi"),
          count(lit(1)).as("n"),
          count(when(col("value") < col("lo"), 1)).as("n_clip_lo"),
          count(when(col("value") > col("hi"), 1)).as("n_clip_hi"),
          sum(round(col("w") * lit(1000000)).cast("long")).as("sum_w_micro"))
        .orderBy("event_type")
    }),

    // EWMA smoothing (α=0.2) of hourly event counts over the 2-day
    // grid (empty buckets = 0, as in q_resample_interp). The recurrence
    // y_i = α·x_i + (1−α)·y_{i−1} is closed-form over a running window
    // sum of terms scaled by (1−α)^{−i} — one window pass, no self-join
    // or iterative loop; the 48-point grid bounds the scale factor so
    // the rescaling stays well inside double range. Both engines
    // accumulate the identical terms in identical ts order.
    "q_ewma" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      val agg = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("window.start").as("wstart"), col("n"))
      val grid = ev.select("event_type").distinct()
        .select(col("event_type"), explode(expr(
          "sequence(timestamp'2024-01-01 00:00:00', timestamp'2024-01-02 23:00:00', interval 1 hour)"))
          .as("wstart"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("i")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      grid.join(agg, Seq("event_type", "wstart"), "left")
        .select(col("event_type"), col("wstart"),
          ((unix_micros(col("wstart")) - lit(1704067200000000L)) / lit(3600000000L))
            .cast("int").as("i"),
          coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("u",
          when(col("i") === 0, col("n").cast("double"))
            .otherwise(lit(0.2) * col("n") * pow(lit(0.8), -col("i"))))
        .select(col("event_type"),
          col("wstart").cast("timestamp_ntz").as("wstart"), col("n"),
          (round(pow(lit(0.8), col("i")) * sum("u").over(w) * lit(10000)) / lit(10000))
            .as("ewma"))
        .orderBy("event_type", "wstart")
    }),

    // Ordered conversion funnel view -> click -> purchase: first view,
    // first click strictly after it, first purchase strictly after
    // that, per user. Three filtered min-aggregations chained by
    // time-bound joins — each stage shuffles on user_id only (no
    // window over the raw stream, no per-user event sort). Timestamps
    // leave as unix micros (ntz-safe for the comparator).
    "q_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("us") > col("t1"))
        .groupBy("user_id", "t1").agg(min("us").as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c.select("user_id", "t2"), "user_id")
        .filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min("us").as("t3"))
      v.join(c.select("user_id", "t2"), Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
            + when(col("t3").isNotNull, 1).otherwise(0)).as("stage"))
        .orderBy("user_id")
    }),

    // Inter-arrival gap statistics per event type: lag over each
    // (user, type) sequence, then one aggregation. Everything stays in
    // exact integer microseconds until the final projection, where
    // both engines perform the identical BIGINT/BIGINT/1e6 double
    // division — no accumulation-order drift anywhere. At scale the
    // window shuffles once on (user_id, event_type) and each task
    // sorts only one user's slice; the output is 5 rows.
    "q_gap_stats" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("us", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap").as("sum_gap_us"),
          min("gap").as("min_gap_us"),
          max("gap").as("max_gap_us"))
        .select(col("event_type"), col("n_gaps"), col("sum_gap_us"),
          col("min_gap_us"), col("max_gap_us"),
          round(col("sum_gap_us") / col("n_gaps") / lit(1e6), 6).as("avg_gap_sec"))
        .orderBy("event_type")
    }),

    // Rolling exact median of value over the 10 preceding events per
    // type (ordered by (ts, event_id) — unique, so both engines see
    // identical frame contents). Med snapped round(x·1e4)/1e4 like
    // q_anomaly_mad: the two engines' even-count interpolation is the
    // same (a+b)/2 formula but ulp-guarding the compare costs nothing.
    // One shuffle on event_type; frame is O(11) per row. Scale note:
    // partitioning by type alone caps parallelism at the type count —
    // at 100 TB, range-partition (type, time-chunk) and prepend each
    // chunk's last 10 rows to its successor (the frame depth bounds
    // the overlap), which this bounded-frame window permits exactly.
    "q_rolling_median" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          (round(expr("percentile(value, 0.5)").over(w) * lit(10000)) / lit(10000))
            .as("med"))
        .orderBy("event_id")
    }),

    // Trailing 7-day distinct active users per day — the sliding
    // DISTINCT aggregate no engine's window frames support directly
    // (COUNT(DISTINCT) OVER is illegal in Spark and DuckDB alike).
    // Scale shape: daily (day, user) dedup first (the big shuffle,
    // partial-agg friendly), then each pair contributes to its 7
    // target days via a BOUNDED explode — never a day×day range
    // self-join. Target days are clipped to days present in the data
    // (semi join) so edge windows are honest partial windows.
    "q_sliding_distinct" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select("day").distinct()
      du.select(col("day"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("k"))
        .select(expr("date_add(day, k)").as("day"), col("user_id"))
        .join(days, "day")
        .groupBy("day")
        .agg(countDistinct("user_id").as("n_active_7d"))
        .orderBy("day")
    }),

    // Weekly cohort retention: cohort = week of a user's first event;
    // n_active = distinct cohort users active k weeks later. The
    // classic growth-analytics matrix — two shuffles (per-user min,
    // then per-(cohort, offset) distinct count), cohort keys leave as
    // date strings (tz-free).
    "q_retention_cohort" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = wk.groupBy("user_id").agg(min("wk").as("cohort"))
      wk.join(first, "user_id")
        .select(col("user_id"), col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Time-series downsampling to OHLC bars (open/high/low/close +
    // volume), the canonical resample shape for metric stores. One
    // shuffle on (bucket, type) with full partial aggregation:
    // open/close are min_by/max_by over the (ts, event_id) total
    // order — no window sort, no second pass, and at 100 TB the bar
    // table is ~|buckets|·|types| rows regardless of input size.
    "q_ohlc_resample" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket"),
          col("event_type"))
        .agg(
          round(min_by(col("value"), struct(col("ts"), col("event_id"))), 4).as("open"),
          round(max("value"), 4).as("high"),
          round(min("value"), 4).as("low"),
          round(max_by(col("value"), struct(col("ts"), col("event_id"))), 4).as("close"),
          count(lit(1)).as("n"),
          round(sum("value"), 4).as("volume"))
        .orderBy("bucket", "event_type")),

    // Last-touch attribution: each purchase is credited to the most
    // recent PRECEDING non-purchase event of the same user ("direct"
    // when none exists). One window pass per user (running last-non-
    // null carry — O(1) state per row), then a tiny channel rollup.
    // State is per-user and time-ordered, so at scale this partitions
    // on user_id and streams — the same shape sessionization uses.
    "q_attribution_last" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("src",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("src"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 4).as("revenue"))
        .orderBy("channel")
    }),

    // Population Stability Index per event type between the month's
    // two halves — the drift-monitoring metric serving/feature
    // pipelines alarm on (PSI > 0.2 = shifted). Fixed-width bins
    // (width 10, capped at 19) rather than quantile bins: boundary
    // arithmetic is exact integer division, no interpolation-ulp
    // surface. Missing bins floor at ε=1e-4 (the standard PSI
    // convention). Two partial aggs + a bounded full-outer on
    // (type, bin) — input scanned once.
    "q_psi_drift" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .withColumn("half",
          when(col("ts") < lit("2024-01-15").cast("timestamp"), "a").otherwise("b"))
        .withColumn("bin", least(floor(col("value") / 10).cast("int"), lit(19)))
        .groupBy("event_type", "half", "bin").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true)
      val tot = counts.groupBy("event_type", "half").agg(sum("n").as("tot"))
      val p = counts.join(tot, Seq("event_type", "half"))
        .withColumn("share", col("n") / col("tot"))
      val a = p.filter(col("half") === "a")
        .select(col("event_type"), col("bin"), col("share").as("pa"))
      val b = p.filter(col("half") === "b")
        .select(col("event_type"), col("bin"), col("share").as("pb"))
      a.join(b, Seq("event_type", "bin"), "full_outer")
        .withColumn("qa", coalesce(col("pa"), lit(1e-4)))
        .withColumn("qb", coalesce(col("pb"), lit(1e-4)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_bins"),
          round(sum((col("qa") - col("qb")) * log(col("qa") / col("qb"))), 4)
            .as("psi"))
        .orderBy("event_type")
    }),

    // Welch's two-sample t-statistic between every event-type pair on
    // `value` — the A/B-test primitive as a query: everything derives
    // from one partial-agg stats pass (n, mean, sample variance per
    // arm); the pair join is over the BOUNDED 5-row stats table. The
    // corpus is scanned once regardless of how many pairs are tested.
    "q_abtest_ttest" -> ((s, d) => {
      // the stats table is referenced on BOTH sides of the pair join;
      // unmaterialized, each reference re-runs the full corpus scan —
      // localCheckpoint the 5 bounded rows so the corpus is read once
      val st = Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"), avg("value").as("m"),
          var_samp("value").as("v"))
        .localCheckpoint(eager = true)
      val a = st.select(col("event_type").as("type_a"), col("n").as("n_a"),
        col("m").as("m_a"), col("v").as("v_a"))
      val b = st.select(col("event_type").as("type_b"), col("n").as("n_b"),
        col("m").as("m_b"), col("v").as("v_b"))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          round((col("m_a") - col("m_b"))
            / sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")), 4)
            .as("t_stat"))
        .orderBy("type_a", "type_b")
    }),

    // Consecutive-run collapse (clickstream compression): per user,
    // runs of the same event_type in time order collapse to one —
    // n_runs/n_events is the stream's compressibility. One lag window
    // per user (O(1) state) + a rollup; the sequence-dedup pass event
    // pipelines run before sessionization.
    "q_seq_dedup" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev", lag("event_type", 1).over(w))
        .withColumn("is_new",
          col("prev").isNull || col("prev") =!= col("event_type"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_runs"))
        .withColumn("compress_ratio",
          round(col("n_runs") / col("n_events").cast("double"), 6))
        .orderBy("user_id")
    }),

    // Rate-burst detection: hourly event counts per type, flagged
    // where the count's z-score against that type's own hourly
    // distribution exceeds 2 — the ops-monitoring complement to
    // q_anomaly_mad (value-grain). The hourly rollup is one partial
    // agg; the per-type stats are bounded and broadcast back. The
    // threshold compares the 4dp-ROUNDED z (the fuzzy_jw ulp rule) so
    // both engines cut on the same grid.
    "q_burst_detect" -> ((s, d) => {
      // hourly feeds both the stats derivation and the probe side —
      // materialize the bounded (buckets × types) rollup once
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true)
      val stats = hourly.groupBy("event_type")
        .agg(avg("n").as("mu"), stddev_pop("n").as("sigma"))
      hourly.join(broadcast(stats), "event_type")
        .withColumn("z", round((col("n") - col("mu")) / col("sigma"), 4))
        .filter(col("z") > 2.0)
        .select("event_type", "bucket", "n", "z")
        .orderBy("event_type", "bucket")
    }),

    // Standardized third/fourth moments (skewness, excess kurtosis)
    // per event type, computed TWO-PASS: first-pass mu/sigma per
    // group (bounded, broadcast back), second pass averages powers of
    // the ~O(1) z-scores. The naive one-pass raw-moment route sums
    // x^4 (~1e13 at bench sf) and loses the 4dp comparison to double
    // cancellation; centering first keeps every partial sum O(n) —
    // the numerically-stable shape that survives corpus magnitudes.
    "q_moment_stats" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_pop("value").as("sigma"),
          count(lit(1)).as("n"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .groupBy("event_type")
        .agg(min("n").as("n"),
          round(avg(pow(col("z"), 3)), 4).as("skewness"),
          round(avg(pow(col("z"), 4)) - lit(3.0), 4).as("excess_kurtosis"))
        .orderBy("event_type")
    }),

    // ROC-AUC of `value` as a purchase predictor — the tie-corrected
    // Mann-Whitney formulation: collapse the corpus to per-score
    // (pos, neg) counts FIRST (the value grid is bounded — ~20k cells
    // for 2dp values regardless of corpus size), then one ordered
    // pass accumulates negatives strictly below each score:
    // AUC = Σ pos_s·(cumneg_<s + neg_s/2) / (P·N). The global window
    // runs over the bounded score rollup, never the raw rows — the
    // shape that survives 100 TB (rank-the-corpus does not).
    "q_auc" -> ((s, d) => {
      val perScore = Tables.events(s, d)
        .withColumn("is_pos",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .groupBy("value")
        .agg(count(lit(1)).as("n"), sum("is_pos").as("pos"))
        .withColumn("neg", col("n") - col("pos"))
      // bounded grain: distinct quantized score values (generator grid)
      val w = org.apache.spark.sql.expressions.Window.orderBy("value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      perScore
        .withColumn("cumneg", coalesce(sum("neg").over(w), lit(0L)))
        .agg(sum("pos").as("n_pos"), sum("neg").as("n_neg"),
          round(sum(col("pos") * (col("cumneg") + col("neg") / 2.0))
            / (sum(col("pos")) * sum(col("neg"))), 6).as("auc"))
    }),

    // Pearson chi-squared independence test between event type and a
    // calendar bucket (day-of-month mod 7): one contingency partial
    // agg over the corpus, then the expected-count algebra runs on
    // the BOUNDED cell table with broadcast marginals. Expected
    // counts in double (long·long marginal products overflow at
    // petabyte row counts).
    "q_chisq_indep" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .withColumn("dow", dayofmonth(col("ts")) % 7)
        .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
        .localCheckpoint(eager = true) // bounded cells, referenced 4×
      val rowt = obs.groupBy("event_type").agg(sum("o").as("rt"))
      val colt = obs.groupBy("dow").agg(sum("o").as("ct"))
      val tot = obs.agg(sum("o").as("nn"))
      obs.join(broadcast(rowt), "event_type").join(broadcast(colt), "dow")
        .crossJoin(broadcast(tot))
        .withColumn("e", col("rt").cast("double") * col("ct") / col("nn"))
        .agg(count(lit(1)).as("n_cells"),
          round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"))
    }),

    // First-order Markov transition matrix over each user's event
    // sequence: one lead-window pass per user (partitioned, O(1)
    // state), pair counts via partial agg, row-normalized against the
    // bounded (cur → *) totals. The clickstream next-action model.
    "q_markov_transition" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .withColumn("next", lead("event_type", 1).over(w))
        .filter(col("next").isNotNull)
        .groupBy(col("event_type").as("cur"), col("next"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true) // ≤25 rows, referenced twice
      val tot = pairs.groupBy("cur").agg(sum("n").as("tot"))
      pairs.join(broadcast(tot), "cur")
        .withColumn("p", round(col("n") / col("tot"), 6))
        .select("cur", "next", "n", "p")
        .orderBy("cur", "next")
    }),

    // Autocorrelation of the daily value series at lags 1..7: the
    // corpus collapses to one bounded daily rollup (one partial agg),
    // and every lagged Pearson correlation runs on that ~30-row
    // series via a broadcast lag grid — 7 ACF points for one scan.
    "q_acf" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d")).agg(sum("value").as("x"))
        .localCheckpoint(eager = true) // bounded: one row per day
      val lags = s.range(1, 8).select(col("id").cast("int").as("lag_n"))
      daily.crossJoin(broadcast(lags))
        .join(daily.select(col("d").as("d2"), col("x").as("y")),
          expr("date_add(d, lag_n) = d2"))
        .groupBy("lag_n")
        .agg(count(lit(1)).as("n_pairs"), round(corr("x", "y"), 4).as("acf"))
        .orderBy("lag_n")
    }),

    // Trend/residual decomposition of the daily series via a 7-day
    // centered moving average — null at the edges where the window is
    // partial, the textbook MA-STL convention. Like q_acf, the corpus
    // collapses to the bounded daily rollup first; the un-partitioned
    // window runs over ~30 rows, never the raw corpus.
    "q_stl_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d")).agg(sum("value").as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("d").rowsBetween(-3, 3)
      daily
        .withColumn("nw", count(lit(1)).over(w))
        .withColumn("ma", avg("x").over(w))
        .select(col("d"), round(col("x"), 4).as("x"),
          when(col("nw") === 7, round(col("ma"), 4)).as("trend"),
          when(col("nw") === 7, round(col("x") - col("ma"), 4)).as("resid"))
        .orderBy("d")
    }),

    // Hill tail-index estimator (the heavy-tail audit a cost/latency/
    // value distribution gets before anyone trusts its mean):
    // α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the top k+1 order
    // statistics (k = 100). The order statistics come from a
    // TakeOrdered top-(k+1) — never a global sort — and each log term
    // µ-snaps before the bounded sum. Values enter as exact centi
    // longs so the x_(k+1) pivot is bit-identical cross-engine.
    "q_tail_index" -> ((s, d) => {
      val k = 100
      val top = Tables.events(s, d)
        .select(round(col("value") * 100).cast("long").as("v_c"),
          col("event_id"))
        .orderBy(col("v_c").desc, col("event_id")).limit(k + 1)
        .localCheckpoint(eager = true) // bounded k+1 rows
      val pivot = top.orderBy(col("v_c"), col("event_id")).limit(1)
        .select(col("v_c").as("pivot_c"))
      top.crossJoin(broadcast(pivot))
        .filter(col("v_c") > col("pivot_c"))
        .withColumn("t_u",
          round(log(col("v_c").cast("double") / col("pivot_c")) * 1e6)
            .cast("long"))
        .agg(count(lit(1)).as("k_used"),
          min(col("pivot_c") / 100.0).as("x_k1"),
          round(count(lit(1)) / (sum("t_u") / 1e6), 4).as("hill_alpha"))
    }),

    // Peak detection with neighborhood prominence (the alerting/
    // seasonality-QA primitive): a day is a peak when its exact µ-grid
    // daily mean strictly exceeds both neighbors, and its prominence
    // is the rise above the higher of the two flanking ±3-day minima.
    // Everything runs on exact longs over the bounded daily grid, so
    // peak flags and prominences cannot flap cross-engine; the only
    // corpus-sized work is the daily partial agg (cusum recipe).
    "q_peak_detect" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n"))
      // bounded grain: one row per day
      val wo = org.apache.spark.sql.expressions.Window.orderBy("d")
      val wl = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(-3, -1)
      val wr = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(1, 3)
      daily
        .withColumn("prev", lag("mmu", 1).over(wo))
        .withColumn("nxt", lead("mmu", 1).over(wo))
        .withColumn("lmin", min("mmu").over(wl))
        .withColumn("rmin", min("mmu").over(wr))
        .withColumn("is_peak", col("prev").isNotNull && col("nxt").isNotNull
          && col("mmu") > col("prev") && col("mmu") > col("nxt"))
        .withColumn("prom_u", when(col("is_peak"),
          col("mmu") - greatest(col("lmin"), col("rmin"))))
        .select(col("d"), round(col("mmu") / 1e6, 4).as("mean_v"),
          col("is_peak"),
          round(col("prom_u") / 1e6, 4).as("prominence"))
        .orderBy("d")
    }),

    // STL feature strengths (Wang & Hyndman's tsfeatures): trend
    // strength 1 − Var(R)/Var(T+R) and seasonal strength
    // 1 − Var(R)/Var(S+R) from the q_stl_trend decomposition plus a
    // day-of-week seasonal component. Every component snaps to an
    // exact CENTI-grid long at its birth (daily total → MA →
    // detrended → dow means → residual) — centi, not µ: the squared
    // residuals of sf0.1-sized daily totals must stay inside
    // exact-long range — so the bounded-grid variances are exact-long
    // sums and the two strengths are bit-identical cross-engine. The corpus-sized work is one partial agg; the
    // decomposition lives on the ~30-row daily grid.
    "q_stl_strength" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d")).agg(sum("value").as("x"))
        .withColumn("x_u", round(col("x") * 1e2).cast("long"))
      val w7 = org.apache.spark.sql.expressions.Window
        .orderBy("d").rowsBetween(-3, 3)
      val comp = daily
        .withColumn("nw", count(lit(1)).over(w7))
        .withColumn("t_u", round(avg("x_u").over(w7)).cast("long"))
        .filter(col("nw") === 7)
        .withColumn("detr_u", col("x_u") - col("t_u"))
        .withColumn("dow", dayofweek(col("d")))
        .localCheckpoint(eager = true) // bounded daily grid
      val season = comp.groupBy("dow")
        .agg(round(avg("detr_u")).cast("long").as("s_u"))
      val full = comp.join(broadcast(season), "dow")
        .withColumn("r_u", col("detr_u") - col("s_u"))
        .withColumn("tr_u", col("t_u") + col("r_u"))
        .withColumn("sr_u", col("s_u") + col("r_u"))
      def varOf(c: String) =
        (sum(col(c) * col(c)) - sum(col(c)).cast("double") * sum(col(c))
          / count(lit(1))) / (count(lit(1)) - 1)
      full.agg(count(lit(1)).as("n_days"),
          round(greatest(lit(0.0),
            lit(1.0) - varOf("r_u") / varOf("tr_u")), 6).as("trend_strength"),
          round(greatest(lit(0.0),
            lit(1.0) - varOf("r_u") / varOf("sr_u")), 6)
            .as("seasonal_strength"))
    }),

    // Grid-density clustering (the DBSCAN shape that scales): points
    // collapse to grid cells in ONE partial agg (the only corpus
    // scan), dense cells (≥0.2% of points — a RELATIVE threshold, so
    // the same query works at any corpus size) become vertices, the
    // 8-neighborhood between dense cells becomes edges (a broadcast
    // self-join over the bounded cell table), and cluster ids resolve
    // via the same ConnectedComponents operator the dedup family
    // uses. Density clustering at 100 TB is exactly this: never pair
    // points, pair CELLS.
    "q_grid_cluster" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .select(floor(col("value") / 20).cast("int").as("cx"),
          floor(get_json_object(col("props"), "$.k").cast("int") / 10)
            .cast("int").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true) // bounded cell table
      val tot = cells.agg(sum("n").as("nn"))
      val dense = cells.crossJoin(broadcast(tot))
        .filter(col("n") >= col("nn") * 0.002)
        // bijective (cx, cy) → id packing (r6 ADVICE): high-32 | low-32
        // — the previous cx*1000+cy collided for negative or ≥1000 cy
        // (both engines shared the bug, so the oracle couldn't see it).
        .withColumn("id",
          expr("(CAST(cx AS BIGINT) << 32) | (CAST(cy AS BIGINT) & 4294967295)"))
        .localCheckpoint(eager = true) // vertices, referenced 3×
      val b = dense.select(col("id").as("b_id"), col("cx").as("bx"),
        col("cy").as("by"))
      val edges = dense.join(broadcast(b),
          abs(col("cx") - col("bx")) <= 1 && abs(col("cy") - col("by")) <= 1
            && col("id") < col("b_id"))
        .select(col("id").as("a_id"), col("b_id"))
      val labels = graft.operators.ConnectedComponents.components(s,
        dense.select(col("id").as("doc_id")), edges)
      dense.join(labels, dense("id") === labels("doc_id"))
        .select(col("cx"), col("cy"), col("n"), col("label").as("cluster"))
        .orderBy("cx", "cy")
    }),

    // Two-sample Kolmogorov-Smirnov: D = max |F_purchase - F_view|
    // over the merged value grid, the same collapse-to-the-bounded-
    // score-grid shape as q_auc (the corpus is scanned once; the
    // ordered pass runs on per-value counts). The reject flag
    // compares 6dp-ROUNDED D to the 6dp-rounded α=.05 critical value
    // so both engines cut on the same grid.
    "q_ks_test" -> ((s, d) => {
      val perVal = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("a"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
        .localCheckpoint(eager = true) // bounded value grid, referenced twice
      val w = org.apache.spark.sql.expressions.Window.orderBy("value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = perVal.agg(sum("a").as("n1"), sum("b").as("n2"))
      perVal
        .withColumn("ca", sum("a").over(w))
        .withColumn("cb", sum("b").over(w))
        .crossJoin(broadcast(tot))
        .agg(min("n1").as("n1"), min("n2").as("n2"),
          max(abs(col("ca") / col("n1") - col("cb") / col("n2"))).as("d_raw"))
        .select(col("n1"), col("n2"), round(col("d_raw"), 6).as("d"),
          (round(col("d_raw"), 6) >
            round(lit(1.358) * sqrt((col("n1") + col("n2"))
              / (col("n1").cast("double") * col("n2"))), 6)).as("reject"))
    }),

    // CUSUM mean-shift detection on the daily series: cumulative
    // deviation from the global mean, peak excursion flagged — the
    // changepoint complement to q_burst_detect (rate spikes) and
    // q_psi_drift (distribution drift). Corpus → bounded daily rollup
    // → one ordered pass. Arithmetic is EXACT-INTEGER until the final
    // projection (r6 fix): avg-of-doubles is partition-order-dependent
    // and the 30-term cusum compounds the drift ~30×, so instead the
    // daily mass is summed in floor'd µ-units (long), the daily mean
    // snapped to the µ grid by integer division (identical in both
    // engines for the non-negative value domain), and the cusum is the
    // exact long N·cum_i − i·tot. Only the output projection divides —
    // one IEEE division of identical longs, bit-equal across engines.
    "q_cusum_drift" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n")) // µ-grid daily mean, exact
        .localCheckpoint(eager = true) // bounded daily series, reused twice
      val wAll = org.apache.spark.sql.expressions.Window
        .orderBy("d").rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = daily.agg(sum("mmu").as("tot"), count(lit(1)).as("nd"))
      val withCusum = daily.crossJoin(broadcast(tot))
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("d")))
        .withColumn("cum", sum("mmu").over(wAll))
        .withColumn("cs", col("nd") * col("cum") - col("i") * col("tot"))
      val peak = withCusum.agg(max(abs(col("cs"))).as("peak"))
      withCusum.crossJoin(broadcast(peak))
        .select(col("d"), round(col("mmu") / 1e6, 4).as("mean_v"),
          round(col("cs") / (col("nd") * 1e6), 4).as("cusum"),
          (abs(col("cs")) === col("peak")).as("is_peak"))
        .orderBy("d")
    }),

    // Single-changepoint detection by binary segmentation (Scott &
    // Knott / the first CBS split): for every admissible split k of
    // the daily-mean series, the SSE reduction vs the unsplit series,
    // computed entirely from exact-long prefix sums of the µ-grid
    // daily means (q_cusum_drift's mmu — sums and sums-of-squares of
    // 30 longs stay far inside exact-long range, so every candidate's
    // score is bit-identical in any engine); the winner is an exact
    // long-unit argmax with earliest-day tiebreak. Min segment 3.
    // Scale: the series is date-grain bounded — the corpus-sized work
    // is the one partial agg that builds it.
    "q_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n"))
        .localCheckpoint(eager = true) // bounded daily series
      val wAll = org.apache.spark.sql.expressions.Window
        .orderBy("d").rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = daily.agg(sum("mmu").as("st"),
        sum(col("mmu") * col("mmu")).as("qt"), count(lit(1)).as("nd"))
      val pre = daily.crossJoin(broadcast(tot))
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("d")))
        .withColumn("sl", sum("mmu").over(wAll))
        .withColumn("ql", sum(col("mmu") * col("mmu")).over(wAll))
        // SSE(seg) = Σx² − (Σx)²/n; reduction = SSE_tot − SSE_L − SSE_R.
        // The Σx² terms cancel, leaving only the exact-long (Σx)² ratios.
        .withColumn("red_raw", when(
          col("i") >= 3 && col("i") <= col("nd") - 3,
          col("sl").cast("double") * col("sl") / col("i")
            + (col("st") - col("sl")).cast("double") * (col("st") - col("sl"))
              / (col("nd") - col("i"))
            - col("st").cast("double") * col("st") / col("nd")))
        .withColumn("red_u", round(col("red_raw") / lit(1e6)).cast("long"))
        .localCheckpoint(eager = true) // bounded; feeds rows + argmax
      val best = pre.filter(col("red_u").isNotNull)
        .orderBy(col("red_u").desc, col("d")).limit(1)
        .select(col("d").as("best_d"))
      pre.crossJoin(broadcast(best))
        .select(col("d"), round(col("mmu") / 1e6, 4).as("mean_v"),
          round(col("red_u") / lit(1e6), 4).as("sse_reduction"),
          (col("d") === col("best_d")).as("is_changepoint"))
        .orderBy("d")
    }),

    // Stationary distribution of the event-type Markov chain: 20
    // power-iteration rounds over the q_markov_transition matrix. The
    // |types|² transition table is a provably bounded statistic (the
    // BPE-argmax posture), so the iteration runs driver-side in pure
    // Scala on the µ-grid — every round's terms are
    // round(π_u(i)·n_ij/n_i), exact-long arithmetic mirrored verbatim
    // by the oracle's 20 unrolled MATERIALIZED CTE rounds, so the
    // fixpoint is bit-identical cross-engine. At 100 TB the corpus-
    // sized work is the one partial agg building the matrix.
    "q_markov_stationary" -> ((s, d) => {
      val (states, _, _, pi) = markovFixpoint(s, d)
      import s.implicits._
      states.zip(pi).toSeq.toDF("state", "pi_u")
        .select(col("state"), round(col("pi_u") / 1e9, 6).as("pi"))
        .orderBy("state")
    }),

    // Entropy rate of the event-type Markov chain — H = −Σ_i π_i
    // Σ_j p_ij ln p_ij, the bits-per-event compressibility bound of
    // the behavioral stream (the sequence-predictability metric a
    // next-event model is benchmarked against). Rides the same
    // bounded-matrix fixpoint as q_markov_stationary; every cell term
    // snaps to the 1e9-grid before the sum, so the rate is
    // bit-identical cross-engine.
    "q_entropy_rate" -> ((s, d) => {
      val (states, nij, ni, pi) = markovFixpoint(s, d)
      var hU = 0L; var cells = 0L
      for (i <- states.indices; j <- states.indices
           if ni(i) > 0 && nij(i)(j) > 0) {
        val p = nij(i)(j).toDouble / ni(i)
        hU += math.floor(-pi(i).toDouble * p * math.log(p) + 0.5).toLong
        cells += 1
      }
      import s.implicits._
      Seq((cells, hU)).toDF("n_cells", "h_u")
        .select(col("n_cells"),
          round(col("h_u") / 1e9, 6).as("entropy_rate_nats"))
    }),

    // Power analysis / sample-size calculator (the pre-experiment
    // readout): per metric (event_type), the per-arm n required to
    // detect a 5% relative lift at α=0.05 two-sided, power 80% —
    // n = 2(z_{α/2}+z_β)²σ²/δ² with the z constants as literals
    // (1.96, 0.8416) and σ², δ derived from exact centi-long moments.
    // One partial agg; the output is |event types| rows.
    "q_power_analysis" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("v_c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v_c").as("sv"),
          sum(col("v_c") * col("v_c")).as("sq"))
        .withColumn("mean_c", col("sv") / col("n"))
        .withColumn("var_c",
          (col("sq") - col("sv").cast("double") * col("sv") / col("n"))
            / (col("n") - 1))
        .withColumn("delta_c", col("mean_c") * 0.05)
        .withColumn("n_req", ceil(
          lit(2.0) * lit(1.96 + 0.8416) * lit(1.96 + 0.8416)
            * col("var_c") / (col("delta_c") * col("delta_c"))).cast("long"))
        .select(col("event_type"), col("n"),
          round(col("mean_c") / 100.0, 4).as("mean_v"),
          round(sqrt(col("var_c")) / 100.0, 4).as("sd_v"),
          round(col("delta_c") / 100.0, 4).as("mde_abs"),
          col("n_req").as("n_per_arm"),
          (col("n_req") * 2 <= col("n")).as("feasible_now"))
        .orderBy("event_type")),

    // CUPED variance reduction (Deng et al. 2013 — the standard
    // experimentation trick): per-user pre-period value as the
    // covariate, θ = cov(pre, post)/var(pre) fitted pooled, adjusted
    // metric y* = y − θ(x − x̄). Every group moment derives
    // ALGEBRAICALLY from exact-long sums (Σx, Σy, Σxy, Σx², Σy² per
    // group — never a sum of adjusted doubles, which would be
    // partial-agg-order-dependent), so θ, both means, and the
    // variance-reduction percentage are bit-identical cross-engine.
    // Cross-products stay ≤ ~1e17 at sf0.1 (exact long); a larger
    // deployment drops the grid to deci-units.
    "q_ab_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          round(col("value") * 100).cast("long").as("v_c"))
      val span = ev.agg(min("t_us").as("mn"), max("t_us").as("mx"))
        .withColumn("mid", expr("(mn + mx) div 2"))
      val users = ev.crossJoin(broadcast(span))
        .groupBy("user_id")
        .agg(sum(when(col("t_us") < col("mid"), col("v_c")).otherwise(0L))
          .as("x"),
          sum(when(col("t_us") >= col("mid"), col("v_c")).otherwise(0L))
            .as("y"))
        .withColumn("t", col("user_id") % 2 === 0)
        .localCheckpoint(eager = true) // user-grain; feeds fit + groups
      val fit = users.agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("theta",
          (col("sxy") - col("sx").cast("double") * col("sy") / col("n"))
            / (col("sxx") - col("sx").cast("double") * col("sx") / col("n")))
        .withColumn("xbar", col("sx") / col("n"))
      users.groupBy("t")
        .agg(count(lit(1)).as("ng"), sum("x").as("gx"), sum("y").as("gy"),
          sum(col("x") * col("y")).as("gxy"),
          sum(col("x") * col("x")).as("gxx"),
          sum(col("y") * col("y")).as("gyy"))
        .crossJoin(broadcast(fit.select("theta", "xbar")))
        .withColumn("var_y",
          (col("gyy") - col("gy").cast("double") * col("gy") / col("ng"))
            / (col("ng") - 1))
        .withColumn("cov_g",
          (col("gxy") - col("gx").cast("double") * col("gy") / col("ng"))
            / (col("ng") - 1))
        .withColumn("var_x",
          (col("gxx") - col("gx").cast("double") * col("gx") / col("ng"))
            / (col("ng") - 1))
        .withColumn("var_adj", col("var_y")
          - lit(2.0) * col("theta") * col("cov_g")
          + col("theta") * col("theta") * col("var_x"))
        .select(col("t").as("treated"), col("ng").as("n_users"),
          round(col("gy") / col("ng") / 100.0, 4).as("mean_y"),
          round((col("gy") / col("ng")
            - col("theta") * (col("gx") / col("ng") - col("xbar"))) / 100.0, 4)
            .as("mean_y_adj"),
          round(col("theta"), 4).as("theta"),
          round(lit(1.0) - col("var_adj") / col("var_y"), 6)
            .as("var_reduction"))
        .orderBy("treated")
    }),

    // Sequential A/B monitoring (group-sequential testing, Pocock-
    // style constant boundary): per calendar day, the CUMULATIVE
    // treated/control sample stats (exact centi-long sums and
    // sums-of-squares via a running window), the pooled-variance z
    // statistic, and whether the trajectory has crossed the
    // 30-look Pocock boundary 2.89 — the peeking-safe readout a
    // continuously-monitored experiment dashboard shows. Every
    // cumulative input is an exact long, so the daily z values are
    // bit-identical across engines. v² sums stay far inside exact-
    // long range (≤ 2.4e9 per row).
    "q_sequential_ab" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("d"),
          (col("user_id") % 2 === 0).as("t"),
          round(col("value") * 100).cast("long").as("v_c"))
      val daily = ev.groupBy("d")
        .agg(sum(when(col("t"), 1L).otherwise(0L)).as("dn_t"),
          sum(when(col("t"), col("v_c")).otherwise(0L)).as("ds_t"),
          sum(when(col("t"), col("v_c") * col("v_c")).otherwise(0L)).as("dq_t"),
          sum(when(!col("t"), 1L).otherwise(0L)).as("dn_c"),
          sum(when(!col("t"), col("v_c")).otherwise(0L)).as("ds_c"),
          sum(when(!col("t"), col("v_c") * col("v_c")).otherwise(0L)).as("dq_c"))
      // bounded grain: one row per day
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily
        .withColumn("nt", sum("dn_t").over(w)).withColumn("st", sum("ds_t").over(w))
        .withColumn("qt", sum("dq_t").over(w)).withColumn("nc", sum("dn_c").over(w))
        .withColumn("sc", sum("ds_c").over(w)).withColumn("qc", sum("dq_c").over(w))
        .withColumn("mt", col("st") / col("nt"))
        .withColumn("mc", col("sc") / col("nc"))
        .withColumn("s2",
          ((col("qt") - col("st").cast("double") * col("st") / col("nt"))
            + (col("qc") - col("sc").cast("double") * col("sc") / col("nc")))
            / (col("nt") + col("nc") - 2))
        .withColumn("z", (col("mt") - col("mc"))
          / sqrt(col("s2") * (lit(1.0) / col("nt") + lit(1.0) / col("nc"))))
        .select(col("d"), col("nt"), col("nc"),
          round(col("mt") / 100.0, 4).as("mean_t"),
          round(col("mc") / 100.0, 4).as("mean_c"),
          round(col("z"), 4).as("z"),
          (abs(col("z")) > 2.89).as("crossed"))
        .orderBy("d")
    }),

    // Shapley-value channel attribution for the touch-count game
    // (v(S) = converted users reached through S): for THIS game the
    // Shapley value has the exact closed form credit(channel) =
    // Σ_converted-users 1/|channels touched| — each user's unit of
    // credit splits evenly over their distinct non-purchase
    // touchpoints (the uniform split IS the Shapley solution, not an
    // approximation). Per-user shares are µ-snapped longs so the
    // channel rollup is order-free. One user-grain agg (collect_set
    // bounded by |event types|), one channel rollup.
    "q_shapley_attrib" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_sort(collect_set(when(col("event_type") =!= "purchase",
            col("event_type")))).as("channels"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        .filter(col("converted") === 1 && size(col("channels")) > 0)
        .withColumn("share_u",
          round(lit(1e6) / size(col("channels"))).cast("long"))
      val credit = users
        .select(explode(col("channels")).as("channel"), col("share_u"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_users"), sum("share_u").as("cr_u"))
        .localCheckpoint(eager = true) // bounded |channels| rows
      val tot = credit.agg(sum("cr_u").as("tot_u"))
      credit.crossJoin(broadcast(tot))
        .select(col("channel"), col("n_users"),
          round(col("cr_u") / lit(1e6), 4).as("credit"),
          round(col("cr_u") / col("tot_u"), 6).as("share"))
        .orderBy("channel")
    }),

    // Difference-in-differences estimator (the canonical natural-
    // experiment readout): treatment = even user_id, post-period =
    // timestamps past the exact µs midpoint of the observed span, the
    // four (group, period) cell means in exact centi-long/count
    // ratios, and DiD = (T̄post − T̄pre) − (C̄post − C̄pre) written in
    // one fixed association so both engines evaluate the identical
    // double sequence. One partial agg to 4 cells; the scalar span
    // row broadcasts.
    "q_did_estimator" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          round(col("value") * 100).cast("long").as("v_c"))
      val span = ev.agg(min("t_us").as("mn"), max("t_us").as("mx"))
        .withColumn("mid", expr("(mn + mx) div 2"))
      val cells = ev.crossJoin(broadcast(span))
        .withColumn("treated", col("user_id") % 2 === 0)
        .withColumn("post", col("t_us") >= col("mid"))
        .groupBy("treated", "post")
        .agg(count(lit(1)).as("n"), sum("v_c").as("sc"))
        .withColumn("mean_raw", col("sc") / col("n") / lit(100.0))
        .localCheckpoint(eager = true) // 4 cells; feeds rows + the scalar
      val did = cells.agg(
        ((max(when(col("treated") && col("post"), col("mean_raw")))
          - max(when(col("treated") && !col("post"), col("mean_raw"))))
          - (max(when(!col("treated") && col("post"), col("mean_raw")))
            - max(when(!col("treated") && !col("post"), col("mean_raw")))))
          .as("did_raw"))
      cells.crossJoin(broadcast(did))
        .select(col("treated"), col("post"), col("n"),
          round(col("mean_raw"), 4).as("mean_v"),
          round(col("did_raw"), 4).as("did"))
        .orderBy("treated", "post")
    }),

    // Hour-of-day × day-of-week seasonality heatmap per the session's
    // UTC clock — one partial agg, bounded 168-cell output. (Spark's
    // dayofweek is 1-based Sun..Sat; emitted 0-based to match the
    // DuckDB convention.)
    "q_seasonality_profile" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy((dayofweek(col("ts")) - 1).as("dow"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_val"))
        .orderBy("dow", "hr")),

    // Density-based anomaly scoring on the q_grid_cluster lattice:
    // each point's score is -ln(its cell's density share) — rare
    // cells are anomalous — and the 20 most anomalous points surface
    // via TakeOrdered (no global sort materialized). One corpus scan
    // builds the bounded cell table; the probe join back is a
    // broadcast.
    "q_isolation_grid" -> ((s, d) => {
      val pts = Tables.events(s, d)
        .select(col("event_id"),
          floor(col("value") / 20).cast("int").as("cx"),
          floor(get_json_object(col("props"), "$.k").cast("int") / 10)
            .cast("int").as("cy"))
      val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true)
      val tot = cells.agg(sum("n").as("nn"))
      val scored = cells.crossJoin(broadcast(tot))
        .withColumn("score", round(-log(col("n") / col("nn")), 6))
      pts.join(broadcast(scored), Seq("cx", "cy"))
        .select("event_id", "cx", "cy", "n", "score")
        .orderBy(col("score").desc, col("event_id"))
        .limit(20)
    }),

    // View→purchase conversion-lag histogram: one per-user carry
    // window (last preceding view, O(1) state) feeds an hour-bucketed
    // rollup; purchases with no prior view land in bucket -1. The
    // marketing-funnel latency profile, computed in one corpus pass.
    "q_conversion_lag" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("lv_us",
          last(when(col("event_type") === "view", col("ts_us")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("lag_hours",
          when(col("lv_us").isNull, lit(-1L))
            .otherwise(expr("(ts_us - lv_us) div 3600000000")))
        .groupBy("lag_hours").agg(count(lit(1)).as("n_purchases"))
        .orderBy("lag_hours")
    }),

    // Holt's double exponential smoothing (level + trend) over the
    // daily series — the adaptive complement to q_forecast_naive and
    // the trend view q_ewma lacks. The corpus collapses to the bounded
    // daily rollup in exact integer µ-units (q_cusum_drift lesson), so
    // the recursive (l, b) fold runs over IDENTICAL doubles in both
    // engines; α=0.5, β=0.3; the fold itself is one aggregate() over
    // the ≤|days| array — calendar-bounded, the sanctioned bounded-
    // series shape (at 100 TB the daily rollup is still ≤ 36k rows a
    // century). One-step-ahead forecast emitted per day (null on day
    // 1, which seeds the state).
    "q_holt_winters" -> ((s, d) => {
      val v = "(CAST(x.su AS DOUBLE) / 1000000.0D)"
      val lExpr = s"0.5D * $v + 0.5D * (acc.l + acc.b)"
      val bExpr = s"0.3D * (($lExpr) - acc.l) + 0.7D * acc.b"
      val v1 = "(CAST(element_at(arr, 1).su AS DOUBLE) / 1000000.0D)"
      val v2 = "(CAST(element_at(arr, 2).su AS DOUBLE) / 1000000.0D)"
      val fold =
        s"""CASE WHEN size(arr) < 2 THEN
           |  CAST(array() AS array<struct<d: date, v: double, l: double, tr: double, fc: double>>)
           |ELSE
           |  aggregate(
           |    slice(arr, 2, size(arr) - 1),
           |    named_struct(
           |      'l', $v1, 'b', $v2 - $v1,
           |      'out', array(named_struct('d', element_at(arr, 1).d,
           |        'v', $v1, 'l', $v1, 'tr', $v2 - $v1,
           |        'fc', CAST(NULL AS DOUBLE)))),
           |    (acc, x) -> named_struct(
           |      'l', $lExpr,
           |      'b', $bExpr,
           |      'out', concat(acc.out, array(named_struct('d', x.d,
           |        'v', $v, 'l', $lExpr, 'tr', $bExpr,
           |        'fc', acc.l + acc.b)))),
           |    a -> a.out)
           |END""".stripMargin
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("su"))
        .agg(array_sort(collect_list(struct(col("d"), col("su")))).as("arr"))
        .select(explode(expr(fold)).as("r"))
        .select(col("r.d").as("d"), round(col("r.v"), 4).as("actual"),
          round(col("r.l"), 4).as("level"), round(col("r.tr"), 4).as("trend"),
          round(col("r.fc"), 4).as("forecast"))
        .orderBy("d")
    }),

    // Seasonal-naive forecast backtest: predict each day's total by
    // the same weekday one week earlier, score per-day APE — the
    // baseline every forecasting system must beat, evaluated entirely
    // on the bounded daily rollup (one corpus scan).
    "q_forecast_naive" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(round(sum("value"), 4).as("actual"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      daily
        .withColumn("forecast", lag("actual", 7).over(w))
        .filter(col("forecast").isNotNull)
        .withColumn("ape",
          round(abs(col("actual") - col("forecast")) / col("actual"), 6))
        .orderBy("d")
    }),

    // Clickstream path mining: the top-10 3-step event-type paths
    // (two lead windows per user — one sort — then a partial-agg
    // count and TakeOrdered). The n-gram generalization of
    // q_markov_transition's 1-step matrix.
    "q_path_mining" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(10)
    }),

    // Calibration / reliability diagram with ECE: `value`/200 as the
    // pseudo-probability, 10 fixed-width bins, per-bin predicted-vs-
    // actual purchase rate plus each bin's weighted ECE contribution
    // — the model-trust eval beside q_auc (discrimination) and
    // q_decile_lift (ranking). One partial agg; bin algebra on the
    // bounded bin table.
    "q_calibration_bins" -> ((s, d) => {
      val binned = Tables.events(s, d)
        .withColumn("pred", least(col("value") / 200.0, lit(0.999999)))
        .withColumn("bin", floor(col("pred") * 10).cast("int"))
        .withColumn("y",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), avg("pred").as("avg_pred"),
          avg("y").as("actual"))
        .localCheckpoint(eager = true)
      val tot = binned.agg(sum("n").as("nn"))
      binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"),
          round(col("avg_pred"), 6).as("avg_pred"),
          round(col("actual"), 6).as("actual_rate"),
          round(abs(col("avg_pred") - col("actual"))
            * col("n") / col("nn"), 6).as("ece_part"))
        .orderBy("bin")
    }),

    // Longest consecutive-active-day streak per user — the
    // gaps-and-islands classic at the daily grain (vs q_session_gaps'
    // time-gap sessions): island id = date − row_number days, so one
    // per-user window + two rollups find every user's best streak.
    "q_streak_detect" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      days
        .withColumn("grp", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("streak_start"))
        .groupBy("user_id")
        .agg(max(struct(col("len"), col("streak_start"))).as("best"))
        .select(col("user_id"), col("best.len").as("longest_streak"),
          col("best.streak_start"))
        .orderBy("user_id")
    }),

    // Cohort LTV matrix (q_retention_cohort's revenue complement):
    // weekly signup cohorts × week offset, per-user cumulative
    // purchase revenue — the unit-economics curve. Same date
    // conventions as retention (week-truncated, tz-free string key);
    // cumulative sums run over the bounded cohort × offset rollup.
    "q_cohort_ltv" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val first = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .groupBy("user_id").agg(min("wk").as("cohort"))
        .localCheckpoint(eager = true) // bounded users, referenced twice
      val sizes = first.groupBy("cohort").agg(countDistinct("user_id").as("n_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(first, "user_id")
        .select(col("cohort"),
          (datediff(date_trunc("week", col("ts")), col("cohort")) / 7)
            .cast("int").as("week_offset"),
          col("value"))
        .groupBy("cohort", "week_offset").agg(sum("value").as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort").orderBy("week_offset")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      rev.join(broadcast(sizes), "cohort")
        .withColumn("cum_ltv", round(sum("rev").over(w) / col("n_users"), 4))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"),
          round(col("rev"), 4).as("rev"), col("cum_ltv"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Right-to-be-forgotten audit (the DSR pass beside q_kanon and
    // q_pii_redact): a deterministic md5-bucket user set stands in
    // for the deletion-request list (~5% of users), events anti-join
    // it away, and the per-type before/after/removed audit a
    // compliance pipeline must file comes out of two partial aggs.
    "q_gdpr_forget" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val forget = ev.select("user_id").distinct()
        .filter(conv(substring(md5(col("user_id").cast("string")), 1, 4),
          16, 10).cast("int") % 20 === 0)
      val before = ev.groupBy("event_type").agg(count(lit(1)).as("n_before"))
      val after = ev.join(broadcast(forget), Seq("user_id"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n_after"))
      before.join(after, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_after"))
        .withColumn("n_removed", col("n_before") - col("n_after"))
        .orderBy("event_type")
    }),

    // Kaplan-Meier survival estimate of signup → first-purchase time
    // (right-censored at the corpus horizon — the honest treatment of
    // users who haven't purchased YET). Per-user durations from two
    // conditional min-aggs (one corpus scan), then the KM product
    // Π(1 − d/n) as exp(Σ ln) over the BOUNDED distinct-duration
    // grid. The time-to-event curve growth teams read.
    "q_survival_km" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val horizon = ev.agg(max(unix_micros(col("ts"))).as("hz"))
      val perUser = ev
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup",
            unix_micros(col("ts")))).as("su"))
        .filter(col("su").isNotNull)
        .join(ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), unix_micros(col("ts")).as("pu")),
          Seq("user_id"), "left")
        // min purchase STRICTLY after signup; a user whose purchases
        // all precede signup must stay (censored), hence no pre-filter
        .groupBy("user_id", "su")
        .agg(min(when(col("pu") > col("su"), col("pu"))).as("fp"))
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("fp").isNotNull,
            expr("(fp - su) div 86400000000")).as("dur_event"),
          when(col("fp").isNull,
            expr("(hz - su) div 86400000000")).as("dur_cens"))
      val grid = perUser
        .select(coalesce(col("dur_event"), col("dur_cens")).as("t"),
          col("dur_event").isNotNull.as("is_event"))
        .groupBy("t")
        .agg(sum(when(col("is_event"), 1L).otherwise(0L)).as("dd"),
          count(lit(1)).as("all_t"))
        .localCheckpoint(eager = true) // bounded day grid
      val tot = grid.agg(sum("all_t").as("n_total"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("t")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wIncl = org.apache.spark.sql.expressions.Window.orderBy("t")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.crossJoin(broadcast(tot))
        .withColumn("n_risk", col("n_total") - coalesce(sum("all_t").over(w), lit(0L)))
        // terminal day: dd == n_risk makes the factor 0 and ln blows
        // up — clamp to 1e-300 so exp(Σ ln) underflows to the exact 0
        // the KM curve means (identical clamp in the oracle)
        .withColumn("surv", round(exp(sum(
          log(greatest(lit(1.0) - col("dd") / col("n_risk"), lit(1e-300))))
          .over(wIncl)), 6))
        .filter(col("dd") > 0)
        .select(col("t").as("t_days"), col("n_risk"), col("dd").as("d"),
          col("surv"))
        .orderBy("t_days")
    }),

    // Lag-feature generation (the ML feature-engineering pass a
    // training pipeline materializes next to the label): per-user
    // lag-1/lag-2 values, trailing-3 rolling mean, and first
    // difference — all from ONE per-user window sort, honest nulls at
    // sequence heads. Output is corpus-grain (a feature table), the
    // one key family that intentionally emits per-row features.
    "q_lag_features" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wr = w.rowsBetween(-3, -1)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), round(col("value"), 4).as("v"),
          round(lag("value", 1).over(w), 4).as("lag1"),
          round(lag("value", 2).over(w), 4).as("lag2"),
          round(avg("value").over(wr), 4).as("rmean3"),
          round(col("value") - lag("value", 1).over(w), 4).as("delta1"))
        .orderBy("event_id")
    }),

    // Theil–Sen robust trend estimator (the outlier-proof alternative
    // to OLS every monitoring series deserves): slope = median of the
    // C(n,2) pairwise slopes of the µ-grid daily means, intercept =
    // median of the per-day residuals at that slope. The corpus-sized
    // work is ONE partial agg to the bounded daily grid; the 435-pair
    // self-join and both median picks run on ≤30 checkpointed rows.
    // Slopes are exact-long/exact-long IEEE divisions and the medians
    // are order-statistic picks (avg of the two middles), so every
    // value is bit-identical cross-engine.
    "q_theil_sen" -> ((s, d) => {
      val wd = org.apache.spark.sql.expressions.Window.orderBy("d")
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n"))
        .withColumn("i", row_number().over(wd))
        .select("d", "mmu", "i")
        .localCheckpoint(eager = true) // bounded daily series, 3 consumers
      val pairs = daily.select(col("mmu").as("ma"), col("i").as("ia"))
        .join(daily.select(col("mmu").as("mb"), col("i").as("ib")),
          col("ib") > col("ia"))
        .select(((col("mb") - col("ma")).cast("double")
          / (col("ib") - col("ia"))).as("slope_u"))
      val np = pairs.agg(count(lit(1)).as("np"))
      val ws = org.apache.spark.sql.expressions.Window.orderBy("slope_u")
      val med = pairs.crossJoin(broadcast(np))
        .withColumn("rn", row_number().over(ws))
        // lower+upper middle via INTEGER division (both parities correct)
        .filter(col("rn") === expr("(np + 1) div 2")
          || col("rn") === expr("(np + 2) div 2"))
        .agg(avg("slope_u").as("slope_u"), max("np").as("n_pairs"))
      val resid = daily.crossJoin(broadcast(med))
        .select(col("slope_u"), col("n_pairs"),
          (col("mmu") - col("slope_u") * col("i")).as("b_u"))
      val nd = daily.agg(count(lit(1)).as("nd"))
      // bounded grain: one residual row per day
      val wb = org.apache.spark.sql.expressions.Window.orderBy("b_u")
      resid.crossJoin(broadcast(nd))
        .withColumn("rb", row_number().over(wb))
        .filter(col("rb") === expr("(nd + 1) div 2")
          || col("rb") === expr("(nd + 2) div 2"))
        .agg(max("nd").as("n_days"), max("n_pairs").as("n_pairs"),
          round(max("slope_u") / 1e6, 6).as("slope_per_day"),
          round(avg("b_u") / 1e6, 6).as("intercept"))
    }),

    // Mann–Kendall trend test (the non-parametric is-it-drifting
    // gate): S = Σ_{i<j} sign(x_j − x_i) over the daily-mean series,
    // tie-corrected variance n(n−1)(2n+5)/18 − Σ t(t−1)(2t+5)/18, and
    // the continuity-corrected z. S and both variance terms are exact
    // longs (n ≤ 31), so z is one deterministic sqrt+division; the
    // pair enumeration is the same bounded self-join as q_theil_sen.
    "q_mann_kendall" -> ((s, d) => {
      val wd = org.apache.spark.sql.expressions.Window.orderBy("d")
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n"))
        .withColumn("i", row_number().over(wd))
        .select("mmu", "i")
        .localCheckpoint(eager = true)
      val sStat = daily.select(col("mmu").as("ma"), col("i").as("ia"))
        .join(daily.select(col("mmu").as("mb"), col("i").as("ib")),
          col("ib") > col("ia"))
        .agg(coalesce(sum(signum(col("mb") - col("ma")).cast("long")), lit(0L))
          .as("s_stat"))
      val nTies = daily.groupBy("mmu").agg(count(lit(1)).as("t"))
        .agg(count(lit(1)).as("ng"),
          coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
            lit(0L)).as("tie_term"))
      val nd = daily.agg(count(lit(1)).as("nd"))
      sStat.crossJoin(broadcast(nTies)).crossJoin(broadcast(nd))
        .withColumn("var_s",
          (col("nd") * (col("nd") - 1) * (col("nd") * 2 + 5)
            - col("tie_term")) / lit(18.0))
        .withColumn("z", when(col("s_stat") > 0,
            (col("s_stat") - 1) / sqrt(col("var_s")))
          .when(col("s_stat") < 0, (col("s_stat") + 1) / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
        .select(col("nd").as("n_days"), col("s_stat"),
          round(col("var_s"), 4).as("var_s"), round(col("z"), 4).as("z"),
          when(col("z") > 1.96, lit("increasing"))
            .when(col("z") < -1.96, lit("decreasing"))
            .otherwise(lit("no_trend")).as("trend"))
    }),

    // Spearman rank correlation between the daily mean value and the
    // daily mean props.k, per event type — the monotone-association
    // readout Pearson misses. Average ranks ride the doubled-rank
    // integer grid (2·minrank + ties − 1), every moment is an exact
    // long over ≤31 rows per type, and ρ is assembled algebraically
    // from those longs in ONE final expression — no streaming corr,
    // no partial-order dependence.
    "q_spearman_daily" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("sv"),
          sum(get_json_object(col("props"), "$.k").cast("long") * 1000000L)
            .as("sk"),
          count(lit(1)).as("n"))
        .withColumn("vmu", expr("sv div n"))
        .withColumn("kmu", expr("sk div n"))
      val we = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val rx = we.orderBy("vmu")
      val ry = we.orderBy("kmu")
      daily
        // doubled average rank: 2·minrank + ties − 1 (exact integers)
        .withColumn("r2x", lit(2) * rank().over(rx)
          + count(lit(1)).over(we.partitionBy("event_type", "vmu")) - 1)
        .withColumn("r2y", lit(2) * rank().over(ry)
          + count(lit(1)).over(we.partitionBy("event_type", "kmu")) - 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("r2x").as("sx"), sum("r2y").as("sy"),
          sum(col("r2x") * col("r2y")).as("sxy"),
          sum(col("r2x") * col("r2x")).as("sxx"),
          sum(col("r2y") * col("r2y")).as("syy"))
        .select(col("event_type"), col("n").as("n_days"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))), 6).as("spearman_rho"))
        .orderBy("event_type")
    }),

    // Page–Hinkley drift detector (the sequential mean-shift monitor
    // CUSUM's cousin): per day, the cumulative deviation of the daily
    // mean from its RUNNING mean minus tolerance δ, the running
    // minimum of that cumulative, and an alarm when the gap exceeds
    // λ. Every term is an exact µ-grid long (running mean via exact
    // integer division), so the alarm sequence cannot flap.
    "q_page_hinkley" -> ((s, d) => {
      // bounded grain: one row per day
      val wAll = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val deltaU = 1000000L // δ = 1.0
      val lambdaU = 5000000L // λ = 5.0
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n"))
        // bounded grain: one row per day
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("d")))
        .withColumn("cum", sum("mmu").over(wAll))
        .withColumn("rm", expr("cum div i"))
        .withColumn("term", col("mmu") - col("rm") - lit(deltaU))
        .withColumn("m", sum("term").over(wAll))
        .withColumn("mn", min("m").over(wAll))
        .withColumn("ph_u", col("m") - col("mn"))
        .select(col("d"), round(col("mmu") / 1e6, 4).as("mean_v"),
          round(col("ph_u") / 1e6, 4).as("ph"),
          (col("ph_u") > lambdaU).as("alarm"))
        .orderBy("d")
    }),

    // Cohen's kappa inter-rater agreement between two deterministic
    // binary labelers (value > 100 vs props.k > 50) per event type —
    // the label-quality audit before anyone trusts a weak-supervision
    // pair. po and pe derive from exact long counts in one partial
    // agg; kappa is a single deterministic expression per type.
    "q_cohens_kappa" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          (col("value") > 100).as("ra"),
          (get_json_object(col("props"), "$.k").cast("int") > 50).as("rb"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("ra"), 1L).otherwise(0L)).as("a1"),
          sum(when(col("rb"), 1L).otherwise(0L)).as("b1"),
          sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("agree"))
        .withColumn("po", col("agree").cast("double") / col("n"))
        .withColumn("pe",
          (col("a1") * col("b1") + (col("n") - col("a1"))
            * (col("n") - col("b1"))).cast("double") / (col("n") * col("n")))
        .select(col("event_type"), col("n"), round(col("po"), 6).as("po"),
          round(col("pe"), 6).as("pe"),
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)
            .as("kappa"))
        .orderBy("event_type"))
  ) ++ Map[String, (SparkSession, String) => DataFrame](

    // Isotonic regression (PAV fit) of the daily-mean series via the
    // minimax identity ŷᵢ = max_{k≤i} min_{j≥i} mean(y_k..y_j) — the
    // calibration/monotone-trend fit, expressed as pure relational
    // algebra instead of the sequential pool-adjacent-violators loop:
    // every segment mean is an exact-long prefix-sum difference over
    // ONE IEEE division. The lattice is O(n²) in the day count, not
    // n³: a suffix-min window per start k gives m(k,i)=min_{j≥i}avg,
    // and ŷᵢ = max_{k≤i} m(k,i) is one groupBy over the n² segment
    // rows — a 10-year daily series is 3650² ≈ 1.3·10⁷ rows, fine;
    // the corpus-sized work remains the single daily partial agg.
    "q_isotonic_fit" -> ((s, d) => {
      // bounded grain: one row per day
      val wd = org.apache.spark.sql.expressions.Window.orderBy("d")
      val wp = wd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 1e6).cast("long")).as("s_mu"),
          count(lit(1)).as("n"))
        .withColumn("mmu", expr("s_mu div n"))
        .withColumn("i", row_number().over(wd))
        .withColumn("pre", sum("mmu").over(wp))
        .localCheckpoint(eager = true) // bounded daily series, 3 legs
      // segment means over [k, j]: (pre_j − pre_{k−1}) / (j − k + 1)
      val segs = daily.select(col("i").as("j"), col("pre").as("pj"))
        .join(daily.select((col("i") + 1).as("k"), col("pre").as("pk1"))
          .union(daily.sparkSession.range(1, 2)
            .select(lit(1).as("k"), lit(0L).as("pk1"))),
          col("j") >= col("k"))
        .select(col("k"), col("j"),
          ((col("pj") - col("pk1")).cast("double")
            / (col("j") - col("k") + 1)).as("avg_u"))
      // suffix min over j within each start k: at row (k, j),
      // mn = min_{j'≥j} avg_u(k, j'); the row with j = i is m(k, i)
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("j").desc)
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      segs.withColumn("mn", min("avg_u").over(wk))
        // every (k ≤ i) contributes its m(k, i) row at j = i
        .groupBy(col("j").as("i")).agg(max("mn").as("yhat_u"))
        .join(daily.select(col("i"), col("d"), col("mmu")), "i")
        .select(col("d"), round(col("mmu") / 1e6, 4).as("mean_v"),
          round(col("yhat_u") / 1e6, 4).as("iso_fit"))
        .orderBy("d")
    }),

    // One-way ANOVA across event types (the is-the-metric-different
    // omnibus test): F and η² assembled algebraically from per-group
    // exact centi-long moments — each group's s²/n term is an exact
    // double (|s| ≤ ~1.2e9 centi at sf0.1, square < 2⁶³) snapped to
    // integer units before the bounded 5-term sums, so F cannot flap.
    "q_anova" -> ((s, d) => {
      val g = Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("v_c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("ng"), sum("v_c").as("sg"),
          sum(col("v_c") * col("v_c")).as("qg"))
        .localCheckpoint(eager = true) // bounded |types| rows
      val terms = g.select(col("ng"), col("sg"), col("qg"),
        round(col("sg").cast("double") * col("sg") / col("ng")).cast("long")
          .as("t_u"))
      terms
        .agg(count(lit(1)).as("k"), sum("ng").as("n"), sum("sg").as("s"),
          sum("qg").as("q"), sum("t_u").as("tb"))
        .withColumn("ssb",
          col("tb") - round(col("s").cast("double") * col("s") / col("n"))
            .cast("long"))
        .withColumn("ssw", col("q") - col("tb"))
        .withColumn("f", (col("ssb").cast("double") / (col("k") - 1))
          / (col("ssw").cast("double") / (col("n") - col("k"))))
        .select(col("k").as("k_groups"), col("n"),
          (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
          round(col("f"), 4).as("f_stat"),
          round(col("ssb").cast("double") / (col("ssb") + col("ssw")), 6)
            .as("eta_sq"))
    }),

    // Decision-stump information gain over a bounded threshold grid
    // (the feature-audit primitive a tree/feature-selection pipeline
    // runs): target = purchase events, candidate splits value < 10·b.
    // Counts collapse to the bounded decile-bucket grid first (ONE
    // partial agg over the corpus), prefix sums give every split's
    // exact left/right counts, and each entropy term µ-snaps to the
    // 1e9 grid — the argmax flag is therefore deterministic.
    "q_info_gain" -> ((s, d) => {
      val wb = org.apache.spark.sql.expressions.Window.orderBy("b")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val buckets = Tables.events(s, d)
        .select(floor(col("value") / 10).cast("long").as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .groupBy("b")
        .agg(count(lit(1)).as("nb"), sum("pos").as("pb"))
      // entropy of a (pos, n) split side on the 1e9 grid; 0·ln0 = 0
      def entU(p: Column, n: Column): Column = {
        val q1 = p.cast("double") / n
        val q0 = (n - p).cast("double") / n
        (when(p > 0, round(-q1 * log(q1) * 1e9).cast("long")).otherwise(0L)
          + when(n - p > 0, round(-q0 * log(q0) * 1e9).cast("long"))
            .otherwise(0L))
      }
      val tot = buckets.agg(sum("nb").as("n"), sum("pb").as("p"))
      buckets
        .withColumn("nl", sum("nb").over(wb))
        .withColumn("pl", sum("pb").over(wb))
        .crossJoin(broadcast(tot))
        .filter(col("nl") < col("n")) // right side must be non-empty
        .withColumn("t", (col("b") + 1) * 10)
        // explicit round() before the long snap: Spark CAST truncates
        // but DuckDB CAST rounds — round() is the cross-engine spelling
        .withColumn("ig_u", entU(col("p"), col("n"))
          - round(col("nl").cast("double") / col("n")
            * entU(col("pl"), col("nl"))).cast("long")
          - round((col("n") - col("nl")).cast("double") / col("n")
            * entU(col("p") - col("pl"), col("n") - col("nl"))).cast("long"))
        .withColumn("best",
          col("ig_u") === max("ig_u").over(
            org.apache.spark.sql.expressions.Window
              .rowsBetween(Long.MinValue, Long.MaxValue)))
        .select(col("t").as("threshold"), col("nl").as("n_left"),
          col("pl").as("pos_left"), round(col("ig_u") / 1e9, 6).as("info_gain"),
          col("best").as("is_best"))
        .orderBy("threshold")
    })
  )

  /** Shared bounded-matrix Markov fixpoint (q_markov_stationary's
    * derivation, factored for the entropy-rate consumer): collects
    * the |types|² transition cells (sanctioned bounded statistic) and
    * runs 20 exact-µ-grid power-iteration rounds driver-side.
    * @return (sorted states, n_ij, n_i, π_u on the 1e9 grid) */
  private def markovFixpoint(s: SparkSession, d: String)
      : (Array[String], Array[Array[Long]], Array[Long], Array[Long]) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .withColumn("next", lead("event_type", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next"))
      .agg(count(lit(1)).as("n"))
      .collect() // bounded: |event types|² cells
    val states = (trans.map(_.getString(0)) ++ trans.map(_.getString(1)))
      .distinct.sorted
    val idx = states.zipWithIndex.toMap
    val nij = Array.ofDim[Long](states.length, states.length)
    trans.foreach(r =>
      nij(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val ni = nij.map(_.sum)
    var pi = Array.fill(states.length)(1000000000L / states.length)
    for (_ <- 1 to 20) {
      val nxt = Array.fill(states.length)(0L)
      for (i <- states.indices; j <- states.indices if ni(i) > 0)
        nxt(j) += math.floor(pi(i).toDouble * nij(i)(j) / ni(i) + 0.5).toLong
      pi = nxt
    }
    (states, nij, ni, pi)
  }

  /** Shared DuckDB prefix for the Markov-chain keys: the transition
    * matrix + 20 unrolled MATERIALIZED power-iteration rounds on the
    * exact µ-grid (mirrors q_markov_stationary's driver-side loop
    * verbatim; consumed by the stationary and entropy-rate oracles). */
  private val markovChainSql: String = {
    val rounds = (1 to 20).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT tr.next AS s,
         |    CAST(SUM(CAST(ROUND(CAST(p.pi AS DOUBLE) * tr.n / tot.nt)
         |      AS BIGINT)) AS BIGINT) AS pi
         |  FROM p${k - 1} p
         |  JOIN tr ON tr.cur = p.s
         |  JOIN tot ON tot.cur = p.s
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH tr AS (
       |  SELECT cur, next, COUNT(*) AS n FROM (
       |    SELECT event_type AS cur,
       |      lead(event_type) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS next
       |    FROM events)
       |  WHERE next IS NOT NULL GROUP BY 1, 2),
       |tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS nt FROM tr GROUP BY 1),
       |states AS (SELECT DISTINCT cur AS s FROM tr
       |           UNION SELECT DISTINCT next FROM tr),
       |ns AS (SELECT COUNT(*) AS k FROM states),
       |p0 AS (SELECT s, CAST(1000000000 // k AS BIGINT) AS pi
       |       FROM states CROSS JOIN ns),
       |$rounds""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_ohlc_resample" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', ts) AS bucket, event_type, value, ts, event_id
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY bucket, event_type
        |                       ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY bucket, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM b)
        |SELECT bucket, event_type,
        |  ROUND(MAX(CASE WHEN ra = 1 THEN value END), 4) AS open,
        |  ROUND(MAX(value), 4) AS high,
        |  ROUND(MIN(value), 4) AS low,
        |  ROUND(MAX(CASE WHEN rd = 1 THEN value END), 4) AS close,
        |  COUNT(*) AS n,
        |  ROUND(SUM(value), 4) AS volume
        |FROM r GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,

    "q_attribution_last" ->
      """WITH a AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
        |  FROM events)
        |SELECT COALESCE(src, 'direct') AS channel,
        |  COUNT(*) AS n_purchases, ROUND(SUM(value), 4) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_psi_drift" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'a' ELSE 'b' END AS half,
        |    LEAST(CAST(FLOOR(value / 10) AS INT), 19) AS bin
        |  FROM events),
        |c AS (SELECT event_type, half, bin, COUNT(*) AS n FROM e GROUP BY 1, 2, 3),
        |t AS (SELECT event_type, half, SUM(n) AS tot FROM c GROUP BY 1, 2),
        |p AS (SELECT c.event_type, c.half, c.bin, c.n * 1.0 / t.tot AS share
        |      FROM c JOIN t USING (event_type, half)),
        |a AS (SELECT event_type, bin, share AS pa FROM p WHERE half = 'a'),
        |b AS (SELECT event_type, bin, share AS pb FROM p WHERE half = 'b'),
        |j AS (SELECT COALESCE(a.event_type, b.event_type) AS event_type,
        |        COALESCE(pa, 1e-4) AS qa, COALESCE(pb, 1e-4) AS qb
        |      FROM a FULL OUTER JOIN b
        |        ON a.event_type = b.event_type AND a.bin = b.bin)
        |SELECT event_type, COUNT(*) AS n_bins,
        |  ROUND(SUM((qa - qb) * ln(qa / qb)), 4) AS psi
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_abtest_ttest" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
        |    var_samp(value) AS v
        |  FROM events GROUP BY 1)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  a.n AS n_a, b.n AS n_b,
        |  ROUND((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat
        |FROM st a JOIN st b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    "q_seq_dedup" ->
      """WITH r AS (
        |  SELECT user_id,
        |    CASE WHEN lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(is_new) AS BIGINT) AS n_runs,
        |  ROUND(SUM(is_new) * 1.0 / COUNT(*), 6) AS compress_ratio
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_burst_detect" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, AVG(n) AS mu, stddev_pop(n) AS sigma
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.bucket, h.n,
        |  ROUND((h.n - st.mu) / st.sigma, 4) AS z
        |FROM h JOIN st USING (event_type)
        |WHERE ROUND((h.n - st.mu) / st.sigma, 4) > 2.0
        |ORDER BY event_type, bucket""".stripMargin,

    "q_moment_stats" ->
      """WITH st AS (
        |  SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sigma,
        |    COUNT(*) AS n
        |  FROM events GROUP BY event_type),
        |z AS (
        |  SELECT e.event_type, (e.value - st.mu) / st.sigma AS z, st.n
        |  FROM events e JOIN st USING (event_type))
        |SELECT event_type, MIN(n) AS n,
        |  ROUND(AVG(z * z * z), 4) AS skewness,
        |  ROUND(AVG(z * z * z * z) - 3.0, 4) AS excess_kurtosis
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type,
        |    ROUND(quantile_cont(value, 0.05) * 10000) / 10000 AS lo,
        |    ROUND(quantile_cont(value, 0.99) * 10000) / 10000 AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, MAX(b.lo) AS lo, MAX(b.hi) AS hi,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE e.value < b.lo) AS n_clip_lo,
        |  COUNT(*) FILTER (WHERE e.value > b.hi) AS n_clip_hi,
        |  CAST(SUM(CAST(ROUND(least(greatest(e.value, b.lo), b.hi) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS sum_w_micro
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, ROUND(quantile_cont(value, 0.5) * 10000) / 10000 AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, MAX(m.med) AS med,
        |    ROUND(quantile_cont(abs(e.value - m.med), 0.5) * 10000) / 10000 AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type),
        |outl AS (
        |  SELECT e.event_type, COUNT(*) AS n_out, SUM(e.event_id) AS s
        |  FROM events e JOIN mad USING (event_type)
        |  WHERE abs(e.value - med) > 3 * mad GROUP BY 1)
        |SELECT event_type, med, mad, COALESCE(n_out, 0) AS n_out,
        |  CAST(COALESCE(s, 0) AS BIGINT) AS sum_out_id
        |FROM mad LEFT JOIN outl USING (event_type) ORDER BY event_type""".stripMargin,

    "q_ewma" ->
      """WITH ev AS (
        |  SELECT event_type, ts FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
        |agg AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS wstart, COUNT(*) AS n
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-02 23:00:00', INTERVAL '1 hour')) AS wstart
        |  FROM (SELECT DISTINCT event_type FROM ev)),
        |j AS (
        |  SELECT g.event_type, g.wstart,
        |    CAST((epoch_us(g.wstart) - 1704067200000000) / 3600000000 AS INT) AS i,
        |    COALESCE(a.n, 0) AS n
        |  FROM grid g LEFT JOIN agg a USING (event_type, wstart))
        |SELECT event_type, wstart, n,
        |  ROUND(power(0.8, i) * SUM(CASE WHEN i = 0 THEN CAST(n AS DOUBLE)
        |      ELSE 0.2 * n * power(0.8, -i) END)
        |    OVER (PARTITION BY event_type ORDER BY i
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000) / 10000
        |    AS ewma
        |FROM j ORDER BY event_type, wstart""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT ev.user_id, v.t1, MIN(us) AS t2 FROM ev
        |      JOIN v ON ev.user_id = v.user_id AND ev.us > v.t1
        |      WHERE event_type = 'click' GROUP BY ev.user_id, v.t1),
        |p AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev
        |      JOIN c ON ev.user_id = c.user_id AND ev.us > c.t2
        |      WHERE event_type = 'purchase' GROUP BY ev.user_id)
        |SELECT v.user_id, v.t1, c.t2, p.t3,
        |  1 + CASE WHEN c.t2 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN p.t3 IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q_gap_stats" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
        |  MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
        |  ROUND(CAST(SUM(gap) AS BIGINT) / COUNT(*) / 1000000.0, 6) AS avg_gap_sec
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rolling_median" ->
      """SELECT event_id, event_type, value,
        |  ROUND(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) * 10000) / 10000 AS med
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sliding_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |x AS (
        |  SELECT du.day + k AS day, du.user_id
        |  FROM du CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) t(k))
        |SELECT x.day, COUNT(DISTINCT x.user_id) AS n_active_7d
        |FROM x JOIN days ON x.day = days.day
        |GROUP BY x.day ORDER BY x.day""".stripMargin,

    "q_retention_cohort" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |first AS (SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cohort, wk.wk) / 7 AS INT) AS week_offset,
        |  COUNT(DISTINCT wk.user_id) AS n_active
        |FROM wk JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
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
        |FROM j ORDER BY event_type, wstart""".stripMargin,

    "q_auc" ->
      """WITH ps AS (
        |  SELECT value, COUNT(*) AS n,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
        |  FROM events GROUP BY value),
        |acc AS (
        |  SELECT pos, n - pos AS neg,
        |    COALESCE(SUM(n - pos) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM ps)
        |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(neg) AS BIGINT) AS n_neg,
        |  ROUND(SUM(pos * (cumneg + neg / 2.0))
        |    / (SUM(pos) * 1.0 * SUM(neg)), 6) AS auc
        |FROM acc""".stripMargin,

    "q_chisq_indep" ->
      """WITH obs AS (
        |  SELECT event_type, date_part('day', ts) % 7 AS dow, COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, SUM(o) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT dow, SUM(o) AS ct FROM obs GROUP BY 1),
        |tt AS (SELECT SUM(o) AS nn FROM obs)
        |SELECT COUNT(*) AS n_cells,
        |  ROUND(SUM(pow(obs.o - rt.rt * 1.0 * ct.ct / tt.nn, 2)
        |    / (rt.rt * 1.0 * ct.ct / tt.nn)), 4) AS chi2
        |FROM obs JOIN rt USING (event_type) JOIN ct USING (dow)
        |CROSS JOIN tt""".stripMargin,

    "q_markov_transition" ->
      """WITH p AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next
        |  FROM events),
        |c AS (SELECT cur, next, COUNT(*) AS n FROM p
        |      WHERE next IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.cur, c.next, c.n, ROUND(c.n * 1.0 / t.tot, 6) AS p
        |FROM c JOIN t USING (cur) ORDER BY cur, next""".stripMargin,

    "q_acf" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS x
        |  FROM events GROUP BY 1),
        |l AS (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS lag_n)
        |SELECT l.lag_n, COUNT(*) AS n_pairs, ROUND(corr(a.x, b.x), 4) AS acf
        |FROM daily a CROSS JOIN l JOIN daily b ON a.d + l.lag_n = b.d
        |GROUP BY l.lag_n ORDER BY lag_n""".stripMargin,

    "q_stl_trend" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS x
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT d, x, COUNT(*) OVER win AS nw, AVG(x) OVER win AS ma
        |  FROM daily
        |  WINDOW win AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT d, ROUND(x, 4) AS x,
        |  CASE WHEN nw = 7 THEN ROUND(ma, 4) END AS trend,
        |  CASE WHEN nw = 7 THEN ROUND(x - ma, 4) END AS resid
        |FROM w ORDER BY d""".stripMargin,

    "q_grid_cluster" ->
      """WITH RECURSIVE cells AS (
        |  SELECT CAST(FLOOR(value / 20) AS INT) AS cx,
        |    CAST(FLOOR(CAST(json_extract(props, '$.k') AS INT) / 10) AS INT)
        |      AS cy,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT SUM(n) AS nn FROM cells),
        |dense AS (
        |  SELECT cx, cy, n,
        |    xor(CAST(cx AS BIGINT) * 4294967296,
        |        CAST(cy AS BIGINT) & 4294967295) AS id
        |  FROM cells CROSS JOIN tot WHERE n >= nn * 0.002),
        |sym AS (
        |  SELECT a.id AS src, b.id AS dst FROM dense a JOIN dense b
        |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |    AND a.id <> b.id),
        |reach AS (
        |  SELECT id AS src, id AS dst FROM dense
        |  UNION
        |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
        |SELECT d.cx, d.cy, d.n, l.cluster
        |FROM dense d JOIN (
        |  SELECT src, MIN(dst) AS cluster FROM reach GROUP BY src) l
        |  ON l.src = d.id
        |ORDER BY cx, cy""".stripMargin,

    "q_ks_test" ->
      """WITH pv AS (
        |  SELECT value,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY value),
        |acc AS (
        |  SELECT
        |    SUM(a) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    SUM(b) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
        |  FROM pv),
        |t AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM pv)
        |SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
        |  ROUND(MAX(abs(ca * 1.0 / t.n1 - cb * 1.0 / t.n2)), 6) AS d,
        |  ROUND(MAX(abs(ca * 1.0 / t.n1 - cb * 1.0 / t.n2)), 6) >
        |    ROUND(1.358 * sqrt((t.n1 + t.n2) * 1.0 / (t.n1 * t.n2)), 6)
        |    AS reject
        |FROM acc CROSS JOIN t GROUP BY t.n1, t.n2""".stripMargin,

    "q_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS su
        |  FROM events GROUP BY 1),
        |o AS (SELECT d, CAST(su AS DOUBLE) / 1000000.0 AS v,
        |        row_number() OVER (ORDER BY d) AS t FROM daily),
        |init AS (SELECT o1.d, o1.v, o1.v AS l, o2.v - o1.v AS b,
        |           CAST(NULL AS DOUBLE) AS fc, 1 AS t
        |         FROM o o1, o o2 WHERE o1.t = 1 AND o2.t = 2),
        |hw AS (
        |  SELECT * FROM init
        |  UNION ALL
        |  SELECT o.d, o.v,
        |    0.5 * o.v + 0.5 * (hw.l + hw.b) AS l,
        |    0.3 * ((0.5 * o.v + 0.5 * (hw.l + hw.b)) - hw.l) + 0.7 * hw.b AS b,
        |    hw.l + hw.b AS fc,
        |    o.t
        |  FROM hw JOIN o ON o.t = hw.t + 1)
        |SELECT d, ROUND(v, 4) AS actual, ROUND(l, 4) AS level,
        |  ROUND(b, 4) AS trend, ROUND(fc, 4) AS forecast
        |FROM hw ORDER BY d""".stripMargin,

    "q_cusum_drift" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT d, s_mu // n AS mmu FROM daily),
        |acc AS (
        |  SELECT d, mmu,
        |    SUM(mmu) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY d) AS i,
        |    SUM(mmu) OVER () AS tot,
        |    COUNT(*) OVER () AS nd
        |  FROM m),
        |c AS (SELECT d, mmu, nd, nd * cum - i * tot AS cs FROM acc),
        |p AS (SELECT MAX(abs(cs)) AS peak FROM c)
        |SELECT d, ROUND(mmu / 1000000.0, 4) AS mean_v,
        |  ROUND(cs / (nd * 1000000.0), 4) AS cusum,
        |  abs(cs) = peak AS is_peak
        |FROM c CROSS JOIN p ORDER BY d""".stripMargin,

    "q_tail_index" ->
      """WITH top AS (
        |  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v_c, event_id
        |  FROM events ORDER BY v_c DESC, event_id LIMIT 101),
        |p AS (SELECT v_c AS pivot_c FROM top
        |      ORDER BY v_c, event_id LIMIT 1),
        |t AS (
        |  SELECT v_c, pivot_c,
        |    CAST(ROUND(ln(CAST(v_c AS DOUBLE) / pivot_c) * 1e6) AS BIGINT)
        |      AS t_u
        |  FROM top CROSS JOIN p WHERE v_c > pivot_c)
        |SELECT COUNT(*) AS k_used, MIN(pivot_c / 100.0) AS x_k1,
        |  ROUND(COUNT(*) / (SUM(t_u) / 1e6), 4) AS hill_alpha
        |FROM t""".stripMargin,

    "q_peak_detect" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT d, CAST(s_mu // n AS BIGINT) AS mmu FROM daily),
        |x AS (
        |  SELECT d, mmu,
        |    lag(mmu) OVER (ORDER BY d) AS prev,
        |    lead(mmu) OVER (ORDER BY d) AS nxt,
        |    MIN(mmu) OVER (ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmin,
        |    MIN(mmu) OVER (ORDER BY d
        |      ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmin
        |  FROM m),
        |p AS (
        |  SELECT d, mmu,
        |    prev IS NOT NULL AND nxt IS NOT NULL
        |      AND mmu > prev AND mmu > nxt AS is_peak,
        |    lmin, rmin
        |  FROM x)
        |SELECT d, ROUND(mmu / 1e6, 4) AS mean_v, is_peak,
        |  CASE WHEN is_peak
        |    THEN ROUND((mmu - GREATEST(lmin, rmin)) / 1e6, 4) END
        |    AS prominence
        |FROM p ORDER BY d""".stripMargin,

    "q_stl_strength" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(ROUND(SUM(value) * 1e2) AS BIGINT) AS x_u
        |  FROM events GROUP BY 1),
        |ma AS (
        |  SELECT d, x_u,
        |    COUNT(*) OVER w AS nw,
        |    CAST(ROUND(AVG(x_u) OVER w) AS BIGINT) AS t_u
        |  FROM daily
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |comp AS (
        |  SELECT d, x_u, t_u, x_u - t_u AS detr_u,
        |    dayofweek(d) AS dow
        |  FROM ma WHERE nw = 7),
        |season AS (
        |  SELECT dow, CAST(ROUND(AVG(detr_u)) AS BIGINT) AS s_u
        |  FROM comp GROUP BY 1),
        |full_ AS (
        |  SELECT comp.*, s_u, detr_u - s_u AS r_u,
        |    t_u + (detr_u - s_u) AS tr_u, s_u + (detr_u - s_u) AS sr_u
        |  FROM comp JOIN season USING (dow)),
        |v AS (
        |  SELECT COUNT(*) AS n_days,
        |    (SUM(r_u * r_u) - CAST(SUM(r_u) AS DOUBLE) * SUM(r_u) / COUNT(*))
        |      / (COUNT(*) - 1) AS vr,
        |    (SUM(tr_u * tr_u) - CAST(SUM(tr_u) AS DOUBLE) * SUM(tr_u)
        |      / COUNT(*)) / (COUNT(*) - 1) AS vtr,
        |    (SUM(sr_u * sr_u) - CAST(SUM(sr_u) AS DOUBLE) * SUM(sr_u)
        |      / COUNT(*)) / (COUNT(*) - 1) AS vsr
        |  FROM full_)
        |SELECT n_days,
        |  ROUND(GREATEST(0.0, 1.0 - vr / vtr), 6) AS trend_strength,
        |  ROUND(GREATEST(0.0, 1.0 - vr / vsr), 6) AS seasonal_strength
        |FROM v""".stripMargin,

    // the transition matrix + 20 unrolled materialized power-iteration
    // rounds on the same µ-grid arithmetic
    "q_markov_stationary" ->
      s"""$markovChainSql
         |SELECT s AS state, ROUND(pi / 1e9, 6) AS pi
         |FROM p20 ORDER BY state""".stripMargin,

    // the same 20-round chain, then the per-cell entropy rollup
    "q_entropy_rate" ->
      s"""$markovChainSql,
         |h AS (
         |  SELECT CAST(SUM(CAST(ROUND(-CAST(p.pi AS DOUBLE)
         |      * (tr.n * 1.0 / tot.nt) * ln(tr.n * 1.0 / tot.nt))
         |      AS BIGINT)) AS BIGINT) AS h_u,
         |    COUNT(*) AS n_cells
         |  FROM p20 p
         |  JOIN tr ON tr.cur = p.s
         |  JOIN tot ON tot.cur = p.s)
         |SELECT n_cells, ROUND(h_u / 1e9, 6) AS entropy_rate_nats
         |FROM h""".stripMargin,

    "q_power_analysis" ->
      """WITH a AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sv,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
        |      * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sq
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type, n, sv / n AS mean_c,
        |    (sq - CAST(sv AS DOUBLE) * sv / n) / (n - 1) AS var_c
        |  FROM a),
        |f AS (
        |  SELECT event_type, n, mean_c, var_c, mean_c * 0.05 AS delta_c,
        |    CAST(CEIL(2.0 * (1.96 + 0.8416) * (1.96 + 0.8416) * var_c
        |      / (mean_c * 0.05 * (mean_c * 0.05))) AS BIGINT) AS n_req
        |  FROM m)
        |SELECT event_type, n,
        |  ROUND(mean_c / 100.0, 4) AS mean_v,
        |  ROUND(sqrt(var_c) / 100.0, 4) AS sd_v,
        |  ROUND(delta_c / 100.0, 4) AS mde_abs,
        |  n_req AS n_per_arm,
        |  n_req * 2 <= n AS feasible_now
        |FROM f ORDER BY event_type""".stripMargin,

    "q_ab_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t_us,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |span AS (SELECT CAST((MIN(t_us) + MAX(t_us)) // 2 AS BIGINT) AS mid
        |         FROM ev),
        |u AS (
        |  SELECT user_id, user_id % 2 = 0 AS t,
        |    CAST(SUM(CASE WHEN t_us < mid THEN v_c ELSE 0 END) AS BIGINT)
        |      AS x,
        |    CAST(SUM(CASE WHEN t_us >= mid THEN v_c ELSE 0 END) AS BIGINT)
        |      AS y
        |  FROM ev CROSS JOIN span GROUP BY 1, 2),
        |fit AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM u),
        |th AS (
        |  SELECT (sxy - CAST(sx AS DOUBLE) * sy / n)
        |      / (sxx - CAST(sx AS DOUBLE) * sx / n) AS theta,
        |    sx / n AS xbar
        |  FROM fit),
        |g AS (
        |  SELECT t, COUNT(*) AS ng, CAST(SUM(x) AS BIGINT) AS gx,
        |    CAST(SUM(y) AS BIGINT) AS gy, CAST(SUM(x * y) AS BIGINT) AS gxy,
        |    CAST(SUM(x * x) AS BIGINT) AS gxx,
        |    CAST(SUM(y * y) AS BIGINT) AS gyy
        |  FROM u GROUP BY 1),
        |m AS (
        |  SELECT t, ng, gx, gy, theta, xbar,
        |    (gyy - CAST(gy AS DOUBLE) * gy / ng) / (ng - 1) AS var_y,
        |    (gxy - CAST(gx AS DOUBLE) * gy / ng) / (ng - 1) AS cov_g,
        |    (gxx - CAST(gx AS DOUBLE) * gx / ng) / (ng - 1) AS var_x
        |  FROM g CROSS JOIN th)
        |SELECT t AS treated, ng AS n_users,
        |  ROUND(gy / ng / 100.0, 4) AS mean_y,
        |  ROUND((gy / ng - theta * (gx / ng - xbar)) / 100.0, 4)
        |    AS mean_y_adj,
        |  ROUND(theta, 4) AS theta,
        |  ROUND(1.0 - (var_y - 2.0 * theta * cov_g
        |    + theta * theta * var_x) / var_y, 6) AS var_reduction
        |FROM m ORDER BY treated""".stripMargin,

    "q_sequential_ab" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS d, user_id % 2 = 0 AS t,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |daily AS (
        |  SELECT d,
        |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS dn_t,
        |    CAST(SUM(CASE WHEN t THEN v_c ELSE 0 END) AS BIGINT) AS ds_t,
        |    CAST(SUM(CASE WHEN t THEN v_c * v_c ELSE 0 END) AS BIGINT) AS dq_t,
        |    CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS dn_c,
        |    CAST(SUM(CASE WHEN NOT t THEN v_c ELSE 0 END) AS BIGINT) AS ds_c,
        |    CAST(SUM(CASE WHEN NOT t THEN v_c * v_c ELSE 0 END) AS BIGINT)
        |      AS dq_c
        |  FROM ev GROUP BY 1),
        |cum AS (
        |  SELECT d,
        |    CAST(SUM(dn_t) OVER win AS BIGINT) AS nt,
        |    CAST(SUM(ds_t) OVER win AS BIGINT) AS st,
        |    CAST(SUM(dq_t) OVER win AS BIGINT) AS qt,
        |    CAST(SUM(dn_c) OVER win AS BIGINT) AS nc,
        |    CAST(SUM(ds_c) OVER win AS BIGINT) AS sc,
        |    CAST(SUM(dq_c) OVER win AS BIGINT) AS qc
        |  FROM daily
        |  WINDOW win AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
        |fin AS (
        |  SELECT d, nt, nc, st / nt AS mt, sc / nc AS mc,
        |    ((qt - CAST(st AS DOUBLE) * st / nt)
        |      + (qc - CAST(sc AS DOUBLE) * sc / nc)) / (nt + nc - 2) AS s2
        |  FROM cum),
        |z AS (SELECT d, nt, nc, mt, mc,
        |        (mt - mc) / sqrt(s2 * (1.0 / nt + 1.0 / nc)) AS z
        |      FROM fin)
        |SELECT d, nt, nc,
        |  ROUND(mt / 100.0, 4) AS mean_t, ROUND(mc / 100.0, 4) AS mean_c,
        |  ROUND(z, 4) AS z, abs(z) > 2.89 AS crossed
        |FROM z ORDER BY d""".stripMargin,

    "q_shapley_attrib" ->
      """WITH u AS (
        |  SELECT user_id,
        |    list_sort(list_distinct(list(event_type)
        |      FILTER (WHERE event_type != 'purchase'))) AS channels,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |f AS (SELECT user_id, channels,
        |        CAST(ROUND(1e6 / len(channels)) AS BIGINT) AS share_u
        |      FROM u WHERE conv = 1 AND len(channels) > 0),
        |c AS (SELECT unnest(channels) AS channel, share_u FROM f),
        |g AS (SELECT channel, COUNT(*) AS n_users,
        |        CAST(SUM(share_u) AS BIGINT) AS cr_u
        |      FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(cr_u) AS BIGINT) AS tot_u FROM g)
        |SELECT channel, n_users, ROUND(cr_u / 1e6, 4) AS credit,
        |  ROUND(cr_u / tot_u, 6) AS share
        |FROM g CROSS JOIN t ORDER BY channel""".stripMargin,

    "q_did_estimator" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t_us,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |span AS (SELECT CAST((MIN(t_us) + MAX(t_us)) // 2 AS BIGINT) AS mid
        |         FROM ev),
        |cells AS (
        |  SELECT user_id % 2 = 0 AS treated, t_us >= mid AS post,
        |    COUNT(*) AS n, CAST(SUM(v_c) AS BIGINT) AS sc
        |  FROM ev CROSS JOIN span GROUP BY 1, 2),
        |m AS (SELECT treated, post, n, sc / n / 100.0 AS mean_raw FROM cells),
        |did AS (
        |  SELECT ((MAX(CASE WHEN treated AND post THEN mean_raw END)
        |    - MAX(CASE WHEN treated AND NOT post THEN mean_raw END))
        |    - (MAX(CASE WHEN NOT treated AND post THEN mean_raw END)
        |      - MAX(CASE WHEN NOT treated AND NOT post THEN mean_raw END)))
        |    AS did_raw
        |  FROM m)
        |SELECT treated, post, n, ROUND(mean_raw, 4) AS mean_v,
        |  ROUND(did_raw, 4) AS did
        |FROM m CROSS JOIN did ORDER BY treated, post""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT d, CAST(s_mu // n AS BIGINT) AS mmu FROM daily),
        |acc AS (
        |  SELECT d, mmu,
        |    CAST(SUM(mmu) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sl,
        |    row_number() OVER (ORDER BY d) AS i,
        |    CAST(SUM(mmu) OVER () AS BIGINT) AS st,
        |    COUNT(*) OVER () AS nd
        |  FROM m),
        |red AS (
        |  SELECT d, mmu,
        |    CASE WHEN i >= 3 AND i <= nd - 3 THEN
        |      CAST(ROUND((CAST(sl AS DOUBLE) * sl / i
        |        + CAST(st - sl AS DOUBLE) * (st - sl) / (nd - i)
        |        - CAST(st AS DOUBLE) * st / nd) / 1e6) AS BIGINT)
        |    END AS red_u
        |  FROM acc),
        |b AS (SELECT d AS best_d FROM red WHERE red_u IS NOT NULL
        |      ORDER BY red_u DESC, d LIMIT 1)
        |SELECT d, ROUND(mmu / 1000000.0, 4) AS mean_v,
        |  ROUND(red_u / 1e6, 4) AS sse_reduction,
        |  d = best_d AS is_changepoint
        |FROM red CROSS JOIN b ORDER BY d""".stripMargin,

    "q_seasonality_profile" ->
      """SELECT CAST(dayofweek(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hr,
        |  COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_val
        |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin,

    "q_isolation_grid" ->
      """WITH pts AS (
        |  SELECT event_id, CAST(FLOOR(value / 20) AS INT) AS cx,
        |    CAST(FLOOR(CAST(json_extract(props, '$.k') AS INT) / 10) AS INT)
        |      AS cy
        |  FROM events),
        |cells AS (SELECT cx, cy, COUNT(*) AS n FROM pts GROUP BY 1, 2),
        |t AS (SELECT SUM(n) AS nn FROM cells)
        |SELECT p.event_id, p.cx, p.cy, c.n,
        |  ROUND(-ln(c.n * 1.0 / t.nn), 6) AS score
        |FROM pts p JOIN cells c USING (cx, cy) CROSS JOIN t
        |ORDER BY score DESC, event_id LIMIT 20""".stripMargin,

    "q_conversion_lag" ->
      """WITH a AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv_us
        |  FROM events)
        |SELECT CASE WHEN lv_us IS NULL THEN -1
        |    ELSE (ts_us - lv_us) // 3600000000 END AS lag_hours,
        |  COUNT(*) AS n_purchases
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY lag_hours""".stripMargin,

    "q_forecast_naive" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, ROUND(SUM(value), 4) AS actual
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT d, actual, lag(actual, 7) OVER (ORDER BY d) AS forecast
        |  FROM daily)
        |SELECT d, actual, forecast,
        |  ROUND(abs(actual - forecast) / actual, 6) AS ape
        |FROM f WHERE forecast IS NOT NULL ORDER BY d""".stripMargin,

    "q_path_mining" ->
      """WITH p AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, COUNT(*) AS n
        |FROM p WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 10""".stripMargin,

    "q_calibration_bins" ->
      """WITH b AS (
        |  SELECT CAST(FLOOR(LEAST(value / 200.0, 0.999999) * 10) AS INT)
        |      AS bin,
        |    COUNT(*) AS n,
        |    AVG(LEAST(value / 200.0, 0.999999)) AS avg_pred,
        |    AVG(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
        |      AS actual
        |  FROM events GROUP BY 1),
        |t AS (SELECT SUM(n) AS nn FROM b)
        |SELECT bin, n, ROUND(avg_pred, 6) AS avg_pred,
        |  ROUND(actual, 6) AS actual_rate,
        |  ROUND(abs(avg_pred - actual) * n / t.nn, 6) AS ece_part
        |FROM b CROSS JOIN t ORDER BY bin""".stripMargin,

    "q_streak_detect" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INT) AS grp
        |  FROM days),
        |st AS (SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS streak_start
        |       FROM g GROUP BY 1, 2),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |         ORDER BY len DESC, streak_start DESC) AS rn FROM st)
        |SELECT user_id, CAST(len AS BIGINT) AS longest_streak, streak_start
        |FROM rk WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_cohort_ltv" ->
      """WITH f AS (
        |  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort
        |  FROM events GROUP BY 1),
        |sz AS (SELECT cohort, COUNT(DISTINCT user_id) AS n_users
        |       FROM f GROUP BY 1),
        |r AS (
        |  SELECT f.cohort,
        |    CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7
        |      AS INT) AS week_offset,
        |    SUM(e.value) AS rev
        |  FROM events e JOIN f USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT strftime(r.cohort, '%Y-%m-%d') AS cohort_week,
        |  r.week_offset, CAST(sz.n_users AS BIGINT) AS n_users,
        |  ROUND(r.rev, 4) AS rev,
        |  ROUND(SUM(r.rev) OVER (PARTITION BY r.cohort ORDER BY r.week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / sz.n_users, 4) AS cum_ltv
        |FROM r JOIN sz USING (cohort)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_gdpr_forget" ->
      """WITH forget AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
        |    AS INT) % 20 AS INT) = 0),
        |b AS (SELECT event_type, COUNT(*) AS n_before FROM events GROUP BY 1),
        |a AS (
        |  SELECT event_type, COUNT(*) AS n_after FROM events e
        |  WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id)
        |  GROUP BY 1)
        |SELECT b.event_type, b.n_before, COALESCE(a.n_after, 0) AS n_after,
        |  b.n_before - COALESCE(a.n_after, 0) AS n_removed
        |FROM b LEFT JOIN a USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q_survival_km" ->
      """WITH hz AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
        |su AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS su
        |  FROM events GROUP BY 1),
        |pu AS (SELECT user_id, epoch_us(ts) AS pu FROM events
        |       WHERE event_type = 'purchase'),
        |d AS (
        |  SELECT su.user_id, su.su,
        |    MIN(CASE WHEN pu.pu > su.su THEN pu.pu END) AS fp
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
        |  WHERE su.su IS NOT NULL GROUP BY 1, 2),
        |dur AS (
        |  SELECT CASE WHEN fp IS NOT NULL THEN (fp - su) // 86400000000
        |              ELSE (hz.hz - su) // 86400000000 END AS t,
        |    fp IS NOT NULL AS is_event
        |  FROM d CROSS JOIN hz),
        |grid AS (
        |  SELECT t, SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS dd,
        |    COUNT(*) AS all_t
        |  FROM dur GROUP BY t),
        |tt AS (SELECT SUM(all_t) AS n_total FROM grid),
        |acc AS (
        |  SELECT t, dd, all_t, tt.n_total,
        |    tt.n_total - COALESCE(SUM(all_t) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM grid CROSS JOIN tt)
        |SELECT t AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(dd AS BIGINT) AS d,
        |  ROUND(exp(SUM(ln(GREATEST(1.0 - dd * 1.0 / n_risk, 1e-300)))
        |    OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS surv
        |FROM acc WHERE dd > 0 ORDER BY t_days""".stripMargin,

    "q_lag_features" ->
      """SELECT event_id, user_id, ROUND(value, 4) AS v,
        |  ROUND(lag(value, 1) OVER w, 4) AS lag1,
        |  ROUND(lag(value, 2) OVER w, 4) AS lag2,
        |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) AS rmean3,
        |  ROUND(value - lag(value, 1) OVER w, 4) AS delta1
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    // identical µ-grid daily series, 435-pair self-join, two
    // order-statistic median picks with integer-division middles
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT d, CAST(s_mu // n AS BIGINT) AS mmu,
        |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |      FROM daily),
        |pairs AS (
        |  SELECT CAST(b.mmu - a.mmu AS DOUBLE) / (b.i - a.i) AS slope_u
        |  FROM m a JOIN m b ON b.i > a.i),
        |np AS (SELECT COUNT(*) AS np FROM pairs),
        |med AS (
        |  SELECT AVG(slope_u) AS slope_u, MAX(np) AS n_pairs FROM (
        |    SELECT slope_u, row_number() OVER (ORDER BY slope_u) AS rn, np
        |    FROM pairs CROSS JOIN np)
        |  WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2),
        |nd AS (SELECT COUNT(*) AS nd FROM m),
        |resid AS (
        |  SELECT slope_u, n_pairs, mmu - slope_u * i AS b_u
        |  FROM m CROSS JOIN med)
        |SELECT MAX(nd) AS n_days, MAX(n_pairs) AS n_pairs,
        |  ROUND(MAX(slope_u) / 1e6, 6) AS slope_per_day,
        |  ROUND(AVG(b_u) / 1e6, 6) AS intercept
        |FROM (
        |  SELECT b_u, slope_u, n_pairs, nd,
        |    row_number() OVER (ORDER BY b_u) AS rb
        |  FROM resid CROSS JOIN nd)
        |WHERE rb = (nd + 1) // 2 OR rb = (nd + 2) // 2""".stripMargin,

    // identical pair enumeration; S, tie term, and n are exact longs
    "q_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(s_mu // n AS BIGINT) AS mmu,
        |        row_number() OVER (ORDER BY d) AS i
        |      FROM daily),
        |s AS (
        |  SELECT COALESCE(CAST(SUM(sign(b.mmu - a.mmu)) AS BIGINT), 0)
        |    AS s_stat
        |  FROM m a JOIN m b ON b.i > a.i),
        |ties AS (
        |  SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
        |    AS tie_term
        |  FROM (SELECT COUNT(*) AS t FROM m GROUP BY mmu)),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM m),
        |v AS (
        |  SELECT s_stat, nd,
        |    (nd * (nd - 1) * (2 * nd + 5) - tie_term) / 18.0 AS var_s
        |  FROM s CROSS JOIN ties CROSS JOIN nd),
        |z AS (
        |  SELECT s_stat, nd, var_s,
        |    CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
        |         WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
        |         ELSE 0.0 END AS z
        |  FROM v)
        |SELECT nd AS n_days, s_stat, ROUND(var_s, 4) AS var_s,
        |  ROUND(z, 4) AS z,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z""".stripMargin,

    // identical doubled-average-rank grid and algebraic rho
    "q_spearman_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS sv,
        |    SUM(CAST(json_extract(props, '$.k') AS BIGINT) * 1000000)
        |      AS sk,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(sv // n AS BIGINT) AS vmu,
        |        CAST(sk // n AS BIGINT) AS kmu
        |      FROM daily),
        |r AS (
        |  SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY vmu)
        |      + COUNT(*) OVER (PARTITION BY event_type, vmu) - 1 AS r2x,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY kmu)
        |      + COUNT(*) OVER (PARTITION BY event_type, kmu) - 1 AS r2y
        |  FROM m),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r2x) AS BIGINT) AS sx, CAST(SUM(r2y) AS BIGINT) AS sy,
        |    CAST(SUM(r2x * r2y) AS BIGINT) AS sxy,
        |    CAST(SUM(r2x * r2x) AS BIGINT) AS sxx,
        |    CAST(SUM(r2y * r2y) AS BIGINT) AS syy
        |  FROM r GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |    AS spearman_rho
        |FROM a ORDER BY event_type""".stripMargin,

    // identical exact-long running-mean fold; δ=1.0, λ=5.0 in µ units
    "q_page_hinkley" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT d, CAST(s_mu // n AS BIGINT) AS mmu FROM daily),
        |c AS (
        |  SELECT d, mmu,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |    CAST(SUM(mmu) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM m),
        |t AS (SELECT d, mmu, mmu - (cum // i) - 1000000 AS term FROM c),
        |acc AS (
        |  SELECT d, mmu,
        |    SUM(term) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |  FROM t),
        |ph AS (
        |  SELECT d, mmu,
        |    m - MIN(m) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph_u
        |  FROM acc)
        |SELECT d, ROUND(mmu / 1e6, 4) AS mean_v,
        |  ROUND(ph_u / 1e6, 4) AS ph, ph_u > 5000000 AS alarm
        |FROM ph ORDER BY d""".stripMargin,

    // identical exact-count agreement table per event type
    "q_cohens_kappa" ->
      """WITH r AS (
        |  SELECT event_type, value > 100 AS ra,
        |    CAST(json_extract(props, '$.k') AS INT) > 50 AS rb
        |  FROM events),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN ra THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |    CAST(SUM(CASE WHEN rb THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        |    CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS agree
        |  FROM r GROUP BY 1),
        |k AS (
        |  SELECT event_type, n,
        |    agree * 1.0 / n AS po,
        |    (a1 * b1 + (n - a1) * (n - b1)) * 1.0 / (n * n) AS pe
        |  FROM a)
        |SELECT event_type, n, ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
        |  ROUND((po - pe) / (1.0 - pe), 6) AS kappa
        |FROM k ORDER BY event_type""".stripMargin,

    // identical prefix-sum segment means and minimax lattice
    "q_isotonic_fit" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS s_mu,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT d, CAST(s_mu // n AS BIGINT) AS mmu,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |    CAST(SUM(s_mu // n) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS pre
        |  FROM daily),
        |ks AS (
        |  SELECT i + 1 AS k, pre AS pk1 FROM m
        |  UNION ALL SELECT 1, 0),
        |segs AS (
        |  SELECT ks.k, j.i AS j,
        |    CAST(j.pre - ks.pk1 AS DOUBLE) / (j.i - ks.k + 1) AS avg_u
        |  FROM m j JOIN ks ON j.i >= ks.k),
        |inner_min AS (
        |  SELECT t.i, t.d, t.mmu, segs.k, MIN(avg_u) AS mn
        |  FROM segs JOIN m t ON segs.k <= t.i AND segs.j >= t.i
        |  GROUP BY 1, 2, 3, 4),
        |fit AS (
        |  SELECT i, d, mmu, MAX(mn) AS yhat_u
        |  FROM inner_min GROUP BY 1, 2, 3)
        |SELECT d, ROUND(mmu / 1e6, 4) AS mean_v,
        |  ROUND(yhat_u / 1e6, 4) AS iso_fit
        |FROM fit ORDER BY d""".stripMargin,

    // identical exact centi-long group moments and snapped s²/n terms
    "q_anova" ->
      """WITH g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sg,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
        |      * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS qg
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT ng, sg, qg,
        |    CAST(ROUND(CAST(sg AS DOUBLE) * sg / ng) AS BIGINT) AS t_u
        |  FROM g),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(ng) AS n, SUM(sg) AS s,
        |    SUM(qg) AS q, SUM(t_u) AS tb
        |  FROM t),
        |f AS (
        |  SELECT k, n,
        |    tb - CAST(ROUND(CAST(s AS DOUBLE) * s / n) AS BIGINT) AS ssb,
        |    q - tb AS ssw
        |  FROM a)
        |SELECT k AS k_groups, CAST(n AS BIGINT) AS n,
        |  k - 1 AS df1, CAST(n - k AS BIGINT) AS df2,
        |  ROUND((CAST(ssb AS DOUBLE) / (k - 1))
        |    / (CAST(ssw AS DOUBLE) / (n - k)), 4) AS f_stat,
        |  ROUND(CAST(ssb AS DOUBLE) / (ssb + ssw), 6) AS eta_sq
        |FROM f""".stripMargin,

    // identical bucket grid, prefix splits, 1e9-snapped entropy terms
    "q_info_gain" ->
      """WITH b AS (
        |  SELECT CAST(FLOOR(value / 10) AS BIGINT) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pb
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT b, nb, pb,
        |    CAST(SUM(nb) OVER w AS BIGINT) AS nl,
        |    CAST(SUM(pb) OVER w AS BIGINT) AS pl
        |  FROM b
        |  WINDOW w AS (ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT SUM(nb) AS n, SUM(pb) AS p FROM b),
        |e AS (
        |  SELECT c.b, nl, pl, n, p,
        |    (CASE WHEN p > 0 THEN CAST(ROUND(-(p * 1.0 / n)
        |       * ln(p * 1.0 / n) * 1e9) AS BIGINT) ELSE 0 END
        |     + CASE WHEN n - p > 0 THEN CAST(ROUND(-((n - p) * 1.0 / n)
        |       * ln((n - p) * 1.0 / n) * 1e9) AS BIGINT) ELSE 0 END)
        |      AS h_root,
        |    (CASE WHEN pl > 0 THEN CAST(ROUND(-(pl * 1.0 / nl)
        |       * ln(pl * 1.0 / nl) * 1e9) AS BIGINT) ELSE 0 END
        |     + CASE WHEN nl - pl > 0 THEN CAST(ROUND(-((nl - pl) * 1.0 / nl)
        |       * ln((nl - pl) * 1.0 / nl) * 1e9) AS BIGINT) ELSE 0 END)
        |      AS h_l,
        |    (CASE WHEN p - pl > 0 THEN CAST(ROUND(-((p - pl) * 1.0 / (n - nl))
        |       * ln((p - pl) * 1.0 / (n - nl)) * 1e9) AS BIGINT) ELSE 0 END
        |     + CASE WHEN (n - nl) - (p - pl) > 0
        |       THEN CAST(ROUND(-(((n - nl) - (p - pl)) * 1.0 / (n - nl))
        |       * ln(((n - nl) - (p - pl)) * 1.0 / (n - nl)) * 1e9) AS BIGINT)
        |       ELSE 0 END) AS h_r
        |  FROM c CROSS JOIN tot
        |  WHERE nl < n),
        |ig AS (
        |  SELECT (b + 1) * 10 AS threshold, nl, pl,
        |    h_root
        |      - CAST(ROUND(nl * 1.0 / n * h_l) AS BIGINT)
        |      - CAST(ROUND((n - nl) * 1.0 / n * h_r) AS BIGINT) AS ig_u
        |  FROM e)
        |SELECT threshold, nl AS n_left, pl AS pos_left,
        |  ROUND(ig_u / 1e9, 6) AS info_gain,
        |  ig_u = MAX(ig_u) OVER () AS is_best
        |FROM ig ORDER BY threshold""".stripMargin
  )
}
