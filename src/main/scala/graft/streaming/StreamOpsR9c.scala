package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamOps.{eventsDir, readEventsStream, runToParquet, tmp, withBoundedStatePartitions}

/** Round-9 wave 34 (SURVEY.md §2 B.9): six more exact-state streaming
  * keys, each a real `Trigger.AvailableNow` query over the staged
  * events stream whose sink read-back is a pure batch function of the
  * events table — so all six carry full DuckDB oracles (the r6
  * deterministic-read-back doctrine): a streaming KMV distinct sketch
  * (k=64 min hashes, order-independent state), a Bloom-filter
  * streaming dedup whose flags are all false positives (event_ids are
  * unique — the batch twin reconstructs the shared bit array via
  * min-setter ranks), lag-1 autocorrelation from O(1) running moment
  * state, an INTEGER floor-div EMA whose oracle is a recursive CTE
  * stepping the identical recurrence, inter-arrival gap statistics
  * (the streaming twin of q_interevent_burstiness on the seconds
  * grid), and a last-50 ring distinct count.
  *
  * State sizes: O(k)/O(m) per key (64 longs, 4096 bytes, constant
  * moment tuples, 50-slot ring) — throughput-independent. At cluster
  * scale the Bloom key's bit array is sharded by a hash prefix of the
  * id (see s_stream_bloom_dedup); every other key partitions by
  * event_type already.
  *
  * SINGLE-BATCH INVARIANT (oracle parity contract): the
  * order-sensitive keys here (bloom dedup, lag-1, EMA, interarrival,
  * last-k) sort rows by (ts, event_id) only WITHIN each micro-batch;
  * their oracles assume the global (ts, event_id) order. Parity holds
  * because `Trigger.AvailableNow` with no `maxFilesPerTrigger` option
  * drains ALL staged files in exactly ONE micro-batch — regardless of
  * how many part files `stageTable` stages. Do NOT set
  * `maxFilesPerTrigger`/`maxBytesPerTrigger` on the events stream and
  * do NOT split staging into multiple AvailableNow runs for these
  * keys: either change yields multiple batches, per-batch-only
  * ordering, and silent oracle divergence. KMV and the moment-based
  * keys are order-independent and exempt.
  */
object StreamOpsR9c {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Streaming KMV: state = up to 64 smallest DISTINCT Knuth hashes
    // of user_id per type (+ rows-seen counter). Order-independent,
    // so the read-back equals the batch q_kmv_distinct formula.
    "s_stream_kmv" -> ((s, d) => {
      import s.implicits._
      val out = tmp("skmv_out")
      val ev = readEventsStream(s, eventsDir(d, "skmv_in"))
        .select(col("event_type"),
          // product reduced mod 2^63 in DECIMAL space: a BIGINT id·C
          // for ids above ~3.5e9 overflows — ANSI Spark throws, DuckDB
          // raises — so both engines compute (id·C) mod 2^63 exactly
          // (DECIMAL here, HUGEINT in the oracle); identity for every
          // non-overflowing id, well-defined at any id scale
          expr("CAST(pmod(CAST(user_id AS DECIMAL(38,0)) * 2654435761," +
            " 9223372036854775808) AS BIGINT) % 4294967296").as("h"))
        .as[(String, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, List[Long]),
            (String, Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, List[Long])]) =>
              var (n, mins) = state.getOption.getOrElse((0L, List.empty[Long]))
              rows.foreach { r =>
                n += 1
                if (!mins.contains(r._2)
                  && (mins.length < 64 || r._2 < mins.last))
                  mins = (r._2 :: mins).sorted.take(64)
              }
              state.update((n, mins))
              Iterator((t, n, mins.length.toLong,
                if (mins.length >= 64) mins.last else -1L))
          }
          .toDF("event_type", "n_seen", "nmins", "h64")
      }
      runToParquet(scored, out, tmp("skmv_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("n_seen"), col("nmins"), col("h64")))
          .as("fin"))
        .select(col("event_type"), col("fin.n_seen").as("n_events"),
          round(when(col("fin.nmins") >= 64,
            lit(63.0) * 4294967296.0 / col("fin.h64"))
            .otherwise(col("fin.nmins").cast("double")), 4)
            .as("kmv_estimate"))
        .orderBy("event_type")
    }),

    // Streaming Bloom dedup over unique event_ids, SHARDED by a hash
    // prefix: shard = h0(id) mod 8 (the r9 single-state-group funnel
    // is gone — 8 state groups, one m=4096 k=3 bit-array shard each,
    // so at cluster scale the state distributes across tasks; raise
    // the shard count with throughput). A row is flagged when all 3
    // of ITS SHARD's bits are already set before its own insertion —
    // with unique ids every flag is a false positive. The batch twin
    // reconstructs min-setter ranks per (shard, bit).
    "s_stream_bloom_dedup" -> ((s, d) => {
      import s.implicits._
      val out = tmp("sbloom_out")
      val ev = readEventsStream(s, eventsDir(d, "sbloom_in"))
        .select(
          expr("CAST(pmod(CAST(event_id AS DECIMAL(38,0)) * 2654435761," +
            " 9223372036854775808) AS BIGINT) % 8").as("shard"),
          col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .as[(Long, Long, Long)]
      val ps = Array(2654435761L, 2246822519L, 3266489917L)
      val qs = Array(1L, 7L, 13L)
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long, Array[Byte]),
            (Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (sh, rows, state: GroupState[(Long, Long, Array[Byte])]) =>
              var (n, fl, bits) = state.getOption
                .getOrElse((0L, 0L, new Array[Byte](4096)))
              rows.toArray.sortBy(r => (r._3, r._2)).foreach { r =>
                // low-63-bit mask before the mods: keeps the wrapped
                // product non-negative (bits() index) and equal to the
                // oracle's HUGEINT & 2^63−1 at any id scale
                val hs = (0 to 2).map(j =>
                  (((r._2 * ps(j) + qs(j)) & 0x7FFFFFFFFFFFFFFFL)
                    % 2147483647L % 4096L).toInt)
                if (hs.forall(bits(_) == 1)) fl += 1
                hs.foreach(bits(_) = 1)
                n += 1
              }
              state.update((n, fl, bits))
              Iterator((sh, n, fl))
          }
          .toDF("shard", "n", "fl")
      }
      runToParquet(scored, out, tmp("sbloom_ckpt"))
      s.read.parquet(out).groupBy("shard")
        .agg(max(struct(col("n"), col("fl"))).as("fin"))
        .agg(sum(col("fin.n")).as("n_events"),
          sum(col("fin.fl")).as("n_flagged"))
        .select(col("n_events"), col("n_flagged"),
          round(col("n_flagged").cast("double") / col("n_events"), 6)
            .as("fp_rate"))
    }),

    // Streaming lag-1 autocorrelation per type: O(1) moment state
    // over consecutive centi-value pairs in (ts, event_id) order;
    // the read-back assembles Pearson r of (v_t, v_{t−1}).
    "s_stream_lag1_autocorr" -> ((s, d) => {
      import s.implicits._
      val out = tmp("slag1_out")
      val ev = readEventsStream(s, eventsDir(d, "slag1_in"))
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), round(col("value") * 100).cast("long").as("v"))
        .as[(String, Long, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[
            (Long, Long, Long, Long, Long, Long, Long),
            (String, Long, Long, Long, Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[
                (Long, Long, Long, Long, Long, Long, Long)]) =>
              var (n, prev, sa, sb, sab, saa, sbb) = state.getOption
                .getOrElse((0L, 0L, 0L, 0L, 0L, 0L, 0L))
              rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
                if (n > 0) {
                  sa += r._4; sb += prev; sab += r._4 * prev
                  saa += r._4 * r._4; sbb += prev * prev
                }
                prev = r._4; n += 1
              }
              state.update((n, prev, sa, sb, sab, saa, sbb))
              Iterator((t, n - 1, sa, sb, sab, saa, sbb))
          }
          .toDF("event_type", "m", "sa", "sb", "sab", "saa", "sbb")
      }
      runToParquet(scored, out, tmp("slag1_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("m"), col("sa"), col("sb"), col("sab"),
          col("saa"), col("sbb"))).as("f"))
        .filter(col("f.m") > 1
          && col("f.m") * col("f.saa") > col("f.sa") * col("f.sa")
          && col("f.m") * col("f.sbb") > col("f.sb") * col("f.sb"))
        .select(col("event_type"), col("f.m").as("n_pairs"),
          round((col("f.m") * col("f.sab") - col("f.sa") * col("f.sb"))
            .cast("double")
            / sqrt((col("f.m") * col("f.saa")
                - col("f.sa") * col("f.sa")).cast("double")
              * (col("f.m") * col("f.sbb")
                - col("f.sb") * col("f.sb")).cast("double")), 6)
            .as("lag1_autocorr"))
        .orderBy("event_type")
    }),

    // Streaming integer EMA (α=1/2 with floor division, stated):
    // e ← (v + e) DIV 2 per row — an exactly-reproducible recurrence;
    // the oracle steps the identical recurrence in a recursive CTE.
    "s_stream_ema_int" -> ((s, d) => {
      import s.implicits._
      val out = tmp("sema_out")
      val ev = readEventsStream(s, eventsDir(d, "sema_in"))
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), round(col("value") * 100).cast("long").as("v"))
        .as[(String, Long, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long), (String, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, Long)]) =>
              var (n, e) = state.getOption.getOrElse((0L, 0L))
              rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
                e = if (n == 0) r._4 else (r._4 + e) / 2
                n += 1
              }
              state.update((n, e))
              Iterator((t, n, e))
          }
          .toDF("event_type", "n", "e")
      }
      runToParquet(scored, out, tmp("sema_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("n"), col("e"))).as("f"))
        .select(col("event_type"), col("f.n").as("n_events"),
          round(col("f.e") / 100.0, 2).as("ema_final"))
        .orderBy("event_type")
    }),

    // Streaming inter-arrival stats per type on the seconds grid
    // (g = Δµs DIV 1e6, stated): O(1) state (last, n, Σg, Σg²);
    // read-back = mean gap + burstiness (the q_interevent_burstiness
    // twin at the coarser grid).
    "s_stream_interarrival" -> ((s, d) => {
      import s.implicits._
      val out = tmp("sgap_out")
      val ev = readEventsStream(s, eventsDir(d, "sgap_in"))
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"))
        .as[(String, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long, Long, Long),
            (String, Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, Long, Long, Long)]) =>
              var (n, last, sg, sgg) = state.getOption
                .getOrElse((0L, 0L, 0L, 0L))
              rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
                if (n > 0) {
                  val g = (r._2 - last) / 1000000L
                  sg += g; sgg += g * g
                }
                last = r._2; n += 1
              }
              state.update((n, last, sg, sgg))
              Iterator((t, n - 1, sg, sgg))
          }
          .toDF("event_type", "ng", "sg", "sgg")
      }
      runToParquet(scored, out, tmp("sgap_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("ng"), col("sg"), col("sgg"))).as("f"))
        .withColumn("mu", col("f.sg").cast("double") / col("f.ng"))
        .withColumn("sd", sqrt(col("f.sgg").cast("double") / col("f.ng")
          - col("mu") * col("mu")))
        .filter(col("f.ng") > 1 && col("sd") + col("mu") > 0)
        .select(col("event_type"), col("f.ng").as("n_gaps"),
          round(col("mu"), 6).as("mean_gap_s"),
          round((col("sd") - col("mu")) / (col("sd") + col("mu")), 6)
            .as("burstiness"))
        .orderBy("event_type")
    }),

    // Streaming last-50 distinct users per type: 50-slot ring state;
    // read-back = distinct count of the final ring (the batch twin is
    // the DESC row_number ≤ 50 distinct).
    "s_stream_lastk_distinct" -> ((s, d) => {
      import s.implicits._
      val out = tmp("slk_out")
      val ev = readEventsStream(s, eventsDir(d, "slk_in"))
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("user_id"))
        .as[(String, Long, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, List[Long]),
            (String, Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, List[Long])]) =>
              var (n, ring) = state.getOption
                .getOrElse((0L, List.empty[Long]))
              rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
                ring = (ring :+ r._4).takeRight(50)
                n += 1
              }
              state.update((n, ring))
              // n is the monotone emission key — the read-back takes
              // the final micro-batch's ring by max(n)
              Iterator((t, n, ring.length.toLong,
                ring.distinct.length.toLong))
          }
          .toDF("event_type", "n", "ring_n", "nd")
      }
      runToParquet(scored, out, tmp("slk_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("n"), col("ring_n"), col("nd"))).as("f"))
        .select(col("event_type"), col("f.ring_n").as("ring_size"),
          col("f.nd").as("distinct_last50"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    // the batch KMV twin (q_kmv_distinct formula, estimate only)
    "s_stream_kmv" ->
      """WITH hv AS (
        |  SELECT DISTINCT event_type,
        |    ((CAST(user_id AS HUGEINT) * 2654435761)
        |      % 9223372036854775808) % 4294967296 AS h
        |  FROM events),
        |rk AS (
        |  SELECT event_type, h,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
        |      AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS nh
        |  FROM hv),
        |cnt AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT rk.event_type, cnt.n_events,
        |  ROUND(CASE WHEN nh >= 64 THEN 63.0 * 4294967296.0 / h
        |    ELSE CAST(nh AS DOUBLE) END, 4) AS kmv_estimate
        |FROM rk JOIN cnt ON rk.event_type = cnt.event_type
        |WHERE (nh >= 64 AND rk = 64) OR (nh < 64 AND rk = nh)
        |ORDER BY rk.event_type""".stripMargin,

    // the batch twin: min-setter rank per (shard, bit), flagged iff
    // all 3 of the row's SHARD bits were set strictly earlier
    "s_stream_bloom_dedup" ->
      """WITH js AS (SELECT UNNEST([0, 1, 2]) AS j),
        |ev AS (
        |  SELECT event_id,
        |    ((CAST(event_id AS HUGEINT) * 2654435761)
        |      % 9223372036854775808) % 8 AS shard,
        |    CAST(row_number() OVER (
        |      PARTITION BY ((CAST(event_id AS HUGEINT) * 2654435761)
        |        % 9223372036854775808) % 8
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |  FROM events),
        |bh AS (
        |  SELECT ev.event_id, ev.shard, ev.rn, js.j,
        |    ((CAST(ev.event_id AS HUGEINT)
        |      * (CASE js.j WHEN 0 THEN 2654435761
        |        WHEN 1 THEN 2246822519 ELSE 3266489917 END)
        |      + (CASE js.j WHEN 0 THEN 1 WHEN 1 THEN 7 ELSE 13 END))
        |      & 9223372036854775807)
        |      % 2147483647 % 4096 AS h
        |  FROM ev, js),
        |mb AS (SELECT shard, h, MIN(rn) AS mr FROM bh GROUP BY 1, 2),
        |fl AS (
        |  SELECT bh.event_id
        |  FROM bh JOIN mb ON bh.shard = mb.shard AND bh.h = mb.h
        |  GROUP BY bh.event_id, bh.shard, bh.rn
        |  HAVING SUM(CASE WHEN mb.mr < bh.rn THEN 1 ELSE 0 END) = 3),
        |ag AS (
        |  SELECT
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM fl) AS n_flagged)
        |SELECT n_events, n_flagged,
        |  ROUND(CAST(n_flagged AS DOUBLE) / n_events, 6) AS fp_rate
        |FROM ag""".stripMargin,

    // the batch lag-window twin
    "s_stream_lag1_autocorr" ->
      """WITH sq AS (
        |  SELECT event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v,
        |    lag(CAST(ROUND(value * 100) AS BIGINT))
        |      OVER (PARTITION BY event_type
        |        ORDER BY epoch_us(ts), event_id) AS pv
        |  FROM events),
        |ag AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
        |    SUM(v) AS sa, SUM(pv) AS sb, SUM(v * pv) AS sab,
        |    SUM(v * v) AS saa, SUM(pv * pv) AS sbb
        |  FROM sq WHERE pv IS NOT NULL GROUP BY 1)
        |SELECT event_type, m AS n_pairs,
        |  ROUND(CAST(m * sab - sa * sb AS DOUBLE)
        |    / sqrt(CAST(m * saa - sa * sa AS DOUBLE)
        |      * CAST(m * sbb - sb * sb AS DOUBLE)), 6)
        |    AS lag1_autocorr
        |FROM ag
        |WHERE m > 1 AND m * saa > sa * sa AND m * sbb > sb * sb
        |ORDER BY event_type""".stripMargin,

    // the recursive-CTE twin of the integer EMA recurrence
    "s_stream_ema_int" ->
      """WITH RECURSIVE sq AS (
        |  SELECT event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |  FROM events),
        |r AS (
        |  SELECT event_type, rn, v AS e FROM sq WHERE rn = 1
        |  UNION ALL
        |  SELECT sq.event_type, sq.rn, (sq.v + r.e) // 2
        |  FROM r JOIN sq ON sq.event_type = r.event_type
        |    AND sq.rn = r.rn + 1),
        |fin AS (
        |  SELECT event_type, MAX(rn) AS n FROM sq GROUP BY 1)
        |SELECT r.event_type, fin.n AS n_events,
        |  ROUND(r.e / 100.0, 2) AS ema_final
        |FROM r JOIN fin ON r.event_type = fin.event_type
        |  AND r.rn = fin.n
        |ORDER BY r.event_type""".stripMargin,

    // the batch seconds-grid gap twin
    "s_stream_interarrival" ->
      """WITH g AS (
        |  SELECT event_type, (tu - pt) // 1000000 AS g
        |  FROM (SELECT event_type, epoch_us(ts) AS tu,
        |          lag(epoch_us(ts)) OVER (PARTITION BY event_type
        |            ORDER BY epoch_us(ts), event_id) AS pt
        |        FROM events)
        |  WHERE pt IS NOT NULL),
        |ag AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
        |    SUM(g) AS sg, SUM(g * g) AS sgg
        |  FROM g GROUP BY 1),
        |st AS (
        |  SELECT event_type, ng,
        |    CAST(sg AS DOUBLE) / ng AS mu,
        |    sqrt(CAST(sgg AS DOUBLE) / ng
        |      - (CAST(sg AS DOUBLE) / ng) * (CAST(sg AS DOUBLE) / ng))
        |      AS sd
        |  FROM ag)
        |SELECT event_type, ng AS n_gaps,
        |  ROUND(mu, 6) AS mean_gap_s,
        |  ROUND((sd - mu) / (sd + mu), 6) AS burstiness
        |FROM st WHERE ng > 1 AND sd + mu > 0
        |ORDER BY event_type""".stripMargin,

    // the batch DESC-rank twin
    "s_stream_lastk_distinct" ->
      """WITH rk AS (
        |  SELECT event_type, user_id,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS BIGINT)
        |      AS rn
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ring_size,
        |  CAST(COUNT(DISTINCT CASE WHEN rn <= 50 THEN user_id END)
        |    AS BIGINT) AS distinct_last50
        |FROM rk GROUP BY 1
        |ORDER BY event_type""".stripMargin
  )
}
