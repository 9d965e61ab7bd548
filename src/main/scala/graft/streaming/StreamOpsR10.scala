package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import StreamOps.{eventsDir, readEventsStream, runToParquet, stageTable, tmp, withBoundedStatePartitions}

/** Round-10 streaming wave (SURVEY.md §2 B.9): the streaming twins of
  * the r10 sampling/sequential batch keys, both real
  * `Trigger.AvailableNow` queries with deterministic read-backs and
  * full DuckDB oracles.
  *
  * - `s_stream_reservoir`: k=64 min-priority sample per type (Knuth
  *   priority on event_id, low-63-bit masked like the KMV state).
  *   ORDER-INDEPENDENT state — min-merge commutes — so the read-back
  *   equals the batch priority rank regardless of batching.
  * - `s_stream_sprt`: Wald SPRT with O(1) exact integer state (row
  *   count, cumulative 1e9-snapped LLR, frozen decision). Order-
  *   SENSITIVE: rows fold in (ts, event_id) order within the batch —
  *   covered by StreamOpsR9c's SINGLE-BATCH INVARIANT (AvailableNow
  *   with no maxFilesPerTrigger drains all staged files in one
  *   micro-batch; do not change that).
  */
object StreamOpsR10 {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Streaming k=64 min-priority reservoir per type: state = the 64
    // smallest (priority, id, centi-value) triples + a rows-seen
    // counter. Read-back = final reservoir size + sample mean.
    "s_stream_reservoir" -> ((s, d) => {
      import s.implicits._
      val out = tmp("sres_out")
      val ev = readEventsStream(s, eventsDir(d, "sres_in"))
        .select(col("event_type"), col("event_id"),
          // mod-2^63 DECIMAL reduction (ANSI-safe at any id scale;
          // HUGEINT in the oracle — the StreamOpsR9c KMV pattern)
          expr("CAST(pmod(CAST(event_id AS DECIMAL(38,0))" +
            " * 2654435761, 9223372036854775808) AS BIGINT)").as("pr"),
          round(col("value") * 100).cast("long").as("vc"))
        .as[(String, Long, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, List[(Long, Long, Long)]),
            (String, Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, List[(Long, Long, Long)])]) =>
              var (n, res) = state.getOption
                .getOrElse((0L, List.empty[(Long, Long, Long)]))
              rows.foreach { r =>
                n += 1
                val cand = (r._3, r._2, r._4)
                if (res.length < 64 || implicitly[Ordering[(Long, Long)]]
                    .lt((cand._1, cand._2), (res.last._1, res.last._2)))
                  res = (cand :: res)
                    .sortBy(x => (x._1, x._2)).take(64)
              }
              state.update((n, res))
              Iterator((t, n, res.length.toLong, res.map(_._3).sum))
          }
          .toDF("event_type", "n", "k", "sv")
      }
      runToParquet(scored, out, tmp("sres_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("n"), col("k"), col("sv"))).as("f"))
        .select(col("event_type"), col("f.n").as("n_events"),
          col("f.k").as("k"),
          round(col("f.sv").cast("double") / col("f.k") / 100, 4)
            .as("sample_mean"))
        .orderBy("event_type")
    }),

    // Streaming dataset-provenance chain per source: state = (docs
    // seen, running md5 CHAIN) with chain_1 = md5(text_1) and
    // chain_i = md5(chain_{i−1} || md5(text_i)) in doc_id order — the
    // incremental form of q_dataset_fingerprint (a flat sorted concat
    // can't extend incrementally; the chain is O(32 bytes) state and
    // commits every prefix). Order-sensitive — single-batch invariant.
    "s_stream_provenance" -> ((s, d) => {
      import s.implicits._
      val in = stageTable(d, "documents", "sprov_in")
      val out = tmp("sprov_out")
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType)))
      val ev = s.readStream.schema(docSchema).parquet(in)
        .select(col("source"), col("doc_id"), md5(col("text")).as("h"))
        .as[(String, Long, String)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, String), (String, Long, String)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (src, rows, state: GroupState[(Long, String)]) =>
              var (n, chain) = state.getOption.getOrElse((0L, ""))
              def m(x: String): String =
                java.security.MessageDigest.getInstance("MD5")
                  .digest(x.getBytes("UTF-8"))
                  .map("%02x".format(_)).mkString
              rows.toArray.sortBy(_._2).foreach { r =>
                chain = if (n == 0) r._3 else m(chain + r._3)
                n += 1
              }
              state.update((n, chain))
              Iterator((src, n, chain))
          }
          .toDF("source", "n", "chain")
      }
      runToParquet(scored, out, tmp("sprov_ckpt"))
      s.read.parquet(out).groupBy("source")
        .agg(max(struct(col("n"), col("chain"))).as("f"))
        .select(col("source"), col("f.n").as("n_docs"),
          col("f.chain").as("chain_fingerprint"))
        .orderBy("source")
    }),

    // Streaming verbatim-duplication detector over the DOCUMENT
    // stream: every 10-token window fingerprinted (md5, the
    // q_substring_dup grid), fp mapped to a 60-bit long (first 15 hex
    // chars — the q_eth_abi_roundtrip conversion), then the SHARDED
    // Bloom state of s_stream_bloom_dedup (8 shards by hash prefix,
    // m=4096, k=3): a window is flagged when all 3 of its shard's
    // bits were set before insertion — true verbatim repeats plus
    // quantified false positives. Order-sensitive within (doc_id,
    // window index) — the single-batch invariant applies.
    "s_stream_substring_dup" -> ((s, d) => {
      import s.implicits._
      val in = stageTable(d, "documents", "ssub_in")
      val out = tmp("ssub_out")
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val ps = Array(2654435761L, 2246822519L, 3266489917L)
      val qs = Array(1L, 7L, 13L)
      val ev = s.readStream.schema(docSchema).parquet(in)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 10)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks) - 9)," +
            " i -> CAST(conv(substring(md5(array_join(slice(toks, i, 10)," +
            " ' ')), 1, 15), 16, 10) AS BIGINT))")).as(Seq("i", "h")))
        .select(
          // 60-bit h × the Knuth constant overflows BIGINT — the
          // DECIMAL pmod reduction as everywhere (HUGEINT in oracle)
          expr("CAST(pmod(CAST(h AS DECIMAL(38,0)) * 2654435761," +
            " 9223372036854775808) AS BIGINT) % 8").as("shard"),
          col("doc_id"), (col("i") + 1).cast("long").as("i"), col("h"))
        .as[(Long, Long, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long, Array[Byte]),
            (Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (sh, rows, state: GroupState[(Long, Long, Array[Byte])]) =>
              var (n, fl, bits) = state.getOption
                .getOrElse((0L, 0L, new Array[Byte](4096)))
              rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
                val hsArr = (0 to 2).map(j =>
                  (((r._4 * ps(j) + qs(j)) & 0x7FFFFFFFFFFFFFFFL)
                    % 2147483647L % 4096L).toInt)
                if (hsArr.forall(bits(_) == 1)) fl += 1
                hsArr.foreach(bits(_) = 1)
                n += 1
              }
              state.update((n, fl, bits))
              Iterator((sh, n, fl))
          }
          .toDF("shard", "n", "fl")
      }
      runToParquet(scored, out, tmp("ssub_ckpt"))
      s.read.parquet(out).groupBy("shard")
        .agg(max(struct(col("n"), col("fl"))).as("fin"))
        .agg(sum(col("fin.n")).as("n_windows"),
          sum(col("fin.fl")).as("n_flagged"))
        .select(col("n_windows"), col("n_flagged"),
          round(col("n_flagged").cast("double") / col("n_windows"), 6)
            .as("flag_rate"))
    }),

    // Streaming HyperLogLog per type: state = the 64 exact ρ
    // registers (max-merge — ORDER-INDEPENDENT, the mergeable-sketch
    // property itself) + a rows-seen counter. The read-back feeds the
    // final registers through the SAME estimator as q_hll_exact
    // (StatsR10f.hllEstimate), so the full DuckDB oracle applies.
    "s_stream_hll" -> ((s, d) => {
      import s.implicits._
      val out = tmp("shll_out")
      val ev = readEventsStream(s, eventsDir(d, "shll_in"))
        .select(col("event_type"),
          expr("CAST(pmod(CAST(user_id AS DECIMAL(38,0)) * 2654435761," +
            " 9223372036854775808) AS BIGINT)").as("h"))
        .as[(String, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Array[Byte]),
            (String, Long, Seq[Int])](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, Array[Byte])]) =>
              var (n, regs) = state.getOption
                .getOrElse((0L, new Array[Byte](64)))
              rows.foreach { r =>
                n += 1
                val b = (r._2 % 64L).toInt
                val rest = r._2 / 64L
                val rho = if (rest == 0L) 58
                  else 58 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
                if (rho > regs(b)) regs(b) = rho.toByte
              }
              state.update((n, regs))
              Iterator((t, n, regs.map(_.toInt).toSeq))
          }
          .toDF("event_type", "n", "regs")
      }
      runToParquet(scored, out, tmp("shll_ckpt"))
      val fin = s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("n"), col("regs"))).as("f"))
        .select(col("event_type"), col("f.n").as("n_events"),
          posexplode(col("f.regs")).as(Seq("b", "m_reg")))
        .select(col("event_type"), col("n_events"),
          col("b").cast("long").as("b"), col("m_reg").cast("long").as("m_reg"))
      graft.queries.StatsR10f.hllEstimate(
          fin.select("event_type", "b", "m_reg"))
        .join(fin.select("event_type", "n_events").distinct(),
          "event_type")
        .select(col("event_type"), col("n_events"),
          col("nonzero_regs"), col("hll_estimate"))
        .orderBy("event_type")
    }),

    // Streaming priority sampling (Duffield–Lund–Thorup) per type:
    // state = rows-seen + exact Σw + the 51 LARGEST (q, id, w)
    // triples (q = w/u, u from the Knuth hash — identical to
    // q_pps_sample). Max-merge is order-independent, so the read-back
    // equals the batch priority rank regardless of batching; the
    // threshold estimator Σ max(w, τ) over the top-50 audits against
    // the exact streamed total.
    "s_stream_pps" -> ((s, d) => {
      import s.implicits._
      val out = tmp("spps_out")
      val ev = readEventsStream(s, eventsDir(d, "spps_in"))
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("w"))
        .filter(col("w") > 0)
        .withColumn("u",
          expr("CAST(pmod(CAST(event_id AS DECIMAL(38,0))" +
            " * 2654435761, 9223372036854775808) + 1 AS DOUBLE)" +
            " / 9.223372036854776e18"))
        .select(col("event_type"), col("event_id"),
          col("w"), (col("w") / col("u")).as("q"))
        .as[(String, Long, Long, Double)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long, List[(Double, Long, Long)]),
            (String, Long, Long, Long, Double, Double)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, Long, List[(Double, Long, Long)])]) =>
              var (n, sw, top) = state.getOption
                .getOrElse((0L, 0L, List.empty[(Double, Long, Long)]))
              rows.foreach { r =>
                n += 1; sw += r._3
                val cand = (r._4, r._2, r._3)
                if (top.length < 51 || implicitly[Ordering[(Double, Long)]]
                    .lt((-cand._1, cand._2), (-top.last._1, top.last._2)))
                  top = (cand :: top)
                    .sortBy(x => (-x._1, x._2)).take(51)
              }
              state.update((n, sw, top))
              val tau = if (top.length > 50) top.last._1 else 0.0
              val est = top.take(50)
                .map(x => math.max(x._3.toDouble, tau)).sum
              Iterator((t, n, sw, math.min(50, top.length).toLong,
                tau, est))
          }
          .toDF("event_type", "n", "sw", "k", "tau", "est")
      }
      runToParquet(scored, out, tmp("spps_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("n"), col("sw"), col("k"), col("tau"),
          col("est"))).as("f"))
        .select(col("event_type"), col("f.n").as("n_pop"),
          col("f.k").as("k"),
          round(col("f.sw") / 100.0, 2).as("true_total"),
          round(col("f.est") / 100.0, 2).as("pps_estimate"),
          round(abs(col("f.est") - col("f.sw")) / col("f.sw"), 6)
            .as("rel_err"))
        .orderBy("event_type")
    }),

    // Streaming SPRT per type (H0 p=0.4 vs H1 p=0.5 on the value >
    // 50.00 indicator, α=β=0.05): O(1) state = (rows seen, cumulative
    // snapped LLR, frozen decision + its row count + its LLR). The
    // LLR increments and the ±ln(19) bound live on the exact 1e9
    // integer grid, so the sequential fold is bit-reproducible.
    "s_stream_sprt" -> ((s, d) => {
      import s.implicits._
      val out = tmp("ssprt_out")
      val incA = math.round(math.log(1.25) * 1e9)
      val incB = math.round(math.log(5.0 / 6.0) * 1e9)
      val bound = math.round(math.log(19.0) * 1e9)
      val ev = readEventsStream(s, eventsDir(d, "ssprt_in"))
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), round(col("value") * 100).cast("long").as("vc"))
        .as[(String, Long, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long, Int, Long, Long),
            (String, Long, Long, Int, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[(Long, Long, Int, Long, Long)]) =>
              var (rn, cum, dec, nDec, llrDec) = state.getOption
                .getOrElse((0L, 0L, 0, 0L, 0L))
              rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
                rn += 1
                cum += (if (r._4 > 5000L) incA else incB)
                if (dec == 0) {
                  if (cum >= bound) { dec = 1; nDec = rn; llrDec = cum }
                  else if (cum <= -bound) { dec = 2; nDec = rn; llrDec = cum }
                }
              }
              state.update((rn, cum, dec, nDec, llrDec))
              Iterator((t, rn, cum, dec, nDec, llrDec))
          }
          .toDF("event_type", "rn", "cum", "dec", "n_dec", "llr_dec")
      }
      runToParquet(scored, out, tmp("ssprt_ckpt"))
      s.read.parquet(out).groupBy("event_type")
        .agg(max(struct(col("rn"), col("cum"), col("dec"),
          col("n_dec"), col("llr_dec"))).as("f"))
        .select(col("event_type"),
          when(col("f.dec") === 1, "accept_h1")
            .when(col("f.dec") === 2, "accept_h0")
            .otherwise("continue").as("decision"),
          when(col("f.dec") =!= 0, col("f.n_dec")).otherwise(col("f.rn"))
            .as("n_events"),
          round(when(col("f.dec") =!= 0, col("f.llr_dec"))
            .otherwise(col("f.cum"))
            .cast("double") / 1e9, 6).as("llr"))
        .orderBy("event_type")
    }),

    // Streaming 16-lane MinHash signature per source over the
    // DOCUMENT stream: state = 16 lane minima + a docs-seen counter.
    // Min-merge commutes, so the state is ORDER-INDEPENDENT (the
    // mergeable-sketch property, like s_stream_hll) and the read-back
    // equals the batch per-(source, lane) minimum exactly. Doc key =
    // the 60-bit md5 prefix of the text; lane hashes are the affine
    // (x·(2654435761 + 2i) + i·2246822519) mod 2^63 family, computed
    // in exact BigInteger space to match the oracle's HUGEINT.
    "s_stream_minhash" -> ((s, d) => {
      import s.implicits._
      val in = stageTable(d, "documents", "sminh_in")
      val out = tmp("sminh_out")
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType)))
      val ev = s.readStream.schema(docSchema).parquet(in)
        .select(col("source"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10)" +
            " AS BIGINT)").as("x"))
        .as[(String, Long)]
      val M = java.math.BigInteger.valueOf(Long.MinValue).negate() // 2^63
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Array[Long]),
            (String, Long, Seq[Long])](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (src, rows, state: GroupState[(Long, Array[Long])]) =>
              var (n, mins) = state.getOption.getOrElse(
                (0L, Array.fill(16)(Long.MaxValue)))
              rows.foreach { r =>
                n += 1
                val x = java.math.BigInteger.valueOf(r._2)
                var i = 0
                while (i < 16) {
                  val h = x.multiply(java.math.BigInteger.valueOf(
                      2654435761L + 2L * i))
                    .add(java.math.BigInteger.valueOf(2246822519L * i))
                    .mod(M).longValueExact()
                  if (h < mins(i)) mins(i) = h
                  i += 1
                }
              }
              state.update((n, mins))
              Iterator((src, n, mins.toSeq))
          }
          .toDF("source", "n", "mins")
      }
      runToParquet(scored, out, tmp("sminh_ckpt"))
      s.read.parquet(out).groupBy("source")
        .agg(max(struct(col("n"), col("mins"))).as("f"))
        .select(col("source"), col("f.n").as("n_docs"),
          posexplode(col("f.mins")).as(Seq("lane", "min_h")))
        .select(col("source"), col("n_docs"),
          col("lane").cast("long").as("lane"), col("min_h"))
        .orderBy("source", "lane")
    }),

    // Streaming SLO burn-rate monitor: state = per-HOUR exact
    // (events, errors) counters — count-merge commutes, so the state
    // is ORDER-INDEPENDENT; the read-back assembles the identical
    // multiwindow page/ticket table as q_slo_burn (whose oracle this
    // key reuses verbatim at the contract level).
    "s_stream_slo" -> ((s, d) => {
      import s.implicits._
      val out = tmp("sslo_out")
      val ev = readEventsStream(s, eventsDir(d, "sslo_in"))
        .select(unix_micros(date_trunc("hour", col("ts"))).as("hus"),
          when(col("event_type") === "error", 1L).otherwise(0L)
            .as("e"))
        .as[(Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (h, rows, state: GroupState[(Long, Long)]) =>
              var (n, x) = state.getOption.getOrElse((0L, 0L))
              rows.foreach { r => n += 1; x += r._2 }
              state.update((n, x))
              Iterator((h, n, x))
          }
          .toDF("hus", "n", "x")
      }
      runToParquet(scored, out, tmp("sslo_ckpt"))
      // trailing RANGE frames on the hour epoch (matches q_slo_burn's
      // r10 ADVICE fix): sparse hours never stitch together.
      // bounded grain: input is the per-hour SLO rollup — one row per
      // hour-of-history, never corpus-sized
      val wo6 = org.apache.spark.sql.expressions.Window
        .orderBy("he").rangeBetween(-5, 0)
      val wo24 = org.apache.spark.sql.expressions.Window
        .orderBy("he").rangeBetween(-23, 0)
      s.read.parquet(out).groupBy("hus")
        .agg(max(struct(col("n"), col("x"))).as("f"))
        .select(expr("timestamp_micros(hus)").as("h"),
          (col("hus") / lit(3600000000L)).cast("long").as("he"),
          col("f.n").as("n"), col("f.x").as("x"))
        .withColumn("n6", sum("n").over(wo6))
        .withColumn("x6", sum("x").over(wo6))
        .withColumn("n24", sum("n").over(wo24))
        .withColumn("x24", sum("x").over(wo24))
        .withColumn("b1", col("x").cast("double") / col("n") / 0.01)
        .withColumn("b6", col("x6").cast("double") / col("n6") / 0.01)
        .withColumn("b24",
          col("x24").cast("double") / col("n24") / 0.01)
        .select(col("h").cast("timestamp_ntz").as("h"), col("n"),
          col("x"),
          round(col("b1"), 4).as("burn_1h"),
          round(col("b6"), 4).as("burn_6h"),
          round(col("b24"), 4).as("burn_24h"),
          when(col("b1") > 14.4 && col("b6") > 14.4, 1L).otherwise(0L)
            .as("page"),
          when(col("b6") > 6.0 && col("b24") > 6.0, 1L).otherwise(0L)
            .as("ticket"))
        .orderBy("h")
    }),

    // Streaming log2 value histogram per type: state = counts per
    // power-of-two bucket (≤ 40 longs — count-merge commutes, so the
    // state is ORDER-INDEPENDENT); read-back rebuilds the exact
    // q_log2_hist table and reuses its oracle verbatim.
    "s_stream_log2_hist" -> ((s, d) => {
      import s.implicits._
      val out = tmp("sl2h_out")
      val ev = readEventsStream(s, eventsDir(d, "sl2h_in"))
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("v_c"))
        .filter(col("v_c") >= 1)
        .withColumn("bucket", (length(expr("bin(v_c)")) - 1)
          .cast("long"))
        .as[(String, Long, Long)]
      val scored = withBoundedStatePartitions(s) {
        ev.groupByKey(_._1)
          .flatMapGroupsWithState[Map[Long, Long],
            (String, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            case (t, rows, state: GroupState[Map[Long, Long]]) =>
              var m = state.getOption.getOrElse(Map.empty[Long, Long])
              rows.foreach { r =>
                m = m.updated(r._3, m.getOrElse(r._3, 0L) + 1) }
              state.update(m)
              m.iterator.map { case (b, n) => (t, b, n) }
          }
          .toDF("event_type", "bucket", "n")
      }
      runToParquet(scored, out, tmp("sl2h_ckpt"))
      s.read.parquet(out).groupBy("event_type", "bucket")
        .agg(max("n").as("n"))
        .select(col("event_type"), col("bucket"),
          expr("shiftleft(1L, cast(bucket as int))").as("lo"),
          (expr("shiftleft(1L, cast(bucket as int) + 1)") - 1).as("hi"),
          col("n"))
        .orderBy("event_type", "bucket")
    })
  )

  private val knuthHuge =
    "((CAST(event_id AS HUGEINT) * 2654435761) % 9223372036854775808)"

  val oracle: Map[String, String] = Map(
    // the q_slo_burn batch oracle verbatim — hourly count-merge state
    // reconstructs the identical hour grid
    "s_stream_slo" -> graft.queries.StatsR10q.oracle("q_slo_burn"),

    // the q_log2_hist batch oracle verbatim — per-bucket count-merge
    // state reconstructs the identical histogram
    "s_stream_log2_hist" -> graft.queries.StatsR9p.oracle("q_log2_hist"),

    // batch per-(source, lane) minimum — the exact twin of the
    // order-independent min-merge state
    "s_stream_minhash" ->
      """WITH x AS (
        |  SELECT source,
        |    CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS x
        |  FROM documents),
        |lanes AS (SELECT unnest(generate_series(0, 15)) AS lane),
        |m AS (
        |  SELECT source, lane,
        |    MIN(CAST((CAST(x AS HUGEINT) * (2654435761 + 2 * lane)
        |      + 2246822519 * lane) % 9223372036854775808 AS BIGINT))
        |      AS min_h,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM x, lanes GROUP BY 1, 2)
        |SELECT source, n_docs, CAST(lane AS BIGINT) AS lane, min_h
        |FROM m ORDER BY source, lane""".stripMargin,

    // the batch min-priority rank twin
    "s_stream_reservoir" ->
      s"""WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS vc,
        |    $knuthHuge AS pr
        |  FROM events),
        |rk AS (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY pr, event_id) AS rk
        |  FROM ev)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN rk <= 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS k,
        |  ROUND(CAST(SUM(CASE WHEN rk <= 64 THEN vc ELSE 0 END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN rk <= 64 THEN 1 ELSE 0 END) / 100, 4)
        |    AS sample_mean
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    // the batch priority-sampling twin verbatim — the streaming
    // max-merge state reconstructs exactly the batch priority rank
    "s_stream_pps" -> graft.queries.StatsR10.oracle("q_pps_sample"),

    // the recursive-CTE twin of the md5 chain recursion per source
    "s_stream_provenance" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents),
        |r AS (
        |  SELECT source, rn, h AS chain, n FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.rn, md5(r.chain || d.h), r.n
        |  FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1)
        |SELECT source, n AS n_docs, chain AS chain_fingerprint
        |FROM r WHERE rn = n
        |ORDER BY source""".stripMargin,

    // the batch twin of the windowed sharded Bloom: min-setter rank
    // per (shard, bit) over windows in (doc_id, window-index) order
    "s_stream_substring_dup" ->
      """WITH js AS (SELECT UNNEST([0, 1, 2]) AS j),
        |w AS (
        |  SELECT doc_id,
        |    UNNEST(generate_series(1,
        |      len(string_split(text, ' ')) - 9)) AS i
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10),
        |wh AS (
        |  SELECT w.doc_id, w.i,
        |    CAST(CAST('0x' || substring(
        |      md5(array_to_string(
        |        string_split(d.text, ' ')[w.i:w.i+9], ' ')), 1, 15)
        |      AS UBIGINT) AS BIGINT) AS h
        |  FROM w JOIN documents d ON w.doc_id = d.doc_id),
        |sh AS (
        |  SELECT doc_id, i, h,
        |    ((CAST(h AS HUGEINT) * 2654435761)
        |      % 9223372036854775808) % 8 AS shard
        |  FROM wh),
        |rn AS (
        |  SELECT shard, h,
        |    CAST(row_number() OVER (PARTITION BY shard
        |      ORDER BY doc_id, i) AS BIGINT) AS rn
        |  FROM sh),
        |bh AS (
        |  SELECT rn.shard, rn.rn, js.j,
        |    ((CAST(rn.h AS HUGEINT)
        |      * (CASE js.j WHEN 0 THEN 2654435761
        |        WHEN 1 THEN 2246822519 ELSE 3266489917 END)
        |      + (CASE js.j WHEN 0 THEN 1 WHEN 1 THEN 7 ELSE 13 END))
        |      % 9223372036854775808)
        |      % 2147483647 % 4096 AS hb
        |  FROM rn, js),
        |mb AS (SELECT shard, hb, MIN(rn) AS mr FROM bh GROUP BY 1, 2),
        |fl AS (
        |  SELECT bh.shard, bh.rn
        |  FROM bh JOIN mb ON bh.shard = mb.shard AND bh.hb = mb.hb
        |  GROUP BY bh.shard, bh.rn
        |  HAVING SUM(CASE WHEN mb.mr < bh.rn THEN 1 ELSE 0 END) = 3),
        |ag AS (
        |  SELECT
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM wh) AS n_windows,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM fl) AS n_flagged)
        |SELECT n_windows, n_flagged,
        |  ROUND(CAST(n_flagged AS DOUBLE) / n_windows, 6) AS flag_rate
        |FROM ag""".stripMargin,

    // the batch register math verbatim (StatsR10f.hllOracle) — the
    // streaming max-merge registers ARE the batch registers
    "s_stream_hll" ->
      s"""${graft.queries.StatsR10f.hllOracle},
        |cnt AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT est.event_type, cnt.n_events,
        |  CAST(est.nonzero_regs AS BIGINT) AS nonzero_regs,
        |  ROUND(est.e, 4) AS hll_estimate
        |FROM est JOIN cnt ON est.event_type = cnt.event_type
        |ORDER BY est.event_type""".stripMargin,

    // the batch first-crossing twin (identical snapped grid): decided
    // types report the frozen (n, llr) at the crossing; 'continue'
    // types report the final row count and final cumulative LLR
    "s_stream_sprt" ->
      """WITH sq AS (
        |  SELECT event_type,
        |    CASE WHEN CAST(ROUND(value * 100) AS BIGINT) > 5000
        |      THEN CAST(ROUND(LN(1.25) * 1e9) AS BIGINT)
        |      ELSE CAST(ROUND(LN(5.0 / 6.0) * 1e9) AS BIGINT) END
        |      AS inc,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |  FROM events),
        |cm AS (
        |  SELECT event_type, rn,
        |    SUM(inc) OVER (PARTITION BY event_type ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum,
        |    CAST(ROUND(LN(19.0) * 1e9) AS BIGINT) AS b
        |  FROM sq),
        |crossed AS (
        |  SELECT event_type,
        |    CASE WHEN cum >= b THEN 'accept_h1'
        |      ELSE 'accept_h0' END AS decision,
        |    rn AS n_events, ROUND(cum / 1e9, 6) AS llr,
        |    row_number() OVER (PARTITION BY event_type ORDER BY rn)
        |      AS crn
        |  FROM cm WHERE cum >= b OR cum <= -b),
        |finals AS (
        |  SELECT event_type, 'continue' AS decision, rn AS n_events,
        |    ROUND(cum / 1e9, 6) AS llr,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY rn DESC) AS lrn
        |  FROM cm
        |  WHERE event_type NOT IN (SELECT event_type FROM crossed))
        |SELECT event_type, decision, n_events, llr FROM crossed
        |WHERE crn = 1
        |UNION ALL
        |SELECT event_type, decision, n_events, llr FROM finals
        |WHERE lrn = 1
        |ORDER BY event_type""".stripMargin
  )
}
