package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables

/** B.11 Ethereum-domain scalar ops — Layer-1 parity with the
  * reference's decode/scale/filter semantics (SURVEY.md §2 Part A:
  * A3 topic filter, A4 hex decode, A5 wei scaling), synthesized over
  * the `events` table since testdata carries no chain columns.
  *
  * The wei path proves uint256-style money flows through
  * DecimalType(38,0)/(38,18) end-to-end — never double — which is the
  * reference's core exactness invariant (wei > 2^53 exists on chain).
  */
object EthOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4 analog: int -> hex digest path (both engines: uppercase, unpadded).
    "q_eth_hex" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), hex(col("event_id")).as("h"))
        .orderBy("event_id")),

    // A5: value (double, ~2dp) -> exact micro-token integer -> wei
    // (DECIMAL, x10^12) -> aggregate in decimal; token display derived
    // at the edge only. The cross-engine decimal-division gap (DuckDB
    // decimal/decimal yields DOUBLE) is avoided by keeping the exact
    // value in wei and scaling for display in double explicitly.
    "q_eth_wei_scale" -> ((s, d) => {
      val micro = round(col("value") * 1e6, 0).cast(DecimalType(20, 0))
      val wei = (micro * lit(1000000000000L)).cast(DecimalType(38, 0))
      Tables.events(s, d)
        .select(col("event_type"), wei.as("wei"))
        .groupBy("event_type")
        .agg(sum("wei").cast(DecimalType(38, 0)).as("wei_dec"))
        // exact wei stays DECIMAL(38,0) through the aggregate; the FINAL
        // column is its canonical digit string (driver-hashable), the
        // token display value is derived in double at the edge only
        .select(col("event_type"),
          col("wei_dec").cast("string").as("wei_total"),
          round(col("wei_dec").cast("double") / 1e18, 6).as("token_total"))
        .orderBy("event_type")
    }),

    // A4 in full: ABI-style encode→decode round-trip. Each field is
    // packed into a 64-hex-char word (uint256 ABI slot layout), then
    // decoded back with substring + base-16 conversion — the exact
    // shape of decoding an Ethereum log's data section.
    "q_eth_abi_roundtrip" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          concat(
            lpad(lower(hex(col("event_id"))), 64, "0"),
            lpad(lower(hex(col("user_id"))), 64, "0"),
            lpad(lower(hex((col("value") * 100).cast("long"))), 64, "0")).as("payload"))
        .select(col("event_id"), col("user_id"), col("payload"),
          conv(substring(col("payload"), 1, 64), 16, 10).cast("long").as("dec_event_id"),
          conv(substring(col("payload"), 65, 64), 16, 10).cast("long").as("dec_user_id"),
          conv(substring(col("payload"), 129, 64), 16, 10).cast("long").as("dec_value_c"))
        .orderBy("event_id")),

    // A3 analog: server-side topic-hash prefix filter shape.
    "q_eth_topic_filter" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("topic", md5(col("event_type")))
        .filter(col("topic").startsWith("a8") || col("topic").startsWith("cb"))
        .select("event_id", "event_type", "topic")
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "q_eth_hex" ->
      "SELECT event_id, to_hex(event_id) AS h FROM events ORDER BY event_id",

    "q_eth_wei_scale" ->
      """SELECT event_type,
        |  CAST(CAST(SUM(wei) AS DECIMAL(38,0)) AS VARCHAR) AS wei_total,
        |  ROUND(CAST(CAST(SUM(wei) AS DECIMAL(38,0)) AS DOUBLE) / 1e18, 6) AS token_total
        |FROM (
        |  SELECT event_type,
        |    CAST(round(value * 1000000.0) AS DECIMAL(20,0))
        |      * CAST(1000000000000 AS DECIMAL(20,0)) AS wei
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_eth_abi_roundtrip" ->
      """WITH enc AS (
        |  SELECT event_id, user_id,
        |    lpad(lower(to_hex(event_id)), 64, '0') ||
        |    lpad(lower(to_hex(user_id)), 64, '0') ||
        |    lpad(lower(to_hex(CAST(trunc(value * 100) AS BIGINT))), 64, '0') AS payload
        |  FROM events)
        |SELECT event_id, user_id, payload,
        |  CAST(CAST('0x' || substring(payload, 1, 64) AS UBIGINT) AS BIGINT) AS dec_event_id,
        |  CAST(CAST('0x' || substring(payload, 65, 64) AS UBIGINT) AS BIGINT) AS dec_user_id,
        |  CAST(CAST('0x' || substring(payload, 129, 64) AS UBIGINT) AS BIGINT) AS dec_value_c
        |FROM enc ORDER BY event_id""".stripMargin,

    "q_eth_topic_filter" ->
      """SELECT event_id, event_type, md5(event_type) AS topic FROM events
        |WHERE md5(event_type) LIKE 'a8%' OR md5(event_type) LIKE 'cb%'
        |ORDER BY event_id""".stripMargin
  )
}
