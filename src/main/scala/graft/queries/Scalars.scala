package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** B.8 scalar functions: string / regex / date / math / conditional /
  * cast / array / generator / json (SURVEY.md §2).
  *
  * All expressions are built-in Catalyst exprs (whole-stage-codegen
  * friendly — no UDFs anywhere on this path). Cross-engine type gaps
  * (DuckDB BIGINT vs Spark INT for length/rank/year etc., TINYINT
  * sign, rounding double→int casts) are resolved by explicit casts on
  * the ORACLE side so the Spark plan stays natural (SURVEY.md §7.6).
  */
object Scalars {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("low_brand"),
          substring(col("p_name"), 1, 8).as("sub_name"),
          lpad(col("p_brand"), 12, "*").as("pad_brand"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("und_name"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"))
        .orderBy("p_partkey")
        .limit(500)),

    "q_str_regex" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
          col("p_name").rlike("^(red|blue)").as("is_colored"))
        .orderBy("p_partkey")
        .limit(500)),

    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          // ntz: keep the parquet output free of a tz annotation (the
          // driver compares against DuckDB's naive TIMESTAMP)
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          add_months(col("o_orderdate"), 3).as("plus3mo"),
          last_day(col("o_orderdate")).as("month_end"),
          expr("weekday(o_orderdate)").as("wd"))
        .orderBy("o_orderkey")
        .limit(500)),

    // Generated calendar dimension (one year): the warehouse date-dim
    // build as a pure generator query — `sequence` over dates plus
    // derived attributes, no table input. dow is ISO (Mon=1) via
    // Spark's weekday()+1 ≡ DuckDB isodow (the B.8 documented-mapping
    // rule); week-of-year is deliberately absent (ISO-week year
    // boundaries differ subtly across engines — SURVEY §7.6.6 class).
    "q_calendar_dim" -> ((s, _) =>
      s.range(1)
        .select(explode(expr(
          "sequence(to_date('1995-01-01'), to_date('1995-12-31'))")).as("dt"))
        .select(col("dt"),
          year(col("dt")).as("y"), quarter(col("dt")).as("q"),
          month(col("dt")).as("m"), dayofmonth(col("dt")).as("d"),
          dayofyear(col("dt")).as("doy"),
          (expr("weekday(dt)") + 1).as("dow_iso"),
          (expr("weekday(dt)") + 1 >= 6).as("is_weekend"),
          dayofmonth(last_day(col("dt"))).as("days_in_month"))
        .orderBy("dt")),

    // Bitwise function family over exact integers — the last scalar
    // family the surface was missing (masking, packing, popcount: the
    // ops feature-hashing and bitmap-index code lean on).
    "q_bitwise" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          bitwise_not(col("event_id")).as("bnot"),
          (col("event_id") bitwiseAND lit(255L)).as("band"),
          (col("event_id") bitwiseOR lit(4096L)).as("bor"),
          (col("event_id") bitwiseXOR col("user_id")).as("bxor"),
          expr("shiftleft(event_id, 3)").as("shl"),
          expr("shiftright(event_id, 2)").as("shr"),
          expr("bit_count(event_id)").as("pop"),
          expr("bit_get(event_id, 4)").as("bit4"))
        .orderBy("event_id")),

    "q_math_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          signum(col("l_discount") - 0.05).as("sgn_d"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          floor(col("l_extendedprice")).as("floor_p"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          (col("l_orderkey") % 7).as("key_mod"),
          greatest(col("l_quantity"), col("l_extendedprice") / 1000.0).as("gr"),
          least(col("l_quantity"), col("l_extendedprice") / 1000.0).as("le"))
        // sqrt_p is strictly monotone in l_extendedprice, which
        // completes the unique lineitem key (l_orderkey, l_linenumber
        // alone has duplicates in this data).
        .orderBy("l_orderkey", "l_linenumber", "sqrt_p")
        .limit(500)),

    "q_cond_expr" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          when(col("c_acctbal") > 7500.0, "high")
            .when(col("c_acctbal") > 2500.0, "mid")
            .otherwise("low").as("tier"),
          coalesce(
            when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
              .otherwise(col("c_mktsegment")),
            lit("(none)")).as("seg2"),
          least(col("c_acctbal"), lit(5000.0)).as("capped"),
          greatest(col("c_acctbal"), lit(0.0)).as("floored"))
        .orderBy("c_custkey")),

    "q_cast_types" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          // decimal arithmetic stays internal; the FINAL column is the
          // canonical string rendering (the driver's hasher cannot
          // digest Arrow decimals — values matched, hashes didn't)
          col("l_extendedprice").cast("decimal(18,6)").cast("string").as("price_dec"),
          col("l_extendedprice").cast("decimal(18,6)").cast("string").as("price_str"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_shipdate").cast("date").cast("string").as("ship_str"))
        .orderBy("l_orderkey", "l_linenumber", "price_dec")
        .limit(500)),

    "q_array_funcs" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_toks"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"),
          size(array_distinct(split(col("text"), " "))).as("n_vocab"),
          // list results serialize to joined strings in the final
          // projection — array-typed output columns crash the driver's
          // comparator (pandas row-sort can't hash ndarrays)
          array_join(sort_array(array_distinct(split(col("text"), " "))), ",").as("vocab"),
          array_join(slice(split(col("text"), " "), 1, 5), ",").as("first5"))
        .orderBy("doc_id")
        .limit(500)),

    "q_explode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)),

    // Structured JSON surface (schema-projected from_json → typed
    // struct → canonical to_json), complementing q_json_extract's
    // path extraction: this is the shape that scales — one JacksonParser
    // pass with a fixed schema instead of a path walk per field, fully
    // columnar output. The canonical re-serialization is oracle-checked
    // character-exact (DuckDB rebuilds the same '{"k":N}' string).
    "q_json_struct" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).as("p"))
        .select(col("event_id"), col("event_type"), col("p.k").as("k"),
          to_json(struct(col("p.k").as("k"))).as("canon"))
        .filter(col("k") >= 50)
        .orderBy("event_id")),

    // Spark 4 VARIANT path (r6): parse the JSON once into the binary
    // variant encoding, then typed path extraction (variant_get), a
    // missing-path try_variant_get null, and extraction from a NESTED
    // constructed document (object + array). Variant is the
    // semi-structured shape that scales: one parse into a shredded
    // binary form, every downstream extract is a cheap typed probe —
    // versus get_json_object re-walking the text per field
    // (q_json_extract keeps that classic path for contrast).
    "q_json_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("parse_json(props)").as("v"),
          expr("parse_json(to_json(named_struct(" +
            "'uid', user_id, 'arr', array(value, value * 2), " +
            "'nest', named_struct('inner', event_id))))").as("doc"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("try_variant_get(v, '$.absent', 'int')").as("absent"),
          expr("variant_get(doc, '$.uid', 'bigint')").as("uid"),
          expr("variant_get(doc, '$.arr[1]', 'double')").as("val2"),
          expr("variant_get(doc, '$.nest.inner', 'bigint')").as("inner_id"))
        .filter(col("k") < 10)
        .orderBy("event_id")),

    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("k"), 4).as("avg_k"),
          min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("event_type"))
  )

  val oracle: Map[String, String] = Map(
    "q_calendar_dim" ->
      """SELECT dt, CAST(year(dt) AS INT) AS y, CAST(quarter(dt) AS INT) AS q,
        |  CAST(month(dt) AS INT) AS m, CAST(day(dt) AS INT) AS d,
        |  CAST(dayofyear(dt) AS INT) AS doy, CAST(isodow(dt) AS INT) AS dow_iso,
        |  isodow(dt) >= 6 AS is_weekend,
        |  CAST(day(last_day(dt)) AS INT) AS days_in_month
        |FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01',
        |        DATE '1995-12-31', INTERVAL 1 DAY)) AS DATE) AS dt)
        |ORDER BY dt""".stripMargin,
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_brand) AS low_brand,
        |  substring(p_name, 1, 8) AS sub_name,
        |  lpad(p_brand, 12, '*') AS pad_brand,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  replace(p_name, ' ', '_') AS und_name,
        |  trim('  ' || p_name || '  ') AS trimmed
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,

    "q_str_regex" ->
      """SELECT p_partkey, p_name,
        |  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
        |  regexp_matches(p_name, '^(red|blue)') AS is_colored
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS wd
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,

    "q_bitwise" ->
      """SELECT event_id,
        |  ~event_id AS bnot,
        |  event_id & 255 AS band,
        |  event_id | 4096 AS bor,
        |  xor(event_id, user_id) AS bxor,
        |  event_id << 3 AS shl,
        |  event_id >> 2 AS shr,
        |  CAST(bit_count(event_id) AS INT) AS pop,
        |  CAST((event_id >> 4) & 1 AS TINYINT) AS bit4
        |FROM events ORDER BY event_id""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_d,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn_d,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |  ROUND(sqrt(l_extendedprice), 6) AS sqrt_p,
        |  ROUND(ln(l_extendedprice), 6) AS ln_p,
        |  ROUND(log10(l_extendedprice), 6) AS log10_p,
        |  pow(l_quantity, 2) AS qty_sq,
        |  l_orderkey % 7 AS key_mod,
        |  greatest(l_quantity, l_extendedprice / 1000.0) AS gr,
        |  least(l_quantity, l_extendedprice / 1000.0) AS le
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, sqrt_p LIMIT 500""".stripMargin,

    "q_cond_expr" ->
      """SELECT c_custkey, c_acctbal,
        |  CASE WHEN c_acctbal > 7500.0 THEN 'high'
        |       WHEN c_acctbal > 2500.0 THEN 'mid'
        |       ELSE 'low' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg2,
        |  least(c_acctbal, 5000.0) AS capped,
        |  greatest(c_acctbal, 0.0) AS floored
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_cast_types" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(trunc(l_quantity) AS INT) AS qty_int,
        |  CAST(l_linenumber AS DOUBLE) AS ln_dbl,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR) AS price_dec,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR) AS price_str,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_dec LIMIT 500""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_vocab,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab,
        |  array_to_string(list_slice(string_split(text, ' '), 1, 5), ',') AS first5
        |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin,

    "q_explode" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "q_json_struct" ->
      """SELECT event_id, event_type, k, '{"k":' || k || '}' AS canon
        |FROM (SELECT event_id, event_type,
        |        CAST(props->>'$.k' AS INT) AS k FROM events)
        |WHERE k >= 50 ORDER BY event_id""".stripMargin,

    // the oracle recomputes every extraction from the raw columns —
    // equality proves the parse->variant->typed-probe round trip
    "q_json_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k,
        |  CAST(NULL AS INT) AS absent,
        |  user_id AS uid,
        |  value * 2 AS val2,
        |  event_id AS inner_id
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS INT) < 10
        |ORDER BY event_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(AVG(k), 4) AS avg_k, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type, CAST(props->>'$.k' AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
