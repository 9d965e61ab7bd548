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
  private[queries] def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % 10000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~10% deterministic sample of documents by key hash.
    "q_sample_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", bucket(col("doc_id")))
        .filter(col("bucket") < 1000)
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")),

    // Importance sampling: per-row keep probability proportional to a
    // quality proxy (longer docs keep more often, capped at 1) — the
    // curation knob between uniform sampling and hard filtering. The
    // threshold lives ENTIRELY in integer space (least(10000,
    // n_chars·25) vs the md5 bucket): a double threshold would round
    // differently across engines at the bucket boundary (the
    // q_domain_mix lesson — Spark CAST truncates, DuckDB rounds).
    "q_weighted_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("thresh", least(lit(10000), col("n_chars") * lit(25)))
        .withColumn("bucket", bucket(col("doc_id")))
        .filter(col("bucket") < col("thresh"))
        .select(col("doc_id"), col("bucket"),
          (col("thresh") / lit(10000.0)).as("w"))
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

    // Capstone: the whole training-data pipeline as ONE declarative
    // plan — quality gate → language gate → exact dedup → 50%
    // deterministic sample → per-language stats. Each stage is an
    // operator proven above; composed they stay a single Catalyst plan
    // (filters fused into the scan, one aggregation at the end).
    "q_pipeline_e2e" -> ((s, d) => {
      graft.expr.Registry.ensure(s) // RewriteWindowTopK for the rn=1 dedup
      val toks = split(col("text"), " ")
      val quality = Tables.documents(s, d)
        .withColumn("n_toks", size(toks))
        .filter(col("n_toks").between(30, 80) &&
                length(col("text")).cast("double") / col("n_toks") < 8.0)
      val langGated = quality
        .withColumn("pred", TextSim.langId(col("text")))
        .filter(col("pred") =!= "zh")
      val deduped = langGated
        .withColumn("h", md5(col("text")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("h").orderBy("doc_id")))
        .filter(col("rn") === 1)
      deduped
        .withColumn("bucket", bucket(col("doc_id")))
        .filter(col("bucket") < 5000)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("n_toks"), 4).as("avg_toks"))
        .orderBy("lang")
    }),

    // Train/test CONTAMINATION check: held-out documents (val + test
    // splits) that are near-duplicates (token Jaccard >= 0.8) of any
    // train-split document — the leakage audit every eval pipeline
    // needs. Pair generation is the BIPARTITE set-similarity join
    // (held-out x train only): with a ~20% held-out side this is ~4x
    // fewer candidates than the all-pairs self-join + post-filter it
    // replaces (r2 shape, 9 s of the r2 bench). Sides come from the
    // same deterministic hash split as q_train_test_split.
    "q_contamination" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      // token-hash table from the session memo (r13 opt) — shared with
      // the LSH keys; the hash split rides on top as a projection
      val hs = graft.operators.EdgeGraph.tokenHashes(s, d)
        .withColumn("b", bucket(col("doc_id")))
      val heldOut = hs.filter(col("b") >= 8000).drop("b")
      val train = hs.filter(col("b") < 8000).drop("b")
      graft.operators.SetSimJoin.autoBetween(s, heldOut, train, tau = 0.8)
        .groupBy(col("l_id").as("test_id"))
        .agg(count(lit(1)).as("n_matches"), max("jaccard").as("max_j"),
          min("r_id").as("example_train_id"))
        .orderBy("test_id")
    }),

    // Stratified deterministic sample: 20 docs per language, chosen by
    // hash order (not arrival order) so the stratum sample is stable.
    "q_stratified_sample" -> ((s, d) => {
      graft.expr.Registry.ensure(s) // RewriteWindowTopK for the 20-per-stratum window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("bucket"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("bucket", bucket(col("doc_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("lang", "doc_id", "bucket", "rn")
        .orderBy("lang", "rn")
    }),

    // Class rebalancing (r5): downsample every language to the
    // SMALLEST class size — the "balance the training mix" op where
    // the cap is DATA-DERIVED (min class count), unlike
    // q_stratified_sample's fixed 20. Selection is the deterministic
    // hash order (bucket, doc_id), so the kept set is a pure function
    // of the corpus; the min count is a 1-row broadcast cross join
    // (the only driver-visible scalar is inside the plan, not
    // collected). Output keeps the audit columns: per-lang original
    // count, kept count (all equal the min), and the exact kept-id
    // sum proving both engines selected the SAME rows. The per-lang
    // window shuffles once on lang; at corpus scale the same plan
    // runs on a per-class hash partitioning.
    "q_label_balance" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("bucket"), col("doc_id"))
      val docs = Tables.documents(s, d)
        .withColumn("bucket", bucket(col("doc_id")))
      val minCnt = docs.groupBy("lang").agg(count(lit(1)).as("c"))
        .agg(min("c").as("m"))
      docs.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(minCnt))
        .withColumn("kept", col("rn") <= col("m"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("kept"), 1)).as("n_kept"),
          sum(when(col("kept"), col("doc_id"))).as("sum_kept_id"))
        .orderBy("lang")
    }),

    // Deterministic k-fold cross-validation assignment (k=5): fold =
    // md5-bucket of the row key mod k, so membership is stable under
    // re-partitioning, scale-out and engine choice — the same
    // contract as the train/test split, generalized to k folds. The
    // rollup proves the property that matters: every fold's size and
    // label mass lands within sampling noise of 1/k.
    "q_crossval_folds" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("fold", bucket(col("o_orderkey")) % 5)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("o_custkey").as("n_cust"),
          // exact integer cents: a 4dp-rounded double sum at ~1e10
          // magnitude diverges across engine summation orders
          sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .orderBy("fold")),

    // Entity-consistent sampling: sample ~20% of CUSTOMERS by key
    // hash, then take every order and lineitem OF those customers —
    // the train/serve-consistency rule (sampling rows independently
    // per table would break referential joins downstream). The
    // summary proves the closure: sampled entity count + exact
    // integer-cents order mass + lineitem count, all reproducible on
    // any engine/cluster size.
    "q_sample_consistent" -> ((s, d) => {
      val picked = Tables.customer(s, d)
        .filter(bucket(col("c_custkey")) < 2000)
        .select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .join(picked, col("o_custkey") === col("c_custkey"))
      val li = Tables.lineitem(s, d)
        .join(o.select(col("o_orderkey").as("k")), col("l_orderkey") === col("k"))
      val a = picked.agg(count(lit(1)).as("n_cust"))
      val b = o.agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("order_cents"))
      val c = li.agg(count(lit(1)).as("n_lineitems"))
      a.crossJoin(b).crossJoin(c)
    }),

    // Diversity-capped top-k: per language the 5 longest documents
    // with AT MOST 2 per source — the source-cap rule data-mixing
    // recipes apply so no single domain dominates a curated slice.
    // Two stacked rank windows (within (lang, source), then within
    // lang over the survivors); both are per-group sorts with O(1)
    // running state, and RewriteWindowTopK can lower either to the
    // bounded-heap TopKPerGroup plan.
    "q_topk_diverse" -> ((s, d) => {
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "source").orderBy(col("n_chars").desc, col("doc_id"))
      val wLang = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn_src", row_number().over(wSrc))
        .filter(col("rn_src") <= 2)
        .withColumn("rn", row_number().over(wLang))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("rn"), col("doc_id"), col("source"),
          col("n_chars"))
        .orderBy("lang", "rn")
    })
  )

  private val bucketSql =
    "CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 10000 AS INT)"

  private val orderBucketSql =
    "CAST(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS INT) % 10000 AS INT)"

  val oracle: Map[String, String] = Map(
    "q_sample_consistent" ->
      """WITH picked AS (
        |  SELECT c_custkey FROM customer
        |  WHERE CAST(CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 4)
        |    AS INT) % 10000 AS INT) < 2000),
        |o AS (SELECT * FROM orders JOIN picked ON o_custkey = c_custkey)
        |SELECT
        |  (SELECT COUNT(*) FROM picked) AS n_cust,
        |  (SELECT COUNT(*) FROM o) AS n_orders,
        |  (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   FROM o) AS order_cents,
        |  (SELECT COUNT(*) FROM lineitem JOIN o ON l_orderkey = o_orderkey)
        |    AS n_lineitems""".stripMargin,

    "q_topk_diverse" ->
      """WITH s1 AS (
        |  SELECT lang, source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang, source
        |                       ORDER BY n_chars DESC, doc_id) AS rn_src
        |  FROM documents),
        |s2 AS (
        |  SELECT lang, doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM s1 WHERE rn_src <= 2)
        |SELECT lang, CAST(rn AS INT) AS rn, doc_id, source, n_chars
        |FROM s2 WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,

    "q_crossval_folds" ->
      s"""SELECT $orderBucketSql % 5 AS fold,
         |  COUNT(*) AS n_rows,
         |  COUNT(DISTINCT o_custkey) AS n_cust,
         |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM orders GROUP BY 1 ORDER BY fold""".stripMargin,

    "q_weighted_sample" ->
      s"""SELECT doc_id, $bucketSql AS bucket,
         |  LEAST(10000, n_chars * 25) / 10000.0 AS w
         |FROM documents
         |WHERE $bucketSql < LEAST(10000, n_chars * 25)
         |ORDER BY doc_id""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id, lang, $bucketSql AS bucket
         |FROM documents WHERE $bucketSql < 1000 ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
         |  FROM tok a JOIN tok b
         |    ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a_id, b_id, ROUND(j, 4) AS jaccard FROM (
         |    SELECT a_id, b_id, i * 1.0 / (sa.n + sb.n - i) AS j
         |    FROM inter
         |    JOIN sz sa ON inter.a_id = sa.doc_id
         |    JOIN sz sb ON inter.b_id = sb.doc_id)
         |  WHERE j >= 0.8),
         |side AS (SELECT doc_id, $bucketSql < 8000 AS is_train FROM documents),
         |x AS (
         |  SELECT p.a_id, p.b_id, p.jaccard, sa.is_train AS a_train
         |  FROM pairs p
         |  JOIN side sa ON p.a_id = sa.doc_id
         |  JOIN side sb ON p.b_id = sb.doc_id
         |  WHERE sa.is_train <> sb.is_train)
         |SELECT CASE WHEN a_train THEN b_id ELSE a_id END AS test_id,
         |  COUNT(*) AS n_matches, MAX(jaccard) AS max_j,
         |  MIN(CASE WHEN a_train THEN a_id ELSE b_id END) AS example_train_id
         |FROM x GROUP BY 1 ORDER BY test_id""".stripMargin,

    "q_train_test_split" ->
      s"""SELECT split, COUNT(*) AS n_docs FROM (
         |  SELECT CASE WHEN $bucketSql < 8000 THEN 'train'
         |              WHEN $bucketSql < 9000 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents)
         |GROUP BY split ORDER BY split""".stripMargin,

    "q_pipeline_e2e" ->
      s"""WITH quality AS (
         |  SELECT doc_id, lang, text,
         |    len(string_split(text, ' ')) AS n_toks
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) BETWEEN 30 AND 80
         |    AND CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) < 8.0
         |    AND NOT regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')),
         |deduped AS (
         |  SELECT doc_id, lang, n_toks FROM (
         |    SELECT doc_id, lang, n_toks,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM quality)
         |  WHERE rn = 1)
         |SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_toks), 4) AS avg_toks
         |FROM deduped
         |WHERE $bucketSql < 5000
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT lang, doc_id, bucket, rn FROM (
         |  SELECT lang, doc_id, bucket,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS INT) AS rn
         |  FROM (SELECT lang, doc_id, $bucketSql AS bucket FROM documents))
         |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    "q_label_balance" ->
      s"""WITH d AS (SELECT lang, doc_id, $bucketSql AS bucket FROM documents),
         |r AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rn
         |  FROM d),
         |m AS (SELECT MIN(c) AS m FROM
         |  (SELECT COUNT(*) AS c FROM d GROUP BY lang))
         |SELECT lang, COUNT(*) AS n_total,
         |  COUNT(*) FILTER (WHERE rn <= m) AS n_kept,
         |  CAST(SUM(doc_id) FILTER (WHERE rn <= m) AS BIGINT) AS sum_kept_id
         |FROM r, m GROUP BY lang ORDER BY lang""".stripMargin
  )
}
