package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 5 (SURVEY.md §2 B.10): training-data curation ops
  * straight from the dedup/mixing literature — exact 10-gram
  * substring-duplication detection (the Lee et al. "Deduplicating
  * Training Data" exact-substring pass, windowed md5 fingerprints),
  * a DoReMi-style exponentiated-gradient mixture reweighting step
  * over per-source bigram-LM excess loss, and a MinHash estimation-
  * error audit that scores the 32-perm signatures against the exact
  * Jaccard of the memoized near-dup pairs.
  */
object StatsR10e {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Exact substring duplication (Lee et al. 2022 shape): every
    // 10-token window fingerprinted with md5 (cross-engine hash), a
    // span is DUPLICATED when it occurs in ≥ 2 distinct docs; the 20
    // most-repeated spans ship with doc and occurrence counts — the
    // verbatim-memorization audit run before training. One linear
    // explode pass (Σ tokens windows); the rollup is fingerprint-
    // bounded.
    "q_substring_dup" -> ((s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 10)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 9)," +
            " i -> md5(array_join(slice(toks, i, 10), ' ')))")).as("fp"))
      w.groupBy("fp")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min("doc_id").as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_occurrences").desc, col("fp"))
        .limit(20)
    }),

    // Exact-substring train/test leakage (the decontamination audit
    // run with q_substring_dup's fingerprints): split at doc_id
    // parity (even = train, odd = test, stated); a test doc LEAKS
    // when it shares ≥ 1 exact 10-token window with any train doc.
    // The substring complement of q_contamination's set-similarity
    // screen — verbatim leaks that J-thresholds can miss.
    "q_substring_leakage" -> ((s, d) => {
      val w = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 10)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 9)," +
            " i -> md5(array_join(slice(toks, i, 10), ' ')))")).as("fp"))
        .localCheckpoint(eager = true) // train + test legs
      val train = w.filter(col("doc_id") % 2 === 0)
        .select(col("fp")).distinct()
      val leaked = w.filter(col("doc_id") % 2 === 1)
        .join(train, "fp")
        .select(col("doc_id")).distinct()
      val nTest = Tables.documents(s, d)
        .filter(col("doc_id") % 2 === 1)
        .agg(count(lit(1)).as("n_test"))
      nTest.crossJoin(broadcast(
          leaked.agg(count(lit(1)).as("n_leaked"))))
        .filter(col("n_test") > 0)
        .select(col("n_test"), col("n_leaked"),
          round(col("n_leaked").cast("double") / col("n_test"), 6)
            .as("leak_rate"))
    }),

    // DoReMi-style mixture step (Xie et al., one exponentiated-
    // gradient update, η=1, stated): per-source mean bigram-LM
    // log-prob from the 6dp per-doc scores (the q_bigram_lm oracle
    // leg verbatim — ×1e6 exact longs from there), excess loss =
    // global mean − source mean, next weight ∝ exp(η·excess)
    // (1e9-snapped before the exact normalization). The
    // mixture-rebalancing signal a data-mixing run derives per epoch.
    "q_doremi_step" -> ((s, d) => {
      val perDoc = graft.operators.EdgeGraph.bigramScores(s, d)
        .select(col("doc_id"),
          round(round(col("avg_lp"), 6) * 1e6).cast("long").as("lp_u"))
      val src = perDoc
        .join(Tables.documents(s, d).select("doc_id", "source"),
          "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("lp_u").as("slp"))
        .localCheckpoint(eager = true) // global leg + output leg
      val g = src.agg(sum("n_docs").as("gn"), sum("slp").as("gslp"))
      val scored = src.crossJoin(broadcast(g))
        .withColumn("mean_lp", col("slp").cast("double") / col("n_docs"))
        .withColumn("excess",
          (col("gslp").cast("double") / col("gn") - col("mean_lp"))
            / 1e6)
        .withColumn("w_u",
          round(exp(col("excess")) * 1e9).cast("long"))
        .localCheckpoint(eager = true) // Σw leg + output leg
      val tot = scored.agg(sum("w_u").as("sw"))
      scored.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          round(col("mean_lp") / 1e6, 4).as("avg_logprob"),
          round(col("excess"), 6).as("excess_loss"),
          round(col("w_u").cast("double") / col("sw"), 6)
            .as("next_weight"))
        .orderBy("source")
    }),

    // MinHash estimation-error audit: the 32-perm signature's
    // Jaccard estimate (equal lanes / 32) scored against the EXACT
    // jaccard of the memoized capped τ=0.3 pair table. Per-pair error
    // lives on the lcm grid (est·1e6 = lanes·31250; exact·1e6 =
    // 4dp·100 — both exact longs), so MAE/max are exact until one
    // division. OMIT oracle (no minhash in DuckDB); R10eOpsSpec pins
    // the fold against a pure-Scala signature implementation.
    "q_minhash_error" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val pairs = graft.operators.EdgeGraph.pairs(s, d, "bigram", 0.3)
      val sigs = graft.operators.EdgeGraph.minhashSigs(s, d, 32)
      val a = sigs.select(col("doc_id").as("a_id"), col("sig").as("sa"))
      val b = sigs.select(col("doc_id").as("b_id"), col("sig").as("sb"))
      pairs.join(a, "a_id").join(b, "b_id")
        .withColumn("lanes", expr(
          "aggregate(zip_with(sa, sb, (x, y) ->" +
            " IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
        .withColumn("err_u",
          abs(col("lanes").cast("long") * 31250
            - round(col("jaccard") * 1e6).cast("long")))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("lanes").cast("double") / 32), 4)
            .as("mean_est"),
          round(avg("jaccard"), 4).as("mean_true"),
          round(sum("err_u").cast("double") / count(lit(1)) / 1e6, 6)
            .as("mae"),
          round(max("err_u") / 1e6, 6).as("max_err"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical windowed md5 fingerprints
    "q_substring_dup" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 9),
        |      i -> md5(array_to_string(
        |        string_split(text, ' ')[i:i+9], ' ')))) AS fp
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10)
        |SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM w GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_occurrences DESC, fp LIMIT 20""".stripMargin,

    // identical window fingerprints + parity split
    "q_substring_leakage" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 9),
        |      i -> md5(array_to_string(
        |        string_split(text, ' ')[i:i+9], ' ')))) AS fp
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10),
        |train AS (SELECT DISTINCT fp FROM w WHERE doc_id % 2 = 0),
        |leaked AS (
        |  SELECT DISTINCT w.doc_id
        |  FROM w JOIN train ON w.fp = train.fp
        |  WHERE w.doc_id % 2 = 1),
        |ag AS (
        |  SELECT
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        |     WHERE doc_id % 2 = 1) AS n_test,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM leaked) AS n_leaked)
        |SELECT n_test, n_leaked,
        |  ROUND(CAST(n_leaked AS DOUBLE) / n_test, 6) AS leak_rate
        |FROM ag WHERE n_test > 0""".stripMargin,

    // per-doc leg = the q_bigram_lm oracle verbatim; exact-long
    // rollup + snapped EG step from there
    "q_doremi_step" ->
      s"""WITH bl AS (${Training.oracle("q_bigram_lm")}),
        |pd AS (
        |  SELECT bl.doc_id,
        |    CAST(ROUND(bl.avg_logprob * 1e6) AS BIGINT) AS lp_u,
        |    d.source
        |  FROM bl JOIN documents d ON bl.doc_id = d.doc_id),
        |src AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    SUM(lp_u) AS slp
        |  FROM pd GROUP BY 1),
        |g AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS gn, SUM(slp) AS gslp
        |  FROM src),
        |scored AS (
        |  SELECT src.source, src.n_docs,
        |    CAST(src.slp AS DOUBLE) / src.n_docs AS mean_lp,
        |    (CAST(g.gslp AS DOUBLE) / g.gn
        |      - CAST(src.slp AS DOUBLE) / src.n_docs) / 1e6 AS excess
        |  FROM src, g),
        |wu AS (
        |  SELECT source, n_docs, mean_lp, excess,
        |    CAST(ROUND(exp(excess) * 1e9) AS BIGINT) AS w_u
        |  FROM scored),
        |tot AS (SELECT SUM(w_u) AS sw FROM wu)
        |SELECT wu.source, wu.n_docs,
        |  ROUND(wu.mean_lp / 1e6, 4) AS avg_logprob,
        |  ROUND(wu.excess, 6) AS excess_loss,
        |  ROUND(CAST(wu.w_u AS DOUBLE) / tot.sw, 6) AS next_weight
        |FROM wu, tot ORDER BY wu.source""".stripMargin
  )
}
