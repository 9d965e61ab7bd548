package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Registry
import graft.tables.Tables

/** Round-9 wave 21 (SURVEY.md §2 B.10b): the dedup/curation AUDIT
  * family — the reports a 100 TB ingestion pipeline publishes after
  * every run: cross-source duplicate families (contamination
  * between slices), template detection by exact token prefixes,
  * incremental dedup of the new half against the old, the
  * cumulative filter funnel, OOV rates of the new half's
  * vocabulary, and token savings from dedup resolution. Every key
  * composes the memoized component/pair derivations; exact counts
  * end to end.
  */
object StatsR9u {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Cross-source duplicate families: of the multi-doc near-dup
    // components (bigram τ=0.3), how many span ≥ 2 sources — the
    // slice-contamination audit.
    "q_cross_source_dups" -> ((s, d) => {
      Registry.ensure(s)
      val lbl = graft.operators.EdgeGraph.components(s, d, "bigram", 0.3)
        .join(Tables.documents(s, d).select("doc_id", "source"),
          "doc_id")
      val fam = lbl.groupBy("label")
        .agg(count(lit(1)).as("nd"), countDistinct("source").as("ns"))
        .filter(col("nd") >= 2)
      fam.agg(count(lit(1)).as("n_multi_clusters"),
          sum(when(col("ns") >= 2, 1L).otherwise(0L))
            .as("n_cross_source"),
          sum(when(col("ns") >= 2, col("nd")).otherwise(0L))
            .as("n_docs_cross"))
        .filter(col("n_multi_clusters") > 0)
        .select(col("n_multi_clusters"), col("n_cross_source"),
          col("n_docs_cross"),
          round(col("n_cross_source").cast("double")
            / col("n_multi_clusters"), 4).as("cross_share"))
    }),

    // Template detection by exact 5-token prefixes: prefix families
    // with ≥ 3 docs are templates (stated) — the spam/boilerplate
    // fingerprint a curation run flags.
    "q_prefix_templates" -> ((s, d) => {
      val fams = Tables.documents(s, d)
        .select(array_join(slice(split(col("text"), " "), 1, 5), " ")
          .as("pfx"))
        .groupBy("pfx").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true) // 2 legs
      val tot = fams.agg(sum("n").as("n_docs"))
      fams.filter(col("n") >= 3)
        .agg(count(lit(1)).as("n_templates"),
          sum("n").as("n_docs_templated"), max("n").as("max_family"))
        .crossJoin(broadcast(tot))
        .select(col("n_docs"), col("n_templates"),
          col("n_docs_templated"), col("max_family"),
          round(col("n_docs_templated").cast("double") / col("n_docs"),
            4).as("templated_share"))
    }),

    // Incremental dedup: split the corpus at the id midpoint (old =
    // doc_id < (max+1)/2, stated); how many NEW docs near-dup
    // (τ=0.3 bigram) something OLD — the every-ingestion-batch check.
    "q_incremental_dedup" -> ((s, d) => {
      Registry.ensure(s)
      val mid = Tables.documents(s, d)
        .agg(((max("doc_id") + 1) / 2).cast("long").as("mid"))
        .first().getLong(0)
      val pairs = graft.operators.EdgeGraph.pairs(s, d, "bigram", 0.3)
        .select("a_id", "b_id")
      val dupNew = pairs
        .select(when(col("a_id") >= mid && col("b_id") < mid,
          col("a_id")).when(col("b_id") >= mid && col("a_id") < mid,
          col("b_id")).as("nid"))
        .filter(col("nid").isNotNull)
        .distinct()
      val counts = Tables.documents(s, d)
        .agg(sum(when(col("doc_id") >= mid, 1L).otherwise(0L))
          .as("n_new"))
      counts.crossJoin(dupNew.agg(count(lit(1)).as("n_dup_vs_old")))
        .filter(col("n_new") > 0)
        .select(lit(mid).as("split_id"), col("n_new"),
          col("n_dup_vs_old"),
          round(col("n_dup_vs_old").cast("double") / col("n_new"), 4)
            .as("incremental_dup_rate"))
    }),

    // Cumulative filter funnel: all docs → length ≥ 20 tokens →
    // stopword ratio ≥ 0.02 (the q_lexical_density stop set) →
    // dedup keeper (component label = own id) — counts after each
    // stage, the curation yield report.
    "q_filter_funnel" -> ((s, d) => {
      Registry.ensure(s)
      val keep = graft.operators.EdgeGraph.components(s, d, "bigram", 0.3)
        .select(col("doc_id"), (col("label") === col("doc_id"))
          .as("keep"))
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("nt", size(col("toks")).cast("long"))
        .withColumn("nstop", size(expr(
          "filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in'))"))
          .cast("long"))
        .join(keep, "doc_id")
        .withColumn("p1", col("nt") >= 20)
        .withColumn("p2", col("p1") && col("nstop") * 50 >= col("nt"))
        .withColumn("p3", col("p2") && col("keep"))
      staged.agg(count(lit(1)).as("n_all"),
          sum(when(col("p1"), 1L).otherwise(0L)).as("n_len"),
          sum(when(col("p2"), 1L).otherwise(0L)).as("n_stop"),
          sum(when(col("p3"), 1L).otherwise(0L)).as("n_final"))
        .select(col("n_all"), col("n_len"), col("n_stop"),
          col("n_final"),
          round(col("n_final").cast("double") / col("n_all"), 4)
            .as("yield_rate"))
    }),

    // OOV rate of the new half vs the old half's vocabulary: type-
    // and token-level rates — the tokenizer/domain-shift alarm.
    "q_oov_rate" -> ((s, d) => {
      val mid = Tables.documents(s, d)
        .agg(((max("doc_id") + 1) / 2).cast("long").as("mid"))
        .first().getLong(0)
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " "))
          .as("tok"))
        .localCheckpoint(eager = true) // 2 legs
      val oldV = tok.filter(col("doc_id") < mid).select("tok").distinct()
      val newTok = tok.filter(col("doc_id") >= mid)
      val newAgg = newTok.groupBy("tok").agg(count(lit(1)).as("c"))
        .join(oldV.withColumn("seen", lit(1L)), Seq("tok"), "left")
        .agg(count(lit(1)).as("n_vocab_new"),
          sum(when(col("seen").isNull, 1L).otherwise(0L))
            .as("n_oov_types"),
          sum("c").as("n_tokens_new"),
          sum(when(col("seen").isNull, col("c")).otherwise(0L))
            .as("n_oov_tokens"))
      newAgg.crossJoin(broadcast(
          oldV.agg(count(lit(1)).as("n_vocab_old"))))
        .filter(col("n_vocab_new") > 0 && col("n_tokens_new") > 0)
        .select(col("n_vocab_old"), col("n_vocab_new"),
          col("n_oov_types"),
          round(col("n_oov_types").cast("double") / col("n_vocab_new"),
            4).as("oov_type_rate"),
          round(col("n_oov_tokens").cast("double")
            / col("n_tokens_new"), 4).as("oov_token_rate"))
    }),

    // Token savings from dedup resolution: non-keeper docs' tokens
    // as a share of the corpus — what resolution actually buys.
    "q_dedup_savings" -> ((s, d) => {
      Registry.ensure(s)
      val keep = graft.operators.EdgeGraph.components(s, d, "bigram", 0.3)
        .select(col("doc_id"), (col("label") === col("doc_id"))
          .as("keep"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .join(keep, "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dupes"),
          sum("nt").as("tokens_total"),
          sum(when(!col("keep"), col("nt")).otherwise(0L))
            .as("tokens_saved"))
        .select(col("n_docs"), col("n_dupes"), col("tokens_total"),
          col("tokens_saved"),
          round(col("tokens_saved").cast("double")
            / col("tokens_total"), 4).as("save_rate"))
    })
  )

  /** bigram τ=0.3 components leg: the q_dedup_components oracle
    * verbatim (doc_id, cluster_id, keep). */
  private def compLeg: String = TextSim.oracle("q_dedup_components")

  val oracle: Map[String, String] = Map(
    // comp leg verbatim; identical family rollup
    "q_cross_source_dups" ->
      s"""WITH comp AS ($compLeg),
        |fam AS (
        |  SELECT comp.cluster_id, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(COUNT(DISTINCT d.source) AS BIGINT) AS ns
        |  FROM comp JOIN documents d ON comp.doc_id = d.doc_id
        |  GROUP BY 1 HAVING COUNT(*) >= 2),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_clusters,
        |    CAST(SUM(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cross_source,
        |    CAST(SUM(CASE WHEN ns >= 2 THEN nd ELSE 0 END) AS BIGINT)
        |      AS n_docs_cross
        |  FROM fam)
        |SELECT n_multi_clusters, n_cross_source, n_docs_cross,
        |  ROUND(CAST(n_cross_source AS DOUBLE) / n_multi_clusters, 4)
        |    AS cross_share
        |FROM ag WHERE n_multi_clusters > 0""".stripMargin,

    // identical 5-token prefixes
    "q_prefix_templates" ->
      """WITH f AS (
        |  SELECT array_to_string(string_split(text, ' ')[1:5], ' ')
        |    AS pfx, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs FROM f),
        |tm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_templates,
        |    CAST(SUM(n) AS BIGINT) AS n_docs_templated,
        |    CAST(MAX(n) AS BIGINT) AS max_family
        |  FROM f WHERE n >= 3)
        |SELECT tt.n_docs, tm.n_templates, tm.n_docs_templated,
        |  tm.max_family,
        |  ROUND(CAST(tm.n_docs_templated AS DOUBLE) / tt.n_docs, 4)
        |    AS templated_share
        |FROM tm, tt""".stripMargin,

    // pairs leg = the q_dedup_shingle oracle verbatim; identical
    // midpoint split
    "q_incremental_dedup" ->
      s"""WITH pr AS (${TextSim.oracle("q_dedup_shingle")}),
        |md AS (
        |  SELECT CAST((MAX(doc_id) + 1) / 2 AS BIGINT) AS mid
        |  FROM documents),
        |dn AS (
        |  SELECT DISTINCT CASE
        |    WHEN a_id >= md.mid AND b_id < md.mid THEN a_id
        |    WHEN b_id >= md.mid AND a_id < md.mid THEN b_id END
        |    AS nid
        |  FROM pr, md
        |  WHERE (a_id >= md.mid AND b_id < md.mid)
        |    OR (b_id >= md.mid AND a_id < md.mid)),
        |ct AS (
        |  SELECT CAST(SUM(CASE WHEN doc_id >= md.mid THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_new
        |  FROM documents, md)
        |SELECT (SELECT mid FROM md) AS split_id, ct.n_new,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dn) AS n_dup_vs_old,
        |  ROUND((SELECT CAST(COUNT(*) AS DOUBLE) FROM dn) / ct.n_new,
        |    4) AS incremental_dup_rate
        |FROM ct WHERE ct.n_new > 0""".stripMargin,

    // comp leg verbatim; identical stop set and cumulative stages
    "q_filter_funnel" ->
      s"""WITH comp AS ($compLeg),
        |st AS (
        |  SELECT d.doc_id,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt,
        |    CAST(len(list_filter(string_split(d.text, ' '),
        |      t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS nstop,
        |    comp.keep
        |  FROM documents d JOIN comp ON d.doc_id = comp.doc_id),
        |fl AS (
        |  SELECT nt >= 20 AS p1,
        |    nt >= 20 AND nstop * 50 >= nt AS p2,
        |    nt >= 20 AND nstop * 50 >= nt AND keep AS p3
        |  FROM st)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
        |  CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_len,
        |  CAST(SUM(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stop,
        |  CAST(SUM(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_final,
        |  ROUND(CAST(SUM(CASE WHEN p3 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS yield_rate
        |FROM fl""".stripMargin,

    // identical midpoint vocab split
    "q_oov_rate" ->
      """WITH md AS (
        |  SELECT CAST((MAX(doc_id) + 1) / 2 AS BIGINT) AS mid
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |ov AS (
        |  SELECT DISTINCT tok FROM tok, md WHERE doc_id < md.mid),
        |nt AS (
        |  SELECT tok.tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok, md WHERE doc_id >= md.mid GROUP BY 1),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab_new,
        |    CAST(SUM(CASE WHEN ov.tok IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_oov_types,
        |    CAST(SUM(nt.c) AS BIGINT) AS n_tokens_new,
        |    CAST(SUM(CASE WHEN ov.tok IS NULL THEN nt.c ELSE 0 END)
        |      AS BIGINT) AS n_oov_tokens
        |  FROM nt LEFT JOIN ov ON nt.tok = ov.tok)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ov)
        |    AS n_vocab_old,
        |  n_vocab_new, n_oov_types,
        |  ROUND(CAST(n_oov_types AS DOUBLE) / n_vocab_new, 4)
        |    AS oov_type_rate,
        |  ROUND(CAST(n_oov_tokens AS DOUBLE) / n_tokens_new, 4)
        |    AS oov_token_rate
        |FROM ag WHERE n_vocab_new > 0 AND n_tokens_new > 0""".stripMargin,

    // comp leg verbatim; identical token sums
    "q_dedup_savings" ->
      s"""WITH comp AS ($compLeg),
        |st AS (
        |  SELECT d.doc_id,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt,
        |    comp.keep
        |  FROM documents d JOIN comp ON d.doc_id = comp.doc_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dupes,
        |  CAST(SUM(nt) AS BIGINT) AS tokens_total,
        |  CAST(SUM(CASE WHEN NOT keep THEN nt ELSE 0 END) AS BIGINT)
        |    AS tokens_saved,
        |  ROUND(CAST(SUM(CASE WHEN NOT keep THEN nt ELSE 0 END)
        |    AS DOUBLE) / SUM(nt), 4) AS save_rate
        |FROM st""".stripMargin
  )
}
