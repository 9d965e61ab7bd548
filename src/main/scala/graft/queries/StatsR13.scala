package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-13 wave (SURVEY.md §2 B.1 / B.10): the three lakehouse
  * maintenance paths the r12 VERDICT ordered — CDC merge as a batch
  * contract key (task 9), the ANN index deletion/tombstone path
  * (task 4), and compaction EXECUTION (task 6, closing the
  * plan-only gap of q_compaction_plan).
  */
object StatsR13 {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // CDC MERGE (r12 VERDICT task 9): apply an I/U/D ops stream to a
    // base table in ONE declarative plan — the Delta MERGE / Iceberg
    // upsert shape, batch-side (s_foreach_upsert covers streaming).
    // Ops are derived deterministically from orders: per o_orderkey,
    // %5==0 → DELETE the customer key, %5∈{1,2,4} → UPDATE its value
    // to o_totalprice, %5==3 → INSERT a brand-new key (1e6 +
    // o_orderkey, collision-free by construction). Apply semantics =
    // last-writer-wins per key on the ordering column (o_orderkey,
    // unique → no tie rule needed): rank ops per key (PARTITIONED
    // window — per-key grain, linear), keep rn=1, FULL OUTER join the
    // base on the key, drop keys whose latest op is D, coalesce the
    // value. Every step shuffles on the merge key once — the plan a
    // 100 TB upsert runs (both sides hash-partitioned on k; AQE
    // handles skewed keys). Output: per-(k % 8) bucket envelope in
    // exact integer cents.
    "q_cdc_merge" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
      val m = col("o_orderkey") % 5
      val ops = Tables.orders(s, d).select(
        when(m === 3, col("o_orderkey") + 1000000L)
          .otherwise(col("o_custkey")).as("k"),
        when(m === 0, "D").when(m === 3, "I").otherwise("U").as("op"),
        col("o_totalprice").as("nv"),
        col("o_orderkey").as("ord"))
      // bounded grain: per-key window (k cardinality ≈ customers)
      val wK = Window.partitionBy("k").orderBy(col("ord").desc)
      val latest = ops.withColumn("rn", row_number().over(wK))
        .filter(col("rn") === 1)
        .select("k", "op", "nv")
      base.join(latest, Seq("k"), "full_outer")
        .filter(coalesce(col("op"), lit("KEEP")) =!= "D")
        .select(col("k"), coalesce(col("nv"), col("v")).as("v"))
        .groupBy((col("k") % 8).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("v") * 100, 0).cast("long")).as("sum_cents"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("bucket")
    }),

    // ANN TOMBSTONE DELETE (r12 VERDICT task 4): the RTBF path — a
    // deterministic ~5% of vectors (md5 bucket) are deleted from the
    // corpus, and the MEMOIZED cell graph (the write-once index
    // artifact) is repaired AT READ TIME by anti-joining the
    // tombstone set on BOTH endpoints: no rebuild, no rescan of the
    // surviving corpus. The tombstone set is tiny → both anti-joins
    // broadcast; at 100 TB this is exactly the lazy-delete posture a
    // vector store runs (tombstones folded into every probe, edges
    // repaired on the next periodic NN-descent pass). Output: the
    // surviving per-node edge envelope, fully hash-checked against
    // the batch-twin graph + identical tombstone filter. Search
    // semantics on the repaired graph (no deleted id reachable) are
    // pinned in R13OpsSpec.
    "q_ann_tombstone" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val g = StatsR11.corpusCellGraph(s, d) // session-memoized
      val dead = Tables.embeddings(s, d)
        .select(col("vec_id"))
        .filter((conv(substring(md5(col("vec_id").cast("string")), 1, 4),
          16, 10).cast("int") % 100) < 5)
      g.join(broadcast(dead.select(col("vec_id").as("a_id"))),
          Seq("a_id"), "left_anti")
        .join(broadcast(dead.select(col("vec_id").as("b_id"))),
          Seq("b_id"), "left_anti")
        .groupBy("a_id")
        .agg(count(lit(1)).as("n_nb"), min("b_id").as("min_nb"),
          max("b_id").as("max_nb"), sum("b_id").as("sum_nb"))
        .select(col("a_id").as("vec_id"), col("n_nb"), col("min_nb"),
          col("max_nb"), col("sum_nb"))
        .orderBy("vec_id")
    }),

    // TIME-TRAVEL SNAPSHOT DIFF: the audit query a retained commit
    // log exists to answer — what changed between generation N−1 and
    // N? Two deterministic snapshots of lineitem land as retained
    // sink generations (the r13 CAS-committed StagedCommitSink,
    // retain=2): the evolution DELETES line 7, UPDATES quantity (+5
    // where orderkey%3=0), INSERTS a line-8 row for orderkey%5=0.
    // Both generations are read back via readAt and diffed with ONE
    // full outer join on the (orderkey, linenumber) PK — insert /
    // delete / update / same classes with exact quantity-delta mass.
    // The oracle derives both snapshots directly from the ORIGINAL
    // table, so equality proves the retained generations byte-intact
    // AND the diff classification right — q_snapshot_diff's shape
    // over REAL table-format snapshots instead of derived views. At
    // 100 TB both sides are key-partitioned; file stats would prune
    // unchanged regions before the join.
    "q_tt_snapshot_diff" -> ((s, d) => {
      val path = graft.util.Scratch.pidDirFor("staged_ttd", d)
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      def save(df: DataFrame): Unit =
        df.write.format("graft.sinks.StagedCommitSink")
          .option("path", path).option("retain", "2")
          .mode("overwrite").save()
      save(li)
      val evolved = li.filter(col("l_linenumber") =!= 7)
        .withColumn("l_quantity",
          when(col("l_orderkey") % 3 === 0, col("l_quantity") + 5)
            .otherwise(col("l_quantity")))
        .unionByName(li.filter(col("l_linenumber") === 1
            && col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey"), lit(8).as("l_linenumber"),
            lit(1.0).as("l_quantity")))
      save(evolved)
      val prev = graft.sinks.StagedCommitSink.readAt(s, path, li.schema, 1)
        .select(col("l_orderkey").as("k1"), col("l_linenumber").as("l1"),
          col("l_quantity").as("q1"))
      val cur = graft.sinks.StagedCommitSink.readAt(s, path, li.schema, 0)
        .select(col("l_orderkey").as("k2"), col("l_linenumber").as("l2"),
          col("l_quantity").as("q2"))
      prev.join(cur, col("k1") === col("k2") && col("l1") === col("l2"),
          "full_outer")
        .select(
          when(col("k1").isNull, "insert")
            .when(col("k2").isNull, "delete")
            .when(col("q1") =!= col("q2"), "update")
            .otherwise("same").as("change"),
          coalesce(col("q2"), lit(0.0)).as("qc"),
          coalesce(col("q1"), lit(0.0)).as("qp"))
        .groupBy("change")
        .agg(count(lit(1)).as("n"),
          sum(round((col("qc") - col("qp")) * 1e6, 0).cast("long"))
            .as("delta_qty_micro"))
        .orderBy("change")
    }),

    // COMPACTION EXECUTE (r12 VERDICT task 6): run q_compaction_plan's
    // bin assignment through an ACTUAL rewrite — every document rides
    // to its (source, bin) via the plan join, the table is rewritten
    // one file per bin (repartition on the bin key ⇒ each bin's rows
    // land in exactly one task ⇒ one file per partition dir; pinned
    // by a file-count assertion in R13OpsSpec), and the read-back
    // aggregate must equal the oracle computed over the ORIGINAL
    // table — the byte-equality proof that the rewrite lost nothing.
    // The plan side is metadata-grain ((source, lang) cells →
    // broadcast); the data pass is one shuffle on the target layout —
    // exactly what OPTIMIZE costs at 100 TB. sum_docid is the
    // checksum column: any dropped/duplicated row moves it.
    "q_compaction_rewrite" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(col("bytes").desc, col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // bounded grain: (source, lang) cells — metadata, not data
      val plan = Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(sum("n_chars").as("bytes"))
        .withColumn("cum", sum("bytes").over(w))
        .withColumn("bin", expr("CAST((cum - 1) DIV 65536 AS INT)"))
        .select("source", "lang", "bin")
      val out = graft.util.Scratch.pidDirFor("compaction_rw", d)
      Tables.documents(s, d)
        .select("doc_id", "source", "lang", "n_chars")
        .join(broadcast(plan), Seq("source", "lang"))
        .repartition(col("source"), col("bin"))
        .write.mode("overwrite").partitionBy("source", "bin").parquet(out)
      s.read.parquet(out)
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_docid"))
        .select(col("source"), col("bin").cast("long").as("bin"),
          col("n_docs"), col("sum_chars"), col("sum_docid"))
        .orderBy("source", "bin")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical op derivation + last-writer-wins + full-outer merge
    "q_cdc_merge" ->
      """WITH ops AS (
        |  SELECT CASE WHEN o_orderkey % 5 = 3
        |      THEN o_orderkey + 1000000 ELSE o_custkey END AS k,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'D'
        |      WHEN o_orderkey % 5 = 3 THEN 'I' ELSE 'U' END AS op,
        |    o_totalprice AS nv, o_orderkey AS ord
        |  FROM orders),
        |latest AS (
        |  SELECT k, op, nv FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k
        |      ORDER BY ord DESC) AS rn
        |    FROM ops) t
        |  WHERE rn = 1),
        |merged AS (
        |  SELECT COALESCE(b.c_custkey, l.k) AS k,
        |    COALESCE(l.nv, b.c_acctbal) AS v
        |  FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.k
        |  WHERE COALESCE(l.op, 'KEEP') <> 'D')
        |SELECT k % 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(ROUND(v * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,

    // both snapshots derived from the ORIGINAL table: equality proves
    // the retained sink generations byte-intact + the diff classes
    "q_tt_snapshot_diff" ->
      """WITH base AS (
        |  SELECT l_orderkey AS k, l_linenumber AS l, l_quantity AS q
        |  FROM lineitem),
        |evolved AS (
        |  SELECT k, l,
        |    CASE WHEN k % 3 = 0 THEN q + 5 ELSE q END AS q
        |  FROM base WHERE l <> 7
        |  UNION ALL
        |  SELECT k, 8 AS l, 1.0 AS q FROM base
        |  WHERE l = 1 AND k % 5 = 0),
        |diff AS (
        |  SELECT CASE WHEN b.k IS NULL THEN 'insert'
        |      WHEN e.k IS NULL THEN 'delete'
        |      WHEN b.q <> e.q THEN 'update'
        |      ELSE 'same' END AS change,
        |    COALESCE(e.q, 0) AS qc, COALESCE(b.q, 0) AS qp
        |  FROM base b FULL OUTER JOIN evolved e
        |    ON b.k = e.k AND b.l = e.l)
        |SELECT change, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND((qc - qp) * 1e6, 0) AS BIGINT)) AS BIGINT)
        |    AS delta_qty_micro
        |FROM diff GROUP BY 1 ORDER BY 1""".stripMargin,

    // batch-twin full-corpus cell graph (the s_stream_graph_insert
    // CTEs) + the identical md5 tombstone filter on both endpoints
    "q_ann_tombstone" -> {
      val cosAB = LlmOps.duckCos("a.embedding", "b.embedding")
      val cosEC = LlmOps.duckCos("e.embedding", "c0.c")
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND ${graft.operators.Cells.kSql("embeddings")}),
         |s1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, cid) AS rn
         |  FROM (SELECT e.vec_id, c0.cid, e.embedding,
         |      ROUND($cosEC, 6) AS cos
         |    FROM embeddings e CROSS JOIN c0)),
         |asg AS MATERIALIZED (SELECT vec_id, cid, embedding FROM s1
         |  WHERE rn = 1),
         |prs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ROUND($cosAB, 6) AS cos
         |  FROM asg a JOIN asg b
         |    ON a.cid = b.cid AND a.vec_id <> b.vec_id),
         |nb AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
         |      ORDER BY cos DESC, b_id) AS rnk
         |    FROM prs) t
         |  WHERE rnk <= 8),
         |dead AS (SELECT vec_id FROM embeddings
         |  WHERE CAST(CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
         |    1, 4) AS INT) % 100 AS INT) < 5),
         |live AS (
         |  SELECT a_id, b_id FROM nb
         |  WHERE a_id NOT IN (SELECT vec_id FROM dead)
         |    AND b_id NOT IN (SELECT vec_id FROM dead))
         |SELECT a_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_nb,
         |  MIN(b_id) AS min_nb, MAX(b_id) AS max_nb,
         |  CAST(SUM(b_id) AS BIGINT) AS sum_nb
         |FROM live GROUP BY 1 ORDER BY vec_id""".stripMargin
    },

    // the rewrite must be LOSSLESS: the oracle computes the identical
    // bin assignment over the ORIGINAL table — any row the rewrite
    // dropped, duplicated, or mis-binned breaks the hash
    "q_compaction_rewrite" ->
      """WITH cells AS (
        |  SELECT source, lang, SUM(n_chars) AS bytes
        |  FROM documents GROUP BY 1, 2),
        |binned AS (
        |  SELECT source, lang,
        |    CAST((SUM(bytes) OVER (PARTITION BY source
        |      ORDER BY bytes DESC, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |      // 65536 AS INT) AS bin
        |  FROM cells)
        |SELECT d.source, CAST(b.bin AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(d.doc_id) AS BIGINT) AS sum_docid
        |FROM documents d JOIN binned b
        |  ON d.source = b.source AND d.lang = b.lang
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
