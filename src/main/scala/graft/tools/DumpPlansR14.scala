package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** plans/r14 evidence dumps (r13 VERDICT task 8: same SF for before
  * and after, and for checkpointed pipelines dump the UPSTREAM
  * subtree, not just the post-checkpoint tail).
  *
  * Both shapes of every pair are produced in ONE session at the same
  * SF: the "before" shapes are inline replicas of the r13 code
  * (commit 8b00acf), the "after" shapes are the live r14 code — a
  * physical plan is a function of the DataFrame shape, so this yields
  * exactly the plan the old code had, with no cross-clone skew.
  * Partition counts are appended where the change is the partitioning
  * itself (the fan-out family), since `explain` does not print them
  * for ExistingRDD scans.
  */
object DumpPlansR14 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.Registry.ensure(spark)
    val outDir = Paths.get("plans/r14")
    Files.createDirectories(outDir)
    def dump(name: String, df: DataFrame, note: String = ""): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val hdr = if (note.isEmpty) "" else s"-- $note\n\n"
      Files.writeString(outDir.resolve(s"$name.txt"), hdr + plan)
      println(s"dumped $name")
    }

    // ---- 1. minhashSigs build (fan-out family) ----
    def sigsShape(fan: Boolean): DataFrame = {
      val base = Tables.documents(spark, d)
      val src = if (fan) graft.util.Par.fanOut(base) else base
      src.select(col("doc_id"), col("lang"),
        expr("minhash_sig(array_distinct(split(text, ' ')), 32)").as("sig"))
    }
    dump("minhash_sigs_build_before", sigsShape(false),
      s"r13 shape: single-partition scan feeds the 32-perm projection; " +
      s"scan partitions = ${sigsShape(false).rdd.getNumPartitions}")
    dump("minhash_sigs_build_after", sigsShape(true),
      s"r14 shape: conditional round-robin fan-out before the projection; " +
      s"partitions = ${sigsShape(true).rdd.getNumPartitions}")

    // ---- 2. LSH candidate subtree (upstream of the CC checkpoint) ----
    val bands = graft.operators.EdgeGraph.lshBands(spark, d)
    val cand = bands.select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
      .join(bands.select(col("lang").as("l2"), col("bsig").as("b2"),
          col("doc_id").as("b_id")),
        col("lang") === col("l2") && col("bsig") === col("b2") &&
        col("a_id") < col("b_id"))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
      .distinct()
    dump("lsh_cand_subtree_after", cand,
      s"candidate join + packed distinct over the memoized banded index; " +
      s"bands partitions = ${bands.rdd.getNumPartitions} (r13: 1 — the " +
      "whole subtree ran in one task; same plan shape, the delta is the " +
      "fan-out inside the memo build)")

    // ---- 3. ConnectedComponents round plan, before vs after ----
    import org.apache.spark.storage.StorageLevel
    val hsT = graft.operators.EdgeGraph.tokenHashes(spark, d)
    val verified = cand
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))
      .join(hsT.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(hsT.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .withColumn("i", expr("sorted_intersect_count(a_hs, b_hs)"))
      .filter(col("i") / (size(col("a_hs")) + size(col("b_hs")) - col("i")) >= 0.8)
      .select("a_id", "b_id").localCheckpoint(true)
    val labels0 = Tables.documents(spark, d)
      .select(col("doc_id"), col("doc_id").as("label")).localCheckpoint(true)
    // before: un-partitioned sym, SMJ nbr join + left-outer prop join
    val symOld = verified.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(verified.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    symOld.count()
    val nbrOld = symOld
      .join(labels0.select(col("doc_id").as("dst"), col("label").as("dlabel")), "dst")
      .groupBy(col("src").as("doc_id")).agg(min("dlabel").as("nmin"))
    val propOld = labels0.join(nbrOld, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label").as("old"),
        least(col("label"), coalesce(col("nmin"), col("label"))).as("lab1"))
    dump("cc_round_before", propOld,
      "r13 round: SMJ neighbor join (labels LogicalRDD has no stats) + " +
      "left-outer prop join + least(); two joins, edge list re-sorted " +
      "every round")
    symOld.unpersist()
    // after: self-loops, one pre-partitioned SHUFFLE_HASH join + agg
    val symNew = verified.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(verified.select(col("b_id").as("src"), col("a_id").as("dst")))
      .union(labels0.select(col("doc_id").as("src"), col("doc_id").as("dst")))
      .repartition(24, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    symNew.count()
    val nbrNew = symNew
      .join(labels0.select(col("doc_id").as("dst"), col("label").as("dlabel"))
        .hint("SHUFFLE_HASH"), "dst")
      .groupBy(col("src").as("doc_id")).agg(min("dlabel").as("label"))
    dump("cc_round_after", nbrNew,
      "r14 round: self-loop edges make min(dlabel) == least(old, min " +
      "neighbor); ONE ShuffledHashJoin (build = labels) over the " +
      "pre-partitioned cached sym, prop join gone")
    symNew.unpersist()

    // ---- 4. q_er_resolve full key, before vs after ----
    val ranked = graft.queries.Analytics.partNameRank(spark, d)
    val W = 1024
    val wBlkOld = org.apache.spark.sql.expressions.Window
      .partitionBy(expr(s"(rn - 1) div $W")).orderBy("rn")
    val pairsOld = ranked
      .withColumn("b1_id", lead("p_partkey", 1).over(wBlkOld))
      .withColumn("b1_name", lead("p_name", 1).over(wBlkOld))
      .withColumn("b2_id", lead("p_partkey", 2).over(wBlkOld))
      .withColumn("b2_name", lead("p_name", 2).over(wBlkOld))
      .select(col("p_partkey").as("a_id"), col("p_name"),
        explode(array(
          struct(col("b1_id").as("b_id"), col("b1_name").as("b_name")),
          struct(col("b2_id").as("b_id"), col("b2_name").as("b_name"))))
          .as("c"))
      .filter(col("c.b_id").isNotNull)
      .withColumn("jw", round(expr("jaro_winkler(p_name, c.b_name)"), 6))
      .filter(col("jw") >= 0.92)
      .select(col("a_id"), col("c.b_id").as("b_id"))
    dump("q_er_resolve_pairs_before", pairsOld,
      "r13 shape: this pair table then fed ~log2(W) pointer-jumping CC " +
      "rounds (iterative, each round a checkpointed join pipeline) plus " +
      "a label join back to part and a groupBy(label)")
    dump("q_er_resolve_after",
      graft.SparkEntry.queries("q_er_resolve")(spark, d),
      "r14 shape: interval components — one block-grain window pass " +
      "(leads, lags, running max over cuts) + one aggregation; no CC, " +
      "no checkpoints, no iteration")

    // ---- 5. q_tfidf_rerank, before vs after ----
    val pairsT = graft.operators.EdgeGraph.pairs(spark, d, "token", 0.8)
      .select("a_id", "b_id")
    val tf = graft.operators.EdgeGraph.termFreq(spark, d)
      .select(col("doc_id"), col("term"), col("tf_raw"))
    val nd = tf.agg(countDistinct("doc_id").cast("double").as("nd"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val pairDocs = pairsT
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct()
    val wOld = tf.join(pairDocs, Seq("doc_id"), "left_semi")
      .join(dfT, "term").crossJoin(broadcast(nd))
      .withColumn("w_m",
        round(col("tf_raw") * log(col("nd") / col("df")) * 1e3).cast("long"))
      .select("doc_id", "term", "w_m")
      .localCheckpoint(eager = true)
    val normsOld = wOld.groupBy("doc_id").agg(sum(col("w_m") * col("w_m")).as("n2"))
    val beforeTfidf = pairsT
      .join(wOld.select(col("doc_id").as("a_id"), col("term"),
        col("w_m").as("wa")), "a_id")
      .join(wOld.select(col("doc_id").as("b_id"), col("term"),
        col("w_m").as("wb")), Seq("b_id", "term"))
      .groupBy("a_id", "b_id").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(normsOld.select(col("doc_id").as("a_id"), col("n2").as("na")), "a_id")
      .join(normsOld.select(col("doc_id").as("b_id"), col("n2").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("dot") / (sqrt(col("na").cast("double"))
          * sqrt(col("nb").cast("double"))), 6).as("cos_tfidf"))
      .orderBy(col("cos_tfidf").desc, col("a_id"), col("b_id"))
      .limit(50)
    dump("q_tfidf_rerank_before", beforeTfidf,
      "r13 shape: pair-by-term explosion — join on a_id multiplies " +
      "pairs by terms, second join shuffles that on (b_id, term), then " +
      "re-aggregates to pair grain and joins norms twice")
    dump("q_tfidf_rerank_after",
      graft.SparkEntry.queries("q_tfidf_rerank")(spark, d),
      "r14 shape: packed term-sorted (term, w) arrays + norms " +
      "checkpointed once; pair-grain joins only; sorted_dot merge walk")

    // ---- 6. q_borda_count word-stats subtree, before vs after fan-out ----
    def bordaM(fan: Boolean): DataFrame = {
      val base = Tables.documents(spark, d)
      val src = if (fan) graft.util.Par.fanOut(base) else base
      src.withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars").as("nc"),
          size(col("l")).cast("long").as("n_tok"),
          size(array_distinct(col("l"))).cast("long").as("n_dis"),
          expr("""aggregate(sort_array(l),
              struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS mx),
              (acc, x) -> struct(x,
                IF(x = acc.prev, acc.run + 1L, 1L),
                greatest(acc.mx, IF(x = acc.prev, acc.run + 1L, 1L))),
              acc -> acc.mx)""").as("mx_tok"))
    }
    dump("q_borda_count_mstats_before", bordaM(false),
      s"r13 shape (kept after the solo A/B — tools/AbBorda): map-side " +
      s"aggregate(), but over the 1-partition scan; partitions = " +
      s"${bordaM(false).rdd.getNumPartitions}")
    dump("q_borda_count_mstats_after", bordaM(true),
      s"r14: same expressions over the fanned-out scan; partitions = " +
      s"${bordaM(true).rdd.getNumPartitions}")

    // ---- 7. q_embed_pca gram subtree, before vs after fan-out ----
    def gram(fan: Boolean): DataFrame = {
      val base = Tables.embeddings(spark, d)
      val src = if (fan) graft.util.Par.fanOut(base) else base
      src.select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .select(explode(expr(
          "flatten(transform(v, (xi, i) -> " +
          "transform(slice(v, i + 1, size(v) - i), (xj, j) -> " +
          "named_struct('i', i, 'j', i + j, 'p', xi * xj))))")).as("t"))
        .groupBy(col("t.i").as("i"), col("t.j").as("j"))
        .agg(sum("t.p").as("sp"))
    }
    dump("q_embed_pca_gram_before", gram(false),
      s"r13: dim-squared upper-triangle explode over the 1-partition " +
      s"scan; input partitions = ${gram(false).rdd.getNumPartitions}")
    dump("q_embed_pca_gram_after", gram(true),
      s"r14: fan-out before the explode; input partitions = " +
      s"${gram(true).rdd.getNumPartitions}")

    spark.stop()
  }
}
