package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Round-11 hardening (r10 VERDICT tasks 1–3): the three corpus-grain
  * scale rewrites must stay BIT-IDENTICAL to the single-task windowed
  * / exhaustive formulations they replace — long sums are associative
  * and the cell bound is sound, so the results cannot differ. Each
  * pin recomputes the OLD shape inline and compares collected rows.
  */
class R11ScaleRewritesSpec extends AnyFunSuite with SparkFixture {

  test("q_knn_shapley PrefixSum rewrite matches the global-window form") {
    graft.expr.Registry.ensure(spark)
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("label").as("q_lbl"))
    val ranked = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"),
        when(col("label") === col("q_lbl"), 1L).otherwise(0L).as("u"))
      .withColumn("j", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    val terms = ranked
      .withColumn("u_next", lead("u", 1).over(Window.orderBy("j")))
      .withColumn("term",
        when(col("u_next").isNull,
          col("u") * round(lit(1e9) / col("n")).cast("long"))
        .otherwise((col("u") - col("u_next"))
          * round(lit(1e9) / greatest(lit(5L), col("j"))).cast("long")))
    val want = terms
      .withColumn("phi_u", sum("term").over(Window.orderBy("j")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .select(col("vec_id"), col("j").as("knn_rank"),
        col("u").as("same_label"),
        round(col("phi_u") / 1e9, 6).as("shapley"))
      .orderBy(col("shapley").desc, col("vec_id")).limit(20)
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("q_knn_shapley")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("q_knn_shapley plan: every window is range-bucket partitioned") {
    val p = SparkEntry.queries("q_knn_shapley")(spark, sf)
      .queryExecution.executedPlan.toString()
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(p).toList
    // the only windows left in the visible plan are PrefixSum's own:
    // the fact-grain one partitioned by __pid and the ≤|parallelism|-
    // row offsets leg — a regression to a corpus-grain global window
    // would surface a spec with no __pid
    assert(specs.forall(_.contains("__pid")), specs.mkString("\n"))
  }

  test("q_pack_sequences two-level packing matches the per-lang window form") {
    val toks = (c: org.apache.spark.sql.Column) => split(c, " ")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), size(toks(col("text"))).as("n_toks"))
      .withColumn("bin",
        (coalesce(sum("n_toks").over(w), lit(0L)) / 512).cast("int"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "bin")
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("q_pack_sequences")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("q_dedup_embed cell routing matches the exhaustive within-label join") {
    graft.expr.Registry.ensure(spark)
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("label"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"))
    val b = e.select(col("label").as("label_b"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"))
    val want = a.join(b,
        col("label") === col("label_b") && col("a_id") < col("b_id"))
      .withColumn("c", expr("cosine_sim(a_emb, b_emb)"))
      .filter(col("c") >= 0.3)
      .select(col("a_id"), col("b_id"), round(col("c"), 6).as("cos"))
      .orderBy("a_id", "b_id")
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("q_dedup_embed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
