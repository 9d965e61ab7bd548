package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Registry
import graft.tables.Tables

/** The custom optimizer Rule folds cosine_sim(x, x) at plan time. */
class RuleSpec extends AnyFunSuite with SparkFixture {

  test("FoldSelfCosine rewrites self-similarity to SelfCosine in the optimized plan") {
    Registry.ensure(spark)
    val df = Tables.embeddings(spark, sf)
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.toLowerCase.contains("cosinesimilarity"), optimized)
    assert(optimized.toLowerCase.contains("selfcosine"), optimized)
    // and the folded result is still correct
    assert(df.distinct().collect().map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("FoldSelfCosine preserves null and zero-vector semantics") {
    Registry.ensure(spark)
    val df = spark.sql(
      """SELECT cosine_sim(v, v) AS c FROM VALUES
        |  (CAST(NULL AS ARRAY<FLOAT>)),
        |  (CAST(array() AS ARRAY<FLOAT>)),
        |  (array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))),
        |  (array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) t(v)""".stripMargin)
    // the rewrite fired (no full cosine left in the plan)...
    assert(!df.queryExecution.optimizedPlan.toString().toLowerCase
      .contains("cosinesimilarity"))
    // ...and degenerate inputs keep the unfolded expression's semantics
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "null array must stay null, not 1.0")
    assert(rows(1).getDouble(0).isNaN, "empty vector is 0/0 = NaN")
    assert(rows(2).getDouble(0).isNaN, "zero-norm vector is 0/0 = NaN")
    assert(rows(3).getDouble(0) === 1.0)
  }

  test("FoldSelfCosine leaves distinct-argument cosine intact") {
    Registry.ensure(spark)
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val df = a.crossJoin(b).select(expr("cosine_sim(a_emb, b_emb)").as("c"))
    assert(df.queryExecution.optimizedPlan.toString().toLowerCase.contains("cosinesimilarity"))
  }
}
