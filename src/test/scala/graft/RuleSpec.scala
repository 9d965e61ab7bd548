package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Registry
import graft.tables.Tables

/** The custom optimizer Rule folds cosine_sim(x, x) at plan time. */
class RuleSpec extends AnyFunSuite with SparkFixture {

  test("FoldSelfCosine removes self-similarity from the optimized plan") {
    Registry.ensure(spark)
    val df = Tables.embeddings(spark, sf)
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.toLowerCase.contains("cosinesimilarity"), optimized)
    assert(optimized.contains("1.0"), optimized)
    // and the folded result is still correct
    assert(df.distinct().collect().map(_.getDouble(0)).toSeq === Seq(1.0))
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
