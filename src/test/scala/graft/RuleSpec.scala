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

  private def bandJoin = {
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_acctbal"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"))
    sup.join(cust, abs(col("s_acctbal") - col("c_acctbal")) <= lit(200.0))
      .select("s_suppkey", "c_custkey")
  }

  test("RewriteBandJoin turns abs-band theta joins into bucketed equi-joins") {
    Registry.ensure(spark)
    val p = bandJoin.queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "band join must not plan as a nested-loop scan\n" + p)
    assert(p.contains("graft_band_bucket"),
      "bucket key missing — rewrite did not fire\n" + p)
  }

  test("RewriteBandJoin result is identical to the unrewritten theta join") {
    Registry.ensure(spark)
    val withRule = bandJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val saved = spark.experimental.extraOptimizations
    val without = try {
      spark.experimental.extraOptimizations =
        saved.filterNot(_ == graft.plans.RewriteBandJoin)
      val df = bandJoin
      assert(!df.queryExecution.executedPlan.toString().contains("graft_band_bucket"))
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    } finally spark.experimental.extraOptimizations = saved
    assert(withRule.toSeq === without.toSeq)
    assert(withRule.nonEmpty, "fixture must produce at least one band match")
  }

  test("RewriteBandJoin also matches the BETWEEN spelling, same results") {
    Registry.ensure(spark)
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_acctbal"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"))
    val between = sup.join(cust,
      col("s_acctbal") >= col("c_acctbal") - lit(200.0) &&
      col("s_acctbal") <= col("c_acctbal") + lit(200.0))
      .select("s_suppkey", "c_custkey")
    val p = between.queryExecution.executedPlan.toString()
    assert(p.contains("graft_band_bucket"), "BETWEEN form must rewrite\n" + p)
    val got = between.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = bandJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("RewriteBandJoin stays exact when |x/w| exceeds double precision (clamped buckets)") {
    // r6 ADVICE regression: epoch-µs-scale longs with a tiny band
    // width push floor(x/w) past 2^52, where the old unclamped
    // bucketization could drift by >2 buckets and silently drop true
    // matches. The clamp saturates those quotients at ±2^50, so all
    // such values share the sentinel bucket and the residual filter
    // decides membership exactly.
    Registry.ensure(spark)
    import spark.implicits._
    val base = 4611686018427387904L // 2^62 — quotient 4.6e18 >> 2^52
    val a = Seq(base, base + 1, base + 500, base + 10000)
      .toDF("av").withColumn("aid", monotonically_increasing_id())
    val b = Seq(base + 2, base + 499, base + 9999, base - 700)
      .toDF("bv").withColumn("bid", monotonically_increasing_id())
    val joined = a.join(b, abs(col("av") - col("bv")) <= lit(1000.0))
      .select("av", "bv")
    val p = joined.queryExecution.executedPlan.toString()
    assert(p.contains("graft_band_bucket"), "rewrite must still fire\n" + p)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = (for {
      x <- Seq(base, base + 1, base + 500, base + 10000)
      y <- Seq(base + 2, base + 499, base + 9999, base - 700)
      if math.abs(x - y) <= 1000
    } yield (x, y)).sorted
    assert(got.toSeq === want.toSeq,
      s"clamped band join dropped/invented pairs: got=${got.toSeq} want=$want")
  }

  test("RewriteBandJoin leaves equi and non-band joins alone") {
    Registry.ensure(spark)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val p = o.join(c, o("o_custkey") === c("c_custkey"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("graft_band_bucket"), p)
    // strict < band is not (yet) matched — must stay un-rewritten, correct
    val strict = Tables.supplier(spark, sf)
      .join(c, abs(col("s_acctbal") - col("c_acctbal")) < lit(0.5))
    assert(!strict.queryExecution.executedPlan.toString()
      .contains("graft_band_bucket"))
  }
}
