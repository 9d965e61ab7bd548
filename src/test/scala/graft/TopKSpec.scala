package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Registry
import graft.tables.Tables

/** RewriteWindowTopK + TopKPerGroupExec: the row_number()<=k window
  * pattern is planned as the sort-free bounded-heap physical operator
  * with bit-identical output. */
class TopKSpec extends AnyFunSuite with SparkFixture {

  private def topk(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
  }

  test("the window top-k pattern plans as TopKPerGroupExec, not Window+Sort") {
    Registry.ensure(spark)
    val p = topk(3).queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerGroup"), p)
    // neither WindowExec nor the built-in sort-based WindowGroupLimit
    assert(!p.contains("Window ") && !p.contains("WindowGroupLimit"), p)
    // the full-volume side BELOW the exchange is sort-free (that's the
    // scale claim: the heap prunes the input without sorting it). The
    // one allowed sort is the final phase's, ABOVE the exchange, over
    // the already-pruned stream — printed plans are top-down, so
    // nothing after the Exchange line may mention a sort.
    val ex = p.indexOf("Exchange")
    assert(ex >= 0, p)
    assert(!p.substring(ex).toLowerCase.contains("sort"), p)
  }

  test("rewritten output is identical to the unrewritten window") {
    Registry.ensure(spark)
    val got = topk(3)
    // reference: same computation forced through WindowExec by keeping
    // the filter bound non-literal (the rule only accepts literals)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= lit(3) + lit(0) * col("o_custkey"))
    assert(ref.queryExecution.executedPlan.toString().contains("Window"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    assert(got.count() === ref.count())
  }

  test("rank column keeps working downstream (projection + order)") {
    Registry.ensure(spark)
    val df = topk(2).select(col("o_custkey"), col("rn")).orderBy("o_custkey", "rn")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every group's ranks are exactly 1..k' with k' <= 2
    val byCust = rows.groupBy(_.getLong(0)).values
    assert(byCust.forall(g => g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
  }

  test("randomized: rewritten top-k equals the window for arbitrary data and k") {
    Registry.ensure(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 200 + rnd.nextInt(300)
      // few keys + duplicate order values exercise group boundaries
      val data = Seq.fill(n)((rnd.nextInt(7), rnd.nextInt(20), rnd.nextInt(1000000)))
      val df = data.toDF("key", "v", "tie")
      val k = 1 + rnd.nextInt(5)
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("tie"))
      val base = df.select(col("key"), col("v"), col("tie"), row_number().over(w).as("rn"))
      val got = base.filter(col("rn") <= k)
      assert(got.queryExecution.executedPlan.toString().contains("TopKPerGroup"),
        s"trial $trial: rewrite did not fire")
      val ref = base.filter(col("rn") <= lit(k) + lit(0) * col("key"))
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"trial $trial (k=$k) mismatch")
    }
  }

  test("non-matching shapes are left alone (rank(), no filter, non-literal bound)") {
    Registry.ensure(spark)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val ranked = Tables.orders(spark, sf)
      .select(col("o_custkey"), rank().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
    assert(ranked.queryExecution.executedPlan.toString().contains("Window"))
    val unfiltered = Tables.orders(spark, sf)
      .select(col("o_custkey"), row_number().over(w.orderBy(col("o_orderkey"))).as("rn"))
    assert(unfiltered.queryExecution.executedPlan.toString().contains("Window"))
  }
}
