package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum

/** operators/PrefixSum (r10): the two-pass range-partitioned global
  * rank + prefix sum must be BIT-IDENTICAL to the single-partition
  * window it replaces — long sums are associative, so partition-bound
  * placement cannot matter. Pinned on a multi-partition synthetic
  * frame (ties on the mass column, unique tiebreak) and on the real
  * q_lorenz_curve input shape at sf0.001.
  */
class PrefixSumSpec extends AnyFunSuite with SparkFixture {

  test("matches the single-partition window on a synthetic multi-partition frame") {
    import spark.implicits._
    // 10k rows, heavy ties on v (forces equal keys near any range
    // bound), unique id tiebreak; shuffled input order
    val df = spark.range(0, 10000)
      .select(col("id"),
        pmod(col("id") * 2654435761L, lit(97L)).as("v"))
      .repartition(16)
    val got = PrefixSum.rankAndCumSum(df,
        Seq(col("v"), col("id")), col("v"), "rn", "cum")
      .select("id", "rn", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val w = Window.orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "rn", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("descending order keys work (q_topn_percent shape)") {
    import spark.implicits._
    val df = Seq(("a", 30L), ("b", 10L), ("c", 30L), ("d", 5L))
      .toDF("k", "bytes")
    val got = PrefixSum.rankAndCumSum(df,
        Seq(col("bytes").desc, col("k")), col("bytes"), "rank", "cum")
      .select("k", "rank", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    assert(got.toSeq == Seq(("a", 1L, 30L), ("c", 2L, 60L),
      ("b", 3L, 70L), ("d", 4L, 75L)))
  }

  test("q_lorenz_curve adoption matches the windowed fold at sf0.001") {
    val u = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    val w = Window.orderBy(col("v"), col("user_id"))
    val want = u
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cumv", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("user_id", "rn", "cumv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val got = PrefixSum.rankAndCumSum(u,
        Seq(col("v"), col("user_id")), col("v"), "rn", "cumv")
      .select("user_id", "rn", "cumv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }
}
