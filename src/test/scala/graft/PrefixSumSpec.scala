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

  test("sortedPositions equals any-valid-tie-order row_number on a tie-heavy frame") {
    // 5000 rows over only 23 distinct values — every range boundary
    // splits a tie block; value-at-position must match the sorted
    // multiset exactly
    val df = spark.range(0, 5000)
      .select(pmod(col("id") * 48271L, lit(23L)).as("v"))
      .repartition(16)
    val got = PrefixSum.sortedPositions(df, col("v"), "v", "i")
      .collect().map(r => (r.getLong(1), r.getLong(0))).sortBy(_._1)
    val want = df.collect().map(_.getLong(0)).sorted.zipWithIndex
      .map { case (v, i) => (i + 1L, v) }
    assert(got.toSeq == want.toSeq)
    // positions are a bijection 1..n
    assert(got.map(_._1).toSeq == (1L to 5000L).toSeq)
  }

  test("competitionRank equals rank() over the global order, ties included") {
    val df = spark.range(0, 3000)
      .select(col("id"), pmod(col("id") * 69621L, lit(17L)).as("k"))
      .repartition(8)
    for (desc <- Seq(true, false)) {
      val got = PrefixSum.competitionRank(df, "k", desc, "r")
        .select("id", "r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val ord = if (desc) col("k").desc else col("k").asc
      val want = df.withColumn("r", rank().over(Window.orderBy(ord)).cast("long"))
        .select("id", "r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"desc=$desc")
    }
  }

  test("ntileExpr equals ntile() for every n in 1..40 and k=10") {
    // closed-form standard NTILE: first n%k buckets take n/k+1 rows —
    // sweep small n so every remainder shape is hit
    for (n <- 1 to 40) {
      val df = spark.range(1, n + 1).select(col("id"))
      val want = df.withColumn("t", ntile(10).over(Window.orderBy("id")))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      val got = df
        .crossJoin(broadcast(df.agg(max("id").as("nn"))))
        .select(col("id"), expr(PrefixSum.ntileExpr("id", "nn", 10)).as("t"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
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
