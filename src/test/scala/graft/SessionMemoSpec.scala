package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 optimization round moved shared derivations behind
  * util.SessionMemo (and the EdgeGraph-local memo pattern). The memo
  * must be pure amortization: the materialized frame byte-equals a
  * fresh derivation, and repeated calls serve the SAME frame instead
  * of re-deriving. These pins keep a future edit from turning the
  * memo into a semantics change. */
class SessionMemoSpec extends AnyFunSuite with SparkFixture {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("memoized frame equals a fresh derivation (dailyMean grid)") {
    val memo = queries.StatsR9.dailyMean(spark, sf)
    // the un-memoized expression, written out fresh
    val fresh = tables.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * 1e3).cast("long")).as("s_m"),
        count(lit(1)).as("cnt"))
      .withColumn("y", expr("s_m div cnt"))
    assert(memo.schema.map(f => (f.name, f.dataType)) ===
      fresh.schema.map(f => (f.name, f.dataType)))
    assert(rows(memo) === rows(fresh))
  }

  test("second call serves the same materialized frame (no re-derivation)") {
    val a = queries.StatsR9.dailyMean(spark, sf)
    val b = queries.StatsR9.dailyMean(spark, sf)
    assert(a eq b, "SessionMemo must return the cached instance")
    val p = queries.Analytics.recsTop3(spark, sf)
    val q = queries.Analytics.recsTop3(spark, sf)
    assert(p eq q)
  }

  test("memoized frame is materialized (plan is a scan, not the derivation)") {
    // the memo eagerly localCheckpoints: consumers scan an RDD, they do
    // not re-run the events scan + aggregation per call
    val memo = queries.StatsR9.dailyMean(spark, sf)
    val plan = memo.queryExecution.optimizedPlan
    assert(plan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      s"expected a checkpoint scan, got:\n$plan")
  }

  test("recsTop3 memo backs q_recs_topn and q_recs_novelty identically") {
    val topn = SparkEntry.queries("q_recs_topn")(spark, sf)
    val memo = queries.Analytics.recsTop3(spark, sf)
    assert(rows(topn) === rows(memo), // same rows, ordering aside
      "q_recs_topn must stay the ordered view of the memoized recs")
  }

  test("sortedNeighborhood memo backs the declared key unchanged") {
    val key = SparkEntry.queries("q_sorted_neighborhood")(spark, sf)
    val memo = queries.Analytics.sortedNeighborhoodPairs(spark, sf)
    assert(rows(key) === rows(memo))
  }
}
