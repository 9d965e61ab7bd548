package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2.5: every declared batch query, run twice, must
  * produce identical ordered results (catches missing total orders —
  * the #1 hash-match risk). Streaming entries are covered by their own
  * batch-equivalence suite.
  */
class DeterminismSpec extends AnyFunSuite with SparkFixture {

  /** KLL sketch compaction flips coins (Datasketches randomized
    * compaction) — its quantile estimates vary run to run by design,
    * within the rank-error envelope R6OpsSpec pins. Every other
    * sketch key here (HLL++, CMS) is deterministic. */
  private val randomizedSketch = Set("q_kll_quantile")

  private val batchQueries =
    SparkEntry.queries.keys.filterNot(_.startsWith("s_"))
      .filterNot(randomizedSketch).toSeq.sorted

  batchQueries.foreach { name =>
    test(s"$name is run-twice deterministic") {
      val fn = SparkEntry.queries(name)
      val r1 = fn(spark, sf).collect().toSeq
      val r2 = fn(spark, sf).collect().toSeq
      assert(r1 === r2)
    }
  }
}
