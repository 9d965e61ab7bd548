package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** graft.GraftExtensions wires the full custom surface into a session
  * via spark.sql.extensions — no Registry.ensure call anywhere. The
  * session under test is built and torn down inside the test so the
  * shared fixture sessions of other suites are unaffected (suites run
  * sequentially in this build).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers functions and the rule") {
    SparkSession.getActiveSession.foreach(_.stop())
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("graft-ext-test")
      .getOrCreate()
    try {
      // functions resolve without any Registry.ensure call
      val r = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c,
          |  simhash64(array('a','b')) AS sh,
          |  size(bigram_hashes(array('a','b','c'))) AS nb,
          |  sorted_intersect_count(array(1L, 2L), array(2L, 3L)) AS ic,
          |  eth_checksum_address('0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed') AS ad
          |""".stripMargin).head()
      assert(r.getDouble(0) === 1.0)
      assert(r.getInt(2) === 2)
      assert(r.getInt(3) === 1)
      assert(r.getString(4) === "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
      // the optimizer rule is injected: self-cosine is rewritten
      // (non-literal input — a literal one constant-folds all the way
      // to a LocalRelation, which hides the SelfCosine node)
      val df = s.sql(
        "SELECT cosine_sim(v, v) AS c FROM (SELECT array(CAST(id + 1 AS FLOAT)) AS v FROM range(5))")
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.toLowerCase.contains("cosinesimilarity"), plan)
      assert(plan.toLowerCase.contains("selfcosine"), plan)
      assert(df.collect().forall(_.getDouble(0) === 1.0))
    } finally {
      // tear down so the next suite's fixture builds a clean session
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
