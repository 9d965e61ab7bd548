package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo key timer: warms the session memos the full bench would have
  * warmed, then times `SPARK_GRAFT_KEYS` (comma-separated) N reps each
  * with the bench's count() methodology. */
object SoloKey {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = sys.env.getOrElse("SPARK_GRAFT_KEYS", "q_dedup_lsh_resolve")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.Registry.ensure(spark)
    // same memo warms as Bench (subset relevant to most keys)
    def warm(tag: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        System.err.println(s"[solo] warm $tag failed: ${e.getMessage}") }
    warm("lsh-index") {
      graft.operators.EdgeGraph.minhashSigs(spark, d, 32).count()
      graft.operators.EdgeGraph.lshBands(spark, d).count()
      graft.operators.EdgeGraph.tokenHashes(spark, d).count()
    }
    warm("edge-pairs") {
      for ((kind, tau) <- Seq(("bigram", 0.3), ("token", 0.7),
          ("token", 0.8), ("token", 0.95)))
        graft.operators.EdgeGraph.pairs(spark, d, kind, tau).count()
    }
    warm("term-index") {
      graft.operators.EdgeGraph.termFreq(spark, d).count()
      graft.operators.EdgeGraph.bigramScores(spark, d).count()
    }
    warm("er-candidates") {
      graft.queries.Analytics.sortedNeighborhoodPairs(spark, d).count()
    }
    warm("interactions") {
      graft.queries.Analytics.custBrand(spark, d).count()
      graft.queries.Analytics.brandSims(spark, d).count()
      graft.queries.Analytics.recsTop3(spark, d).count()
      graft.queries.TpchPartSupp.partsupp(spark, d).count()
    }
    for (k <- keys) {
      val fn = graft.SparkEntry.queries(k)
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$k rep$i: $dt%.3f s")
        dt
      }
      println(f"$k median: ${ts.sorted.apply(reps / 2)}%.3f s (n=$reps)")
    }
    spark.stop()
  }
}
