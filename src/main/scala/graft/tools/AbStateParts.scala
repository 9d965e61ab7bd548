package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the bounded state-partition cap for stateful streaming keys:
  * run representative keys at cap 8 (current) vs cap 2, alternating,
  * same session. The cap is captured into each fresh checkpoint at
  * first start, so per-call conf changes take effect. */
object AbStateParts {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("s_stream_zscore", "s_stream_topk", "s_dedup_watermark",
      "s_stateful_sessionize", "s_stream_cms")
    def run(k: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, d).count()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // warm the machinery once
    keys.foreach(run)
    for (k <- keys) {
      val a = (1 to 2).map { _ =>
        sys.props.remove("graft.stream.maxStateParts"); run(k) }
      val b = (1 to 2).map { _ =>
        sys.props("graft.stream.maxStateParts") = "2"; run(k) }
      sys.props.remove("graft.stream.maxStateParts")
      println(f"$k cap8=${a.min}%.2f cap2=${b.min}%.2f")
    }
    spark.stop()
  }
}
