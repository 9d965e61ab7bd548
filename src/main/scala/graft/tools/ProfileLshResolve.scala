package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 task 2 (r13 VERDICT): find where q_dedup_lsh_resolve's ~7.5 s
  * actually goes (guide §7.1) before touching the code. Times each
  * pipeline stage in isolation (upstream stages checkpointed first so
  * a stage's timer sees only its own work) and prints the band-bucket
  * skew profile (§2.5: a hot band = one straggler task in the
  * self-join).
  */
object ProfileLshResolve {
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
    graft.expr.Registry.ensure(spark)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // memo builds (amortized across 3 keys in a real session)
    time("sigs-build")(graft.operators.EdgeGraph.minhashSigs(spark, d, 32).count())
    val bands = time("bands-build")(graft.operators.EdgeGraph.lshBands(spark, d))
    time("bands-count")(bands.count())
    val hsT = time("tokenHashes-build")(graft.operators.EdgeGraph.tokenHashes(spark, d))
    time("tokenHashes-count")(hsT.count())

    // band-bucket skew (§2.5)
    val buckets = bands.groupBy("lang", "bsig").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"), max("n").as("max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_pairs_upper"),
        expr("percentile_approx(n, 0.5)").as("p50"),
        expr("percentile_approx(n, 0.99)").as("p99"))
    println("bucket profile: " + buckets.collect().mkString)

    // stage: candidate generation (self-join + packed distinct)
    def cand(): DataFrame = bands
      .select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
      .join(bands.select(col("lang").as("l2"), col("bsig").as("b2"),
          col("doc_id").as("b_id")),
        col("lang") === col("l2") && col("bsig") === col("b2") &&
        col("a_id") < col("b_id"))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
      .distinct()
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))
    time("cand-warm")(noop(cand()))
    time("cand-1")(noop(cand()))
    time("cand-2")(noop(cand()))
    val candCk = time("cand-checkpoint")(cand().localCheckpoint(true))
    println("n_cand: " + candCk.count())

    // stage: verify joins (from the checkpointed candidates)
    def verify(): DataFrame = candCk
      .join(hsT.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(hsT.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .withColumn("i", expr("sorted_intersect_count(a_hs, b_hs)"))
      .filter(col("i") / (size(col("a_hs")) + size(col("b_hs")) - col("i")) >= 0.8)
      .select("a_id", "b_id")
    time("verify-warm")(noop(verify()))
    time("verify-1")(noop(verify()))
    time("verify-2")(noop(verify()))
    val verCk = time("verify-checkpoint")(verify().localCheckpoint(true))
    println("n_verified: " + verCk.count())

    // stage: connected components over the verified pairs
    val docs = graft.tables.Tables.documents(spark, d).select("doc_id")
    val lab = time("cc")(graft.operators.ConnectedComponents
      .components(spark, docs, verCk))
    time("cc-consume")(noop(lab))

    // stage: the declared key end-to-end (memos already hot)
    time("full-key")(
      graft.SparkEntry.queries("q_dedup_lsh_resolve")(spark, d).count())
    time("full-key-2")(
      graft.SparkEntry.queries("q_dedup_lsh_resolve")(spark, d).count())
    spark.stop()
  }
}
