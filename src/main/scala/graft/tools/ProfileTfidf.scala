package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 task 3: where do q_tfidf_rerank's ~4.7 s go? Stage-isolated
  * timings (upstream checkpointed first). */
object ProfileTfidf {
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
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    time("pairs-memo")(graft.operators.EdgeGraph.pairs(spark, d, "token", 0.8).count())
    time("tf-memo")(graft.operators.EdgeGraph.termFreq(spark, d).count())
    val pairs = graft.operators.EdgeGraph.pairs(spark, d, "token", 0.8)
      .select("a_id", "b_id")
    val tf = graft.operators.EdgeGraph.termFreq(spark, d)
      .select(col("doc_id"), col("term"), col("tf_raw"))
    println("n_pairs: " + pairs.count() + " n_tf: " + tf.count())
    val nd = tf.agg(countDistinct("doc_id").cast("double").as("nd"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val pairDocs = pairs
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct()
    time("pairDocs")(noop(pairDocs))
    def wBuild() = tf.join(pairDocs, Seq("doc_id"), "left_semi")
      .join(dfT, "term").crossJoin(broadcast(nd))
      .withColumn("w_m",
        round(col("tf_raw") * log(col("nd") / col("df")) * 1e3).cast("long"))
      .select("doc_id", "term", "w_m")
    time("w-noop")(noop(wBuild()))
    time("w-noop-2")(noop(wBuild()))
    val w = time("w-checkpoint")(wBuild().localCheckpoint(eager = true))
    println("n_w: " + w.count())
    val norms = w.groupBy("doc_id").agg(sum(col("w_m") * col("w_m")).as("n2"))
    time("norms")(noop(norms))
    def dots() = pairs
      .join(w.select(col("doc_id").as("a_id"), col("term"),
        col("w_m").as("wa")), "a_id")
      .join(w.select(col("doc_id").as("b_id"), col("term"),
        col("w_m").as("wb")), Seq("b_id", "term"))
      .groupBy("a_id", "b_id").agg(sum(col("wa") * col("wb")).as("dot"))
    time("dots-noop")(noop(dots()))
    time("dots-noop-2")(noop(dots()))
    val dd = dots().localCheckpoint(true)
    println("n_dots: " + dd.count())
    def fin() = dd
      .join(norms.select(col("doc_id").as("a_id"), col("n2").as("na")), "a_id")
      .join(norms.select(col("doc_id").as("b_id"), col("n2").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("dot") / (sqrt(col("na").cast("double"))
          * sqrt(col("nb").cast("double"))), 6).as("cos_tfidf"))
      .orderBy(col("cos_tfidf").desc, col("a_id"), col("b_id"))
      .limit(50)
    time("final")(noop(fin()))
    time("full-key")(graft.SparkEntry.queries("q_tfidf_rerank")(spark, d).count())
    time("full-key-2")(graft.SparkEntry.queries("q_tfidf_rerank")(spark, d).count())
    spark.stop()
  }
}
