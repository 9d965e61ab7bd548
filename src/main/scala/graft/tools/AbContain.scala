package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** A/B q_contain_join with and without the r14 scan fan-out. */
object AbContain {
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

    def key(fan: Boolean): DataFrame = {
      val base = Tables.documents(spark, d)
      val src = if (fan) graft.util.Par.fanOut(base) else base
      val docs = src
        .select(col("doc_id"), expr("bigram_hashes(split(text, ' '))").as("hs"))
        .withColumn("sz", size(col("hs")))
        .filter(col("sz") >= 1)
        .localCheckpoint(true)
      val tok = docs.select(col("doc_id"), col("sz"), explode(col("hs")).as("h"))
      val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
      val prefix = tok.join(dfreq, "h")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("df"), col("h"))))
        .filter(col("rn") <= col("sz") - expr("(9 * sz + 9) div 10") + 1)
        .select(col("doc_id").as("a_id"), col("sz").as("a_sz"), col("h"))
      val index = tok.select(col("doc_id").as("b_id"), col("sz").as("b_sz"), col("h"))
      val cand = prefix.join(index, Seq("h"))
        .filter(col("a_id") =!= col("b_id") &&
          col("b_sz") * 10 >= col("a_sz") * 9)
        .select("a_id", "b_id").distinct()
      cand
        .join(docs.select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
          col("sz").as("a_sz")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
        .withColumn("i", expr("sorted_intersect_count(a_hs, b_hs)"))
        .filter(col("i") * 10 >= col("a_sz") * 9)
        .select(col("a_id"), col("b_id"),
          round(col("i").cast("double") / col("a_sz").cast("double"), 4)
            .as("containment"))
        .orderBy("a_id", "b_id")
    }
    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.count()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("warm-fan")(key(true)); time("warm-nofan")(key(false))
    for (i <- 1 to 3) { time(s"fan-$i")(key(true)); time(s"nofan-$i")(key(false)) }
    spark.stop()
  }
}
