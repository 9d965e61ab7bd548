package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the candidate stage: raw join alone, distinct alone,
  * SHUFFLE_HASH hint, and a single-shuffle co-partitioned self-join. */
object AbLshCand2 {
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
    val bands = graft.operators.EdgeGraph.lshBands(spark, d)
    println("bands rows: " + bands.count())

    def rawJoin(hint: String): DataFrame = {
      val l = bands.select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
      val r0 = bands.select(col("lang").as("l2"), col("bsig").as("b2"),
        col("doc_id").as("b_id"))
      val r = if (hint.isEmpty) r0 else r0.hint(hint)
      l.join(r, col("lang") === col("l2") && col("bsig") === col("b2") &&
          col("a_id") < col("b_id"))
        .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
    }
    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("warm-raw")(rawJoin(""))
    for (i <- 1 to 2) time(s"raw-smj-$i")(rawJoin(""))
    for (i <- 1 to 2) time(s"raw-shj-$i")(rawJoin("SHUFFLE_HASH"))
    // distinct alone over materialized raw pairs
    val raw = rawJoin("").localCheckpoint(true)
    println("raw rows: " + raw.count())
    for (i <- 1 to 2) time(s"distinct-$i")(raw.distinct())
    for (i <- 1 to 2) time(s"agg-distinct-$i")(raw.groupBy("pk").agg(lit(1)))
    // co-partitioned: repartition bands once, join reuses partitioning
    val rep = bands.repartition(col("lang"), col("bsig"))
      .localCheckpoint(true)
    time("rep-join-warm") {
      rep.select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
        .join(rep.select(col("lang").as("l2"), col("bsig").as("b2"),
            col("doc_id").as("b_id")),
          col("lang") === col("l2") && col("bsig") === col("b2") &&
          col("a_id") < col("b_id"))
        .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
    }
    rawJoin("").explain("formatted")
    spark.stop()
  }
}
