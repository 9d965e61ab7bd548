package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

object ObserveTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("t")
    val df = spark.range(1000L).toDF("id")
      .observe(obs, sum(col("id").cast("decimal(38,0)")).as("s"))
    val ck = df.localCheckpoint(true)
    // does the observation complete without a standard action?
    try {
      val m = scala.concurrent.Future(obs.get)(scala.concurrent.ExecutionContext.global)
      val r = scala.concurrent.Await.result(m, scala.concurrent.duration.Duration(3, "s"))
      println("metrics after checkpoint: " + r)
    } catch { case e: Throwable => println("observe failed: " + e) }
    println("ck rows " + ck.count())
    spark.stop()
  }
}
