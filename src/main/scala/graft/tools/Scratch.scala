package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway plan audit (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("s_") && name != "q_dedup_components") {
        try {
          val p = fn(spark, sf).queryExecution.executedPlan.toString()
          val smells = Seq(
            "CartesianProduct" -> p.contains("CartesianProduct"),
            "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
            "SinglePartition" -> p.contains("SinglePartition"),
            "SMJ" -> p.contains("SortMergeJoin")
          ).collect { case (s, true) => s }
          if (smells.nonEmpty) println(s"[audit] $name: ${smells.mkString(",")}")
        } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(80)}") }
      }
    }
    spark.stop()
  }
}
