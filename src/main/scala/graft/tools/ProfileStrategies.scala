package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** One-off: time all three SetSimJoin strategies on the sf1 bigram
  * τ=0.3 workload. */
object ProfileStrategies {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val parts = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.Registry.ensure(spark)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def sets = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        expr("bigram_hashes(split(text, ' '))").as("hs"))
    val which = if (args.length > 1) args(1) else "all"
    if (which == "all" || which == "intersect") {
      val r = time("pairsByIntersect")(
        graft.operators.SetSimJoin.pairsByIntersect(spark, sets, 0.3)
          .localCheckpoint(true))
      println(s"[profile] intersect pairs=${r.count()}")
    }
    if (which == "all" || which == "prefix") {
      val r = time("pairs (prefix)")(
        graft.operators.SetSimJoin.pairs(spark, sets, 0.3)
          .localCheckpoint(true))
      println(s"[profile] prefix pairs=${r.count()}")
    }
    if (which == "all" || which == "count") {
      val r = time("pairsByCount")(
        graft.operators.SetSimJoin.pairsByCount(spark, sets, 0.3)
          .localCheckpoint(true))
      println(s"[profile] count pairs=${r.count()}")
    }
    spark.stop()
  }
}
