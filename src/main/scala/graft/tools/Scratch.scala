package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Throwaway perf instrumentation main (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.expr.Registry.ensure(spark)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sets = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        expr("bigram_hashes(split(text, ' '))").as("hs"))
    t("sets materialize")(println("  sum=" + sets.select(sum(size(col("hs")))).collect()(0)))
    val occ = sets
      .select(col("lang"), col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
    t("occ.count")(println("  occ=" + occ.count()))
    val tau = 0.3
    val a = occ.select(col("lang"), col("h"), col("doc_id").as("a_id"), col("n").as("na"))
    val b = occ.select(col("lang").as("lang_b"), col("h").as("h_b"),
      col("doc_id").as("b_id"), col("n").as("nb"))
    val co = a.join(b,
        col("lang") === col("lang_b") && col("h") === col("h_b") &&
        col("a_id") < col("b_id") &&
        col("nb") >= ceil(lit(tau) * col("na")) &&
        col("na") >= ceil(lit(tau) * col("nb")))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
    t("co.count")(println("  co=" + co.count()))
    val g = co.groupBy("pk").agg(count(lit(1)).as("inter"))
    t("grouped")(println("  groups=" + g.count()))
    val full = graft.queries.TextSim.queries("q_dedup_shingle")(spark, d)
    t("full q")(println("  out=" + full.count()))
    t("full q again")(println("  out=" + graft.queries.TextSim.queries("q_dedup_shingle")(spark, d).count()))
    co.explain("formatted")
    spark.stop()
  }
}
