package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B ConnectedComponents jump=false vs jump=true on the LSH verified
  * graph (r14: CC is q_dedup_lsh_resolve's dominant stage post-fanout;
  * the min-label chain took 5 rounds — changed 3416,1852,279,14,0). */
object AbCc {
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
    val hsT = graft.operators.EdgeGraph.tokenHashes(spark, d)
    val cand = bands.select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
      .join(bands.select(col("lang").as("l2"), col("bsig").as("b2"),
          col("doc_id").as("b_id")),
        col("lang") === col("l2") && col("bsig") === col("b2") &&
        col("a_id") < col("b_id"))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
      .distinct()
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))
    val verified = cand
      .join(hsT.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(hsT.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .withColumn("i", expr("sorted_intersect_count(a_hs, b_hs)"))
      .filter(col("i") / (size(col("a_hs")) + size(col("b_hs")) - col("i")) >= 0.8)
      .select("a_id", "b_id").localCheckpoint(true)
    println("verified: " + verified.count())
    val docs = graft.tables.Tables.documents(spark, d).select("doc_id")
      .localCheckpoint(true)
    def time(tag: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val r = f
      r.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    var flat: DataFrame = null; var jmp: DataFrame = null
    time("warm-flat")(graft.operators.ConnectedComponents.components(spark, docs, verified))
    time("warm-jump")(graft.operators.ConnectedComponents.components(spark, docs, verified, jump = true))
    for (i <- 1 to 3) {
      flat = time(s"flat-$i")(graft.operators.ConnectedComponents.components(spark, docs, verified))
      jmp = time(s"jump-$i")(graft.operators.ConnectedComponents.components(spark, docs, verified, jump = true))
    }
    println("labels differ: " + flat.exceptAll(jmp).count() + "/" + jmp.exceptAll(flat).count())
    spark.stop()
  }
}
