package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** One-off profiling harness for the τ=0.3 bigram derivation legs. */
object ProfileDupGini {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.Registry.ensure(spark)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sets = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        expr("bigram_hashes(split(text, ' '))").as("hs"))
    val st = time("corpusStats")(graft.operators.SetSimJoin.corpusStats(sets))
    println(s"[profile] stats: nDocs=${st.nDocs} sumN=${st.sumN} pairSpace=${st.pairSpace} vocab=${st.vocab} density=${st.density} bytes=${st.broadcastBytes} icost=${st.intersectCost}")
    val df2 = time("dfSquareSum")(graft.operators.SetSimJoin.dfSquareSum(sets))
    println(s"[profile] sumDf2=$df2 strategy=${graft.operators.SetSimJoin.chooseStrategy(st, 0.3, 32, df2)}")
    val raw = time("SetSimJoin.auto + checkpoint")(
      graft.operators.SetSimJoin.auto(spark, sets, 0.3).localCheckpoint(true))
    println(s"[profile] raw pairs=${raw.count()}")
    val capped = time("capLowTau + checkpoint")(
      graft.operators.EdgeGraph.capLowTau(raw, 0.3).localCheckpoint(true))
    println(s"[profile] capped pairs=${capped.count()}")
    val comp = time("components")(
      graft.operators.ConnectedComponents.components(spark,
        Tables.documents(spark, d).select("doc_id"),
        capped.select("a_id", "b_id")).localCheckpoint(true))
    println(s"[profile] labels=${comp.count()}")
    spark.stop()
  }
}
