package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hypothesis tests: (1) the 2 s distinct over 6M packed longs is an
  * AQE single-partition coalesce; (2) where CC's ~3 s goes per round. */
object AbLshCand3 {
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
    bands.count()
    val raw = bands
      .select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
      .join(bands.select(col("lang").as("l2"), col("bsig").as("b2"),
          col("doc_id").as("b_id")),
        col("lang") === col("l2") && col("bsig") === col("b2") &&
        col("a_id") < col("b_id"))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
      .localCheckpoint(true)
    println("raw rows: " + raw.count() + " parts: " + raw.rdd.getNumPartitions)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    time("warm")(noop(raw.distinct()))
    for (i <- 1 to 2) time(s"distinct-aqe-$i")(noop(raw.distinct()))
    val dParts = raw.distinct()
    dParts.write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    for (i <- 1 to 2) time(s"distinct-nocoalesce-$i")(noop(raw.distinct()))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    for (i <- 1 to 2) time(s"distinct-parfirst-$i")(noop(raw.distinct()))
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.parallelismFirst")

    // CC instrumented: reuse the operator but time it round by round via logs
    val hsT = graft.operators.EdgeGraph.tokenHashes(spark, d)
    val cand = raw.select(shiftright(col("pk"), 32).as("a_id"),
      col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id")).distinct()
    val verified = cand
      .join(hsT.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(hsT.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .withColumn("i", expr("sorted_intersect_count(a_hs, b_hs)"))
      .filter(col("i") / (size(col("a_hs")) + size(col("b_hs")) - col("i")) >= 0.8)
      .select("a_id", "b_id").localCheckpoint(true)
    println("verified: " + verified.count())
    val docs = graft.tables.Tables.documents(spark, d).select("doc_id")
    // manual copy of CC with per-round timing
    import org.apache.spark.storage.StorageLevel
    time("cc-total") {
      val e = verified.localCheckpoint(true)
      val sym = e.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
        .localCheckpoint(true)
      var changed = 1L; var i = 0
      while (changed > 0 && i < 30) {
        val t0 = System.nanoTime()
        val nbr = sym
          .join(labels.select(col("doc_id").as("dst"), col("label").as("dlabel")), "dst")
          .groupBy(col("src").as("doc_id")).agg(min("dlabel").as("nmin"))
        val prop = labels.join(nbr, Seq("doc_id"), "left")
          .select(col("doc_id"), col("label").as("old"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("lab1"))
        val next = prop.select(col("doc_id"), col("lab1").as("label"),
            (col("lab1") < col("old")).cast("long").as("chg"))
          .localCheckpoint(true)
        changed = next.agg(coalesce(sum("chg"), lit(0L))).head().getLong(0)
        labels = next.select("doc_id", "label")
        i += 1
        println(f"  round $i: ${(System.nanoTime() - t0) / 1e9}%.3f s changed=$changed")
      }
      sym.unpersist()
    }
    spark.stop()
  }
}
