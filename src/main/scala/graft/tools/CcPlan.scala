package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object CcPlan {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.Registry.ensure(spark)
    val e = graft.operators.EdgeGraph.pairs(spark, d, "token", 0.8)
      .select("a_id", "b_id").localCheckpoint(true)
    val parts = 24
    val sym = e.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
      .repartition(parts, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    val labels = graft.tables.Tables.documents(spark, d)
      .select(col("doc_id"), col("doc_id").as("label")).localCheckpoint(true)
    val nbr = sym
      .join(labels.select(col("doc_id").as("dst"), col("label").as("dlabel"))
        .hint("SHUFFLE_HASH"), "dst")
      .groupBy(col("src").as("doc_id")).agg(min("dlabel").as("nmin"))
    val prop = labels.join(nbr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label").as("old"),
        least(col("label"), coalesce(col("nmin"), col("label"))).as("lab1"))
    prop.write.format("noop").mode("overwrite").save()
    prop.explain("formatted")
    // timed rounds
    var lab = labels; var i = 0; var changed = 1L
    while (changed > 0 && i < 30) {
      val t0 = System.nanoTime()
      val nb = sym.join(lab.select(col("doc_id").as("dst"), col("label").as("dlabel"))
          .hint("SHUFFLE_HASH"), "dst")
        .groupBy(col("src").as("doc_id")).agg(min("dlabel").as("nmin"))
      val pr = lab.join(nb, Seq("doc_id"), "left")
        .select(col("doc_id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("lab1"))
      val next = pr.select(col("doc_id"), col("lab1").as("label"),
          (col("lab1") < col("old")).cast("long").as("chg"))
        .localCheckpoint(true)
      val t1 = System.nanoTime()
      changed = next.agg(coalesce(sum("chg"), lit(0L))).head().getLong(0)
      lab = next.select("doc_id", "label")
      i += 1
      println(f"round $i: ckpt=${(t1 - t0) / 1e9}%.3f agg=${(System.nanoTime() - t1) / 1e9}%.3f changed=$changed")
    }
    spark.stop()
  }
}
