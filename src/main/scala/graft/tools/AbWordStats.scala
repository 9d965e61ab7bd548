package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness: times the q_borda_count per-doc word-stats
  * derivation in its old (explode + two shuffles) and new (map-side
  * aggregate() lambda) shapes, alternating reps in one session, so the
  * r13 plan choice is grounded in a measurement instead of a full-run
  * bench diff (which swings ±15% on this box). */
object AbWordStats {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.tables.Tables

    def oldShape(): DataFrame = {
      val wc = Tables.documents(spark, d)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars"), explode(col("l")).as("w"))
        .groupBy("doc_id", "w")
        .agg(count(lit(1)).as("cw"), max("n_chars").as("nc"))
      wc.groupBy("doc_id")
        .agg(max("nc").as("nc"), sum("cw").as("n_tok"),
          count(lit(1)).as("n_dis"), max("cw").as("mx_tok"))
    }
    def newShape(): DataFrame =
      Tables.documents(spark, d)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars").as("nc"),
          size(col("l")).cast("long").as("n_tok"),
          size(array_distinct(col("l"))).cast("long").as("n_dis"),
          expr("""aggregate(sort_array(l),
              struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS mx),
              (acc, x) -> struct(x,
                IF(x = acc.prev, acc.run + 1L, 1L),
                greatest(acc.mx, IF(x = acc.prev, acc.run + 1L, 1L))),
              acc -> acc.mx)""").as("mx_tok"))

    def time(tag: String)(f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both codegen paths once
    time("warm-old")(oldShape); time("warm-new")(newShape)
    for (i <- 1 to 3) { time(s"old-$i")(oldShape); time(s"new-$i")(newShape) }
    spark.stop()
  }
}
