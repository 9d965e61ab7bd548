package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: LSH band-bucket size distribution per scale tier. */
object ProfileBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.Registry.ensure(spark)
    for (d <- args) {
      val sig = graft.operators.EdgeGraph.minhashSigs(spark, d, 32)
      val bands = sig.select(col("doc_id"), col("lang"),
          explode(expr(
            "transform(sequence(0, 7), b -> struct(b as band, " +
            "xxhash64(slice(sig, b * 4 + 1, 4)) as bsig))")).as("bs"))
        .select(col("lang"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
        .groupBy("lang", "band", "bsig").agg(count(lit(1)).as("n"))
      val q = bands.agg(max("n").as("mx"),
        expr("percentile(n, 0.99)").as("p99"),
        expr("percentile(n, 0.9)").as("p90"),
        sum(when(col("n") > 64, col("n") * (col("n") - 1) / 2).otherwise(0L)).as("pairs_gt64"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs_all")).head()
      println(s"[buckets] $d max=${q.get(0)} p99=${q.get(1)} p90=${q.get(2)} pairsInBigBuckets=${q.get(3)} pairsAll=${q.get(4)}")
    }
    spark.stop()
  }
}
