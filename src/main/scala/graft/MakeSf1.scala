package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf1 derivation for the scale-validation pass (r8 VERDICT
  * task 3): the driver ships sf0.001/0.01/0.1 only, so this main
  * derives a 10× slice from sf0.1 — deterministic, no rand() — good
  * enough to measure whether the bench-tail plans grow ~linearly.
  *
  *   runMain graft.MakeSf1 /root/testdata/sf0.1 /root/repo/sf1data
  *
  * Replication contract (r = 0..9; r=0 is the original rows):
  *  - fact keys shift by r·10M (event/doc/vec/order/part/supp/cust
  *    ids), user_id by r·1M — same 30-day window, 10× the traffic.
  *  - documents: replicas deterministically rewrite ~40% of tokens
  *    (xxhash64(token, r) % 10 < 4 → token⊕r), so cross-replica
  *    Jaccard lands ≈0.43 — below the τ=0.8 verify bar and mostly
  *    below the LSH banding floor; within-replica near-dup structure
  *    is preserved exactly. Without this, every doc would gain 9
  *    exact copies and the pair space would explode quadratically —
  *    a different (and unrealistic) workload.
  *  - embeddings: replicas rotate the vector by r dims (norm-
  *    preserving, direction-changing), so ANN cells keep realistic
  *    occupancy instead of 10-deep exact stacks.
  *  - part names get a replica suffix (sorted-neighborhood blocks
  *    stay prefix-coherent); region/nation copy as-is (dimensions).
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-make-sf1").getOrCreate()
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    val reps = spark.range(0, 10).select(col("id").as("r"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[sf1] wrote $name")
    }

    // dimensions: copy
    write(spark.read.parquet(s"$in/region.parquet"), "region")
    write(spark.read.parquet(s"$in/nation.parquet"), "nation")

    val M = 10000000L
    write(rep(spark.read.parquet(s"$in/customer.parquet"))
      .withColumn("c_custkey", col("c_custkey") + col("r") * M)
      .drop("r"), "customer")
    write(rep(spark.read.parquet(s"$in/supplier.parquet"))
      .withColumn("s_suppkey", col("s_suppkey") + col("r") * M)
      .drop("r"), "supplier")
    write(rep(spark.read.parquet(s"$in/part.parquet"))
      .withColumn("p_partkey", col("p_partkey") + col("r") * M)
      .withColumn("p_name", when(col("r") === 0, col("p_name"))
        .otherwise(concat(col("p_name"), lit(" v"), col("r"))))
      .drop("r"), "part")
    write(rep(spark.read.parquet(s"$in/orders.parquet"))
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * M)
      .withColumn("o_custkey", col("o_custkey") + col("r") * M)
      .drop("r"), "orders")
    write(rep(spark.read.parquet(s"$in/lineitem.parquet"))
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * M)
      .withColumn("l_partkey", col("l_partkey") + col("r") * M)
      .withColumn("l_suppkey", col("l_suppkey") + col("r") * M)
      .drop("r"), "lineitem")

    write(rep(spark.read.parquet(s"$in/events.parquet"))
      .withColumn("event_id", col("event_id") + col("r") * M)
      .withColumn("user_id", col("user_id") + col("r") * 1000000L)
      .drop("r"), "events")

    write(rep(spark.read.parquet(s"$in/documents.parquet"))
      .withColumn("doc_id", col("doc_id") + col("r") * M)
      .withColumn("text", when(col("r") === 0, col("text")).otherwise(
        array_join(expr(
          "transform(split(text, ' '), t -> IF(pmod(xxhash64(t, r), 10) < 4," +
            " concat(t, r), t))"), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r"), "documents")

    write(rep(spark.read.parquet(s"$in/embeddings.parquet"))
      .withColumn("vec_id", col("vec_id") + col("r") * M)
      .withColumn("embedding", expr(
        "IF(r = 0, embedding, concat(slice(embedding, CAST(r + 1 AS INT)," +
          " size(embedding) - CAST(r AS INT))," +
          " slice(embedding, 1, CAST(r AS INT))))"))
      .drop("r"), "embeddings")

    spark.stop()
  }
}
