package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** SURVEY.md §7.5 at-rest layout posture, demonstrated end-to-end:
  *  - bucketed tables co-locate join keys → the bucketed join plans
  *    WITHOUT a shuffle Exchange on either side
  *  - date-partitioned tables prune partitions at scan time
  */
class StorageLayoutSpec extends AnyFunSuite with SparkFixture {

  test("bucketed join eliminates the shuffle Exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir
    // is a static conf and cannot be set on a live session. A fresh
    // derby metastore won't know tables left by a previous JVM, so the
    // physical locations must be cleared too.
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("orders_b", "customer_b").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(s"spark-warehouse/$t"), true)
    }
    Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val n = joined.count()
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("date-partitioned layout prunes partitions at scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_by_day"
    Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString()
    // partition filter present, and only matching rows are read
    assert(plan.contains("PartitionFilters"), plan)
    val expected = Tables.events(spark, sf)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(pruned.count() === expected)
    assert(expected > 0)
  }
}
