package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** B.1 capability row: csv / json / orc / parquet read-write
  * round-trips with explicit schemas (no runtime inference in
  * production paths — SURVEY.md §1.2). */
class IoRoundTripSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_io_$tag").toString + "/data"

  // normalize the NTZ source column to session-TZ TimestampType once,
  // so every writer/reader pair sees the same type end-to-end
  private lazy val sample = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
    .orderBy("o_orderkey").limit(200)

  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType)))

  private def assertSame(back: org.apache.spark.sql.DataFrame): Unit = {
    val a = sample.collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a.map(_.toString) === b.map(_.toString))
  }

  test("csv round-trip (explicit schema, header)") {
    val p = tmp("csv")
    sample.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(p)
    assertSame(spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(p))
  }

  test("json round-trip (explicit schema)") {
    val p = tmp("json")
    sample.write.json(p)
    assertSame(spark.read.schema(schema).json(p))
  }

  test("orc round-trip") {
    val p = tmp("orc")
    sample.write.orc(p)
    assertSame(spark.read.orc(p))
  }

  test("parquet round-trip") {
    val p = tmp("parquet")
    sample.write.parquet(p)
    assertSame(spark.read.parquet(p))
  }
}
