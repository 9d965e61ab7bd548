package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity invariants over the Ethereum-shaped fixture
  * (FIXTURES.md "Ethereum-shaped fixture"; SURVEY.md §1.1):
  *  - event identity (transactionHash, logIndex) dedups replays (A10)
  *  - uint256-scale money stays exact through DecimalType (A5) —
  *    wei > 2^53 must never round
  *  - div/mod wei→token split round-trips exactly at extremes
  */
class EthFixtureSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("transactionHash", StringType),
    StructField("logIndex", IntegerType),
    StructField("blockNumber", LongType),
    StructField("fromAddress", StringType),
    StructField("aeAddress", StringType),
    StructField("valueWei", DecimalType(38, 0)),
    StructField("burnCount", LongType),
    StructField("blockTs", TimestampType)))

  private def dec(s: String) = new java.math.BigDecimal(s)

  private def fixture = {
    val rows = Seq(
      // (txHash, logIndex, block, from, ae, wei, count, ts)
      ("0x" + "a" * 64, 0, 100L, "0x" + "1" * 40, "ak_x1", dec("1"), 1L),
      ("0x" + "a" * 64, 0, 100L, "0x" + "1" * 40, "ak_x1", dec("1"), 1L), // exact replay
      ("0x" + "a" * 64, 1, 100L, "0x" + "1" * 40, "ak_x1", dec("1000000000000000000"), 2L), // same tx, next log
      ("0x" + "b" * 64, 0, 99L, "0x" + "2" * 40, "ak_x2",
        dec("2").pow(122), 3L), // out-of-order block, > 2^53 wei
      ("0x" + "c" * 64, 0, 101L, "0x" + "3" * 40, "ak_x3",
        dec("299999999999999999999999999"), 4L)) // ~3e26 = 3e8 tokens
    val data = rows.map { case (h, li, bn, from, ae, wei, cnt) =>
      org.apache.spark.sql.Row(h, li, bn, from, ae, wei, cnt,
        Timestamp.valueOf("2019-09-01 00:00:00"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  test("A10: dedup on (transactionHash, logIndex) removes replays only") {
    val deduped = fixture.dropDuplicates("transactionHash", "logIndex")
    assert(fixture.count() === 5)
    assert(deduped.count() === 4)
    // same tx with distinct logIndex survives
    assert(deduped.filter(col("transactionHash") === "0x" + "a" * 64).count() === 2)
  }

  test("A5: wei beyond 2^53 is exact in DecimalType(38,0)") {
    val total = fixture.dropDuplicates("transactionHash", "logIndex")
      .agg(sum("valueWei").cast(DecimalType(38, 0))).head().getDecimal(0)
    val expected = dec("1").add(dec("1000000000000000000"))
      .add(dec("2").pow(122)).add(dec("299999999999999999999999999"))
    assert(total.compareTo(expected) === 0, s"$total != $expected")
    // the same sum through double visibly loses integer precision
    val asDouble = new java.math.BigDecimal(expected.doubleValue())
    assert(asDouble.compareTo(expected) !== 0)
  }

  test("A5: div/mod token split round-trips exactly at uint-extremes") {
    val wei18 = dec("1000000000000000000")
    val split = fixture
      .withColumn("tok_whole", expr("valueWei div CAST(1000000000000000000 AS DECIMAL(19,0))"))
      .withColumn("tok_frac", expr("valueWei % CAST(1000000000000000000 AS DECIMAL(19,0))"))
      .withColumn("roundtrip",
        expr("tok_whole * CAST(1000000000000000000 AS DECIMAL(19,0)) + tok_frac"))
    val bad = split.filter(col("roundtrip") =!= col("valueWei"))
    assert(bad.isEmpty, bad.collect().mkString("; "))
    // 10^18 wei is exactly 1 token, 1 wei is exactly (0, 1)
    val one = split.filter(col("valueWei") === lit(wei18).cast(DecimalType(38, 0))).head()
    assert(one.getAs[Long]("tok_whole") === 1L)
    assert(one.getAs[java.math.BigDecimal]("tok_frac").longValueExact() === 0L)
  }

  test("A7: keyed upsert of the fixture is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("eth_upsert").toString + "/sink"
    def upsert(): Unit = {
      val existing =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
          Some(spark.read.parquet(dir)) else None
      val merged = existing.map(_.unionByName(fixture)).getOrElse(fixture)
        .dropDuplicates("transactionHash", "logIndex")
      val staged = dir + "_staged"
      merged.write.mode("overwrite").parquet(staged)
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.rename(new org.apache.hadoop.fs.Path(staged), new org.apache.hadoop.fs.Path(dir))
    }
    upsert(); upsert(); upsert()
    assert(spark.read.parquet(dir).count() === 4)
  }
}
