package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-generated parquet tables
  * (schemas: FIXTURES.md; read-only testdata, TESTDATA.md).
  *
  * Parquet is the schema source of truth — no runtime inference happens
  * here beyond parquet footer reads, and filters/projections applied by
  * callers push down to the vectorized parquet scan (verify via
  * `.explain`: `PushedFilters`/`ReadSchema`).
  */
object Tables {
  private def rd(s: SparkSession, dir: String, name: String): DataFrame = {
    // Write TimestampType as annotated µs int64, not legacy INT96 —
    // INT96 reads back as ns and defeats µs-exact oracle comparison.
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = rd(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = rd(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = rd(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = rd(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = rd(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = rd(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = rd(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the
    * legacy conf and truncate to microseconds — exactly what DuckDB 1.0
    * does on read, so engine and oracle see identical µs instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rd(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = rd(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = rd(s, d, "embeddings")
}
