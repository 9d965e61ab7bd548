package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Testdata schema tripwire. The driver regenerates /root/testdata
  * between sessions and has already changed column TYPES mid-round
  * (2026-08-13: events.ts TIMESTAMP(NANOS) → unannotated µs, which
  * broke 72 tests with messages pointing everywhere but the cause).
  * This suite fails FIRST and names the drifted column, so the next
  * regeneration costs one glance instead of an hour of triage.
  *
  * The pinned types are what the engine's READERS guarantee (through
  * Tables), not the raw footer types — Tables.events may branch on
  * the footer to deliver its µs TimestampType contract.
  */
class SchemaGuardSpec extends AnyFunSuite with SparkFixture {

  private def fields(name: String,
      read: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Map[String, DataType] =
    read(spark, sf).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events reads to the engine's µs TimestampType contract") {
    val got = fields("events", Tables.events)
    assert(got === Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      "— testdata regenerated with a new events schema? Re-probe ALL tables " +
      "(pyarrow read_schema) and update Tables/FIXTURES.md before anything else")
  }

  test("fact-table temporal columns stay timestamp_ntz (plan pins depend on it)") {
    assert(fields("orders", Tables.orders)("o_orderdate") === TimestampNTZType,
      "o_orderdate type drifted — PlanAssertionsSpec ReadSchema pins will follow")
    assert(fields("lineitem", Tables.lineitem)("l_shipdate") === TimestampNTZType,
      "l_shipdate type drifted — PlanAssertionsSpec ReadSchema pins will follow")
  }

  test("key columns of the remaining tables keep their read types") {
    assert(fields("documents", Tables.documents) === Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    val emb = fields("embeddings", Tables.embeddings)
    assert(emb("vec_id") === LongType)
    assert(emb("embedding") === ArrayType(FloatType))
    assert(emb("label") === IntegerType)
    assert(fields("customer", Tables.customer)("c_custkey") === LongType)
    assert(fields("part", Tables.part)("p_partkey") === LongType)
    assert(fields("supplier", Tables.supplier)("s_suppkey") === LongType)
    assert(fields("nation", Tables.nation)("n_nationkey") === IntegerType)
    assert(fields("region", Tables.region)("r_regionkey") === IntegerType)
  }
}
