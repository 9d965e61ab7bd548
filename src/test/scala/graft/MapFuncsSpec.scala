package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** B.8 semi-structured column pattern: props (JSON string at rest) →
  * MapType on demand via from_json (SURVEY.md §1.2; unit-test-only
  * per the q_json_extract oracle note). */
class MapFuncsSpec extends AnyFunSuite with SparkFixture {

  test("from_json parses props into map<string,int> consistently with get_json_object") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"),
        get_json_object(col("props"), "$.k").cast("int").as("k_direct"))
    // every props value is exactly {"k": int}
    assert(ev.filter(size(col("m")) =!= 1).count() === 0)
    assert(ev.filter(!array_contains(map_keys(col("m")), "k")).count() === 0)
    assert(ev.filter(col("m")("k") =!= col("k_direct")).count() === 0)
    // map_values round-trip
    assert(ev.filter(element_at(map_values(col("m")), 1) =!= col("k_direct")).count() === 0)
  }
}
