package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Multimodal column design (SURVEY.md §2 B.10 "multimodal columns").
  *
  * Media is carried as an opaque envelope struct; bytes stay
  * columnar-binary and the typed metadata travels next to them:
  *
  *   STRUCT<uri: string, mime: string, bytes: binary,
  *          meta: map<string,string>>
  *
  * At 100 TB the `bytes` field is kept out-of-line for large assets
  * (uri + content hash in-line, bytes resolved at the consumer) so
  * shuffle rows stay small — here testdata has no media, so envelopes
  * are synthesized from document text and the decode step is a
  * clearly-marked deterministic STUB (no image/audio libs in this
  * environment). The Spark-side plumbing — schema, batch iteration,
  * partition-parallel decode — is real and tested.
  */
object Multimodal {

  val envelopeType: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = false)))

  /** Wrap documents into media envelopes (bytes = utf-8 text). */
  def envelopes(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      struct(
        concat(lit("doc://"), col("doc_id")).as("uri"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("bytes"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
        .as("media"))

  /** STUB decode: a real deployment would decode image/audio bytes
    * here (the libs are absent in this container). The fake is
    * deterministic in the payload so tests pin exact values, and it
    * runs partition-parallel over the binary column exactly like a
    * real decoder would (mapPartitions shape, no driver collect).
    */
  def decodeStub(s: SparkSession, d: String): DataFrame = {
    val env = envelopes(s, d)
    import s.implicits._
    val decoded = env.select(col("doc_id"), col("media.bytes").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // ??? real decode goes here — deterministic fake instead:
          val n = if (bytes == null) 0 else bytes.length
          val fakeWidth = 64 + (n % 64)
          val fakeHeight = 64 + ((n / 64) % 64)
          val channels = 3
          (id, n, fakeWidth, fakeHeight, channels)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "channels")
    decoded
  }
}
