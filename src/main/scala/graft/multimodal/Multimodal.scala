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

  /** STUB resize: target-box geometry is real (aspect-preserving fit
    * into maxW x maxH, computed from the stub-decoded dims); the pixel
    * resample itself is `???` in this container. Demonstrates the
    * batch shape: metadata math stays columnar, only the byte
    * transform would enter the partition iterator. */
  def resizeStub(s: SparkSession, d: String, maxW: Int, maxH: Int): DataFrame = {
    val sc = decodeStub(s, d)
    sc.withColumn("scale",
        least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"),
          lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
      .select("doc_id", "width", "height", "out_w", "out_h")
  }

  /** STUB frame-sample: every-nth-frame selection for a video payload.
    * Frame count is derived deterministically from the payload length
    * (stub); the selection arithmetic (frame indices at a stride, cap
    * at maxFrames) is the real pipeline logic and is fully columnar —
    * one output row per sampled frame via explode, never a driver
    * loop. */
  def frameSampleStub(s: SparkSession, d: String, everyNth: Int, maxFrames: Int): DataFrame = {
    val sc = decodeStub(s, d)
    sc.withColumn("n_frames", (col("n_bytes") % 240 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(everyNth)), 1, maxFrames)))
      .select("doc_id", "n_frames", "frame_idx")
  }
}
