package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.tables.Tables

/** Oracle-checkable projections of the multimodal envelope (the
  * binary payload round-trips through the struct; scalar facts about
  * it are verified against DuckDB over the raw text). The decode stub
  * itself is unit-tested (no oracle — media libs absent by design). */
object MultimodalQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_envelope" -> ((s, d) =>
      Multimodal.envelopes(s, d)
        .select(col("doc_id"),
          col("media.uri").as("uri"),
          col("media.mime").as("mime"),
          octet_length(col("media.bytes")).as("n_bytes"),
          col("media.meta")("lang").as("meta_lang"))
        .orderBy("doc_id")),

    // Real file-based media ingest via the binaryFile source — the
    // path an image/audio corpus actually enters Spark through (one
    // row per file: path, length, raw bytes). r5: the fixture files
    // are written EXECUTOR-side (foreachPartition — the object-store
    // PUT shape; the old collect().foreach was a driver bottleneck
    // pattern), into a fixed per-sfDir scratch dir (idempotent: file
    // names key on stable doc_ids and contents are deterministic, so
    // re-runs overwrite byte-identical files instead of leaking temp
    // dirs). Local-mode assumption documented in util/Scratch. The
    // oracle recomputes length and md5 from the same text in DuckDB
    // (strlen = BYTES there), so equality proves the file write +
    // binary read are byte-exact.
    "q_mm_binary_ingest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select("doc_id", "text").filter(col("doc_id") < 100)
      val tmp = graft.util.Scratch.dirFor("mm_bin", d)
      docs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$tmp/doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      s.read.format("binaryFile").load(tmp)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
          col("length"),
          md5(col("content")).as("content_md5"))
        .orderBy("doc_id")
    }),

    "q_mm_decode" -> ((s, d) =>
      Multimodal.decodeStub(s, d).orderBy("doc_id")),

    "q_mm_resize" -> ((s, d) =>
      Multimodal.resizeStub(s, d, maxW = 96, maxH = 96).orderBy("doc_id")),

    "q_mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleStub(s, d, everyNth = 10, maxFrames = 8)
        .orderBy("doc_id", "frame_idx"))
  )

  val oracle: Map[String, String] = Map(
    // strlen = BYTE length in DuckDB; md5 hashes the UTF-8 bytes —
    // both must equal what the binaryFile source read back
    "q_mm_binary_ingest" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS length,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q_mm_envelope" ->
      """SELECT doc_id,
        |  'doc://' || doc_id AS uri,
        |  'text/plain' AS mime,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  lang AS meta_lang
        |FROM documents ORDER BY doc_id""".stripMargin,

    // decode is a stub, but its metadata derivation is pure arithmetic
    // on byte length — expressible in SQL, so oracle it anyway.
    "q_mm_decode" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(64 + strlen(text) % 64 AS INT) AS width,
        |  CAST(64 + (strlen(text) // 64) % 64 AS INT) AS height,
        |  3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(64 + strlen(text) % 64 AS INT) AS width,
        |    CAST(64 + (strlen(text) // 64) % 64 AS INT) AS height
        |  FROM documents),
        |s AS (SELECT doc_id, width, height,
        |        least(96.0 / width, 96.0 / height, 1.0) AS scale FROM dims)
        |SELECT doc_id, width, height,
        |  CAST(floor(width * scale) AS INT) AS out_w,
        |  CAST(floor(height * scale) AS INT) AS out_h
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(strlen(text) % 240 + 1 AS INT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames, CAST(unnest(
        |    list_slice(generate_series(0, n_frames - 1, 10), 1, 8)) AS INT) AS frame_idx
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  )
}
