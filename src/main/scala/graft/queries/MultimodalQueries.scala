package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Oracle exposure of the multimodal plumbing: documents.text bytes act
  * as the opaque media blobs (no real media in the test corpus); the
  * deterministic FakeCodec makes the whole mapPartitions pipeline
  * hash-checkable in DuckDB. */
object MultimodalQueries {

  private def mmDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImageMeta(
      Tables.parallelize(Tables.documents(s, d))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob")),
      "doc_id", "blob")
      .toDF()

  // Mirror of FakeCodec.decode: h = first 15 md5 hex chars as bigint;
  // len-derived format/luma; integer div/mod geometry. The corpus is
  // pure ASCII (asserted in tests), so varchar md5/length equal the
  // blob-side byte operations DuckDB 1.0 lacks.
  private val mmDecodeSql =
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS n_bytes,
      |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT doc_id AS id, n_bytes,
      |  CASE n_bytes % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
      |  CAST(64 + hv % 512 AS INT) AS width,
      |  CAST(64 + (hv // 512) % 512 AS INT) AS height,
      |  CAST(n_bytes % 256 AS DOUBLE) / CAST(255 AS DOUBLE) AS luma
      |FROM h""".stripMargin

  private def mmFrames(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Tables.parallelize(Tables.documents(s, d))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob")),
      "doc_id", "blob")
      .toDF()

  private val mmFramesSql =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    LEAST(8, length(text) // 100) AS n_frames
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id, text, unnest(range(0, n_frames)) AS i FROM b)
      |SELECT doc_id AS id, CAST(i AS INT) AS frame_idx,
      |  md5(substring(text, CAST(i * 100 + 1 AS INT), 100)) AS frame_hash
      |FROM ex""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("mm_decode_meta", mmDecode, Some(mmDecodeSql)),
    QueryDef("mm_sample_frames", mmFrames, Some(mmFramesSql)))
}
