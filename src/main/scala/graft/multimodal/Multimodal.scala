package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §7.5): media as opaque `binary`
  * columns + typed metadata structs, with decode / feature-extraction as
  * partition-batched typed transforms.
  *
  * The Spark-side plumbing is real and load-bearing: schema'd binary
  * ingestion, `mapPartitions` batch iteration (one codec instance per
  * partition, not per row — the shape a JNI/FFmpeg/libjpeg binding
  * needs), typed output Datasets. The codec itself is a STUB
  * ([[FakeCodec]]): this container has no image/audio libraries, so
  * decode is a deterministic fake over the bytes — swap
  * [[FakeCodec.decode]] for a real binding without touching any plumbing.
  *
  * At 100 TB: media blobs dominate bytes; the decode pass is map-only
  * and must run AFTER pushdown-able predicate filtering on metadata
  * columns, never before (filter on the cheap columns, decode the
  * survivors). Partitioning by content hash keeps blob shuffles off the
  * wire entirely.
  */
object Multimodal {

  case class BinaryRecord(id: Long, content: Array[Byte])
  case class ImageMeta(id: Long, n_bytes: Long, format: String,
                       width: Int, height: Int, luma: Double)
  case class Frame(id: Long, frame_idx: Int, frame_hash: String)
  case class Resized(id: Long, width: Int, height: Int,
                     new_width: Int, new_height: Int,
                     resized_bytes: Long, resized_hash: String)

  /** STUB codec — deterministic fake standing in for libjpeg/FFmpeg.
    * Every output is pure arithmetic over the bytes so tests (and the
    * DuckDB oracle) can verify the full pipeline. */
  object FakeCodec {
    private val formats = Array("jpeg", "png", "webp")

    def md5Hex(bytes: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"$b%02x").mkString

    def decode(id: Long, bytes: Array[Byte]): ImageMeta = {
      val h   = java.lang.Long.parseLong(md5Hex(bytes).substring(0, 15), 16)
      val len = bytes.length.toLong
      ImageMeta(
        id, len,
        formats((len % 3).toInt),
        (64 + h % 512).toInt,
        (64 + (h / 512) % 512).toInt,
        (len % 256).toDouble / 255.0)
    }

    /** Fake frame sampler: one "frame" per 100 bytes, capped at 8. */
    def sampleFrames(id: Long, bytes: Array[Byte]): Seq[Frame] = {
      val n = math.min(8L, bytes.length / 100).toInt
      (0 until n).map { i =>
        val slice = bytes.slice(i * 100, i * 100 + 100)
        Frame(id, i, md5Hex(slice))
      }
    }

    /** Fake perceptual average-hash (aHash). A real aHash decodes,
      * downsamples to an 8×8 grayscale grid, and thresholds each cell
      * against the mean; the fake keeps that exact structure over the
      * raw bytes: 64 "cells" — cell i is the leading md5 byte of the
      * i-th of 64 contiguous byte chunks — thresholded against the
      * cell mean by EXACT integer comparison (bit i set iff
      * 64·cell_i > Σ cells; no float division to diverge between
      * engines). Locality is the load-bearing property: a small byte
      * edit rewrites few chunks, so near-identical blobs land within a
      * small Hamming distance — what the banded near-dup search
      * (mm_phash) exploits. Swap [[decode]] + this for a real codec
      * and the banding/verify machinery above is unchanged. */
    def phash(bytes: Array[Byte]): Long = phashCells(bytes, 64)(0)

    /** Wide variant for the adaptive band tier ([[graft.queries
      * .MultimodalQueries]] mm_phash_width): 128 cells over the same
      * chunk→md5-byte→threshold structure, packed into (lo = bits
      * 0–63, hi = bits 64–127). Finer cells = a STRICTER absolute
      * Hamming-3 tolerance (each cell covers len/128 bytes, so
      * localized-edit robustness is unchanged while diffuse edits
      * trip more cells) — the documented trade for 2^32-wide bands. */
    def phash128(bytes: Array[Byte]): (Long, Long) = {
      val hs = phashCells(bytes, 128)
      (hs(0), hs(1))
    }

    /** nCells ∈ {64, 128}: cell i is the leading md5 byte of the i-th
      * of nCells contiguous chunks, bit set iff nCells·cell_i > Σcells
      * (exact integer threshold — no float division to diverge between
      * engines); packed little-endian into ⌈nCells/64⌉ longs. */
    private def phashCells(bytes: Array[Byte], nCells: Int): Array[Long] = {
      val len = bytes.length.toLong // Long: i*len overflows Int past ~16.9 MB/cellCount
      val cells = Array.tabulate(nCells) { i =>
        Integer.parseInt(
          md5Hex(bytes.slice((i * len / nCells).toInt, ((i + 1) * len / nCells).toInt))
            .substring(0, 2), 16)
      }
      val tot = cells.foldLeft(0L)(_ + _)
      val out = new Array[Long](nCells / 64)
      var i = 0
      while (i < nCells) {
        if (nCells.toLong * cells(i) > tot) out(i / 64) |= 1L << (i % 64)
        i += 1
      }
      out
    }

    /** Fake half-resolution resize: the "downscaled image" is the
      * leading half of the bytes (a real codec decodes, scales, and
      * re-encodes — this keeps the byte-level contract deterministic
      * and oracle-checkable). Geometry halves with a floor of 1. */
    def resize(id: Long, bytes: Array[Byte]): Resized = {
      val m = decode(id, bytes)
      val half = bytes.take(math.max(1, bytes.length / 2))
      Resized(id, m.width, m.height,
        math.max(1, m.width / 2), math.max(1, m.height / 2),
        half.length.toLong, md5Hex(half))
    }
  }

  private implicit val metaEnc: Encoder[ImageMeta] = Encoders.product[ImageMeta]
  private implicit val frameEnc: Encoder[Frame]    = Encoders.product[Frame]
  private implicit val binEnc: Encoder[BinaryRecord] = Encoders.product[BinaryRecord]
  private implicit val resizedEnc: Encoder[Resized] = Encoders.product[Resized]

  /** df(idCol: long, binCol: binary) → typed image metadata. One codec
    * instantiation per partition (the mapPartitions batch shape). */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): Dataset[ImageMeta] =
    df.select(col(idCol).as("id"), col(binCol).as("content"))
      .as[BinaryRecord]
      .mapPartitions { batch =>
        // per-partition setup happens here (real codec: allocate context)
        batch.map(r => FakeCodec.decode(r.id, r.content))
      }

  /** df(idCol, binCol) → one row per sampled frame (flatMap shape). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String): Dataset[Frame] =
    df.select(col(idCol).as("id"), col(binCol).as("content"))
      .as[BinaryRecord]
      .mapPartitions(_.flatMap(r => FakeCodec.sampleFrames(r.id, r.content)))

  /** df(idCol, binCol) → resize record per blob (map shape; the real
    * codec re-encodes — plumbing identical). */
  def resizeImages(df: DataFrame, idCol: String, binCol: String): Dataset[Resized] =
    df.select(col(idCol).as("id"), col(binCol).as("content"))
      .as[BinaryRecord]
      .mapPartitions(_.map(r => FakeCodec.resize(r.id, r.content)))

  case class BlobFp(id: Long, format: String, content_hash: String)
  case class Phash(id: Long, phash: Long)
  case class Phash128(id: Long, lo: Long, hi: Long)

  private implicit val fpEnc: Encoder[BlobFp] = Encoders.product[BlobFp]
  private implicit val phEnc: Encoder[Phash] = Encoders.product[Phash]
  private implicit val ph128Enc: Encoder[Phash128] = Encoders.product[Phash128]

  /** df(idCol, binCol) → 64-bit perceptual hash per blob through the
    * per-partition codec seam (map-only — the expensive decode happens
    * once per blob; all downstream near-dup work is over the 8-byte
    * hash, never the media bytes). */
  def perceptualHashes(df: DataFrame, idCol: String, binCol: String): Dataset[Phash] =
    df.select(col(idCol).as("id"), col(binCol).as("content"))
      .as[BinaryRecord]
      .mapPartitions(_.map(r => Phash(r.id, FakeCodec.phash(r.content))))

  /** 128-cell tier for large corpora (mm_phash_width's 32-bit bands):
    * same codec seam, two longs per blob. */
  def perceptualHashes128(df: DataFrame, idCol: String, binCol: String): Dataset[Phash128] =
    df.select(col(idCol).as("id"), col(binCol).as("content"))
      .as[BinaryRecord]
      .mapPartitions(_.map { r =>
        val (lo, hi) = FakeCodec.phash128(r.content)
        Phash128(r.id, lo, hi)
      })

  /** df(idCol, binCol) → content fingerprint per blob — the
    * identical-media dedup key, hashed through the same per-partition
    * codec seam (a real pipeline reuses the decoder's I/O pass for the
    * digest rather than re-reading the blob). */
  def fingerprintBlobs(df: DataFrame, idCol: String, binCol: String): Dataset[BlobFp] =
    df.select(col(idCol).as("id"), col(binCol).as("content"))
      .as[BinaryRecord]
      .mapPartitions(_.map { r =>
        BlobFp(r.id, FakeCodec.decode(r.id, r.content).format,
          FakeCodec.md5Hex(r.content))
      })
}
