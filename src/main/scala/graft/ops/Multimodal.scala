package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs alongside.
  * Beyond-reference extension (the reference has exactly 7 scalar types,
  * no binary — SURVEY §1.2).
  *
  * The Spark-side architecture is the real deliverable here:
  *   - payloads stay binary end-to-end (never stringified);
  *   - decode/feature-extract runs batch-wise per partition via the
  *     typed Dataset API (`mapPartitions` — the Scala analogue of
  *     `mapInPandas`: one iterator per partition, so per-batch library
  *     setup cost amortizes and memory stays bounded by partition size);
  *   - metadata is a proper struct column so Catalyst can prune it.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): [[MediaDecoder.decode]] derives deterministic fake
  * dimensions from the payload bytes. The plumbing — schemas, encoders,
  * partition batching, column pruning — is real and tested.
  */
object Multimodal {

  /** One media row: id + opaque payload. */
  case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Decoded metadata (what a real codec would return). */
  case class DecodedMeta(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Long)

  /** STUB decoder — stands in for an image/audio codec.
    * Deterministic function of the payload bytes so results are
    * reproducible and oracle-checkable. A real deployment replaces the
    * body with e.g. javax.imageio / ffmpeg bindings; the signature and
    * batching contract stay the same. */
  object MediaDecoder {
    def decode(row: MediaRow): DecodedMeta = {
      val b0 = if (row.content.nonEmpty) row.content(0) & 0xff else 0
      val b1 = if (row.content.length > 1) row.content(1) & 0xff else 0
      DecodedMeta(
        doc_id = row.doc_id,
        width = b0 % 64 + 16,
        height = b1 % 64 + 16,
        format = (b0 % 3) match {
          case 0 => "png"
          case 1 => "jpeg"
          case _ => "webp"
        },
        n_bytes = row.content.length.toLong)
    }
  }

  /** Build a media table from documents: the UTF-8 text bytes stand in
    * for an image payload. Binary column + pruned metadata. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("content"))

  /** Batch decode: partition-wise iteration over binary payloads →
    * typed metadata rows. This is the `mapInPandas`-shaped step: the
    * codec is instantiated once per partition, rows stream through. */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup for a real codec would go here
      rows.map(MediaDecoder.decode)
    }
  }

  /** Deterministic frame-offset sampling for a "video" payload: every
    * `stride`-th byte offset, capped at `maxFrames` — pure column math,
    * no decode needed for planning-level operations. */
  def frameOffsets(content: org.apache.spark.sql.Column, stride: Int,
      maxFrames: Int): org.apache.spark.sql.Column =
    slice(sequence(lit(0), greatest(length(content) - 1, lit(0)),
      lit(stride)), 1, maxFrames)
}
