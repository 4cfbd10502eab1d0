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
    * Deterministic function of the payload so results are reproducible
    * and oracle-checkable: dimensions derive from the first two UNICODE
    * CODEPOINTS of the UTF-8 payload (matching the oracle's `ascii()`
    * semantics for any input, not just ASCII — a raw-byte read would
    * diverge on multi-byte leading characters). A real deployment
    * replaces the body with e.g. javax.imageio / ffmpeg bindings; the
    * signature and batching contract stay the same. */
  object MediaDecoder {
    def decode(row: MediaRow): DecodedMeta = {
      val s = new String(row.content, java.nio.charset.StandardCharsets.UTF_8)
      val cp0 = if (s.nonEmpty) s.codePointAt(0) else 0
      val cp1 =
        if (s.length > Character.charCount(cp0))
          s.codePointAt(Character.charCount(cp0))
        else 0
      DecodedMeta(
        doc_id = row.doc_id,
        width = cp0 % 64 + 16,
        height = cp1 % 64 + 16,
        format = (cp0 % 3) match {
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
    * no decode needed for planning-level operations. A zero-byte
    * payload has no frames (empty array, not a phantom frame at 0). */
  def frameOffsets(content: org.apache.spark.sql.Column, stride: Int,
      maxFrames: Int): org.apache.spark.sql.Column =
    when(length(content) === 0,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType)))
      .otherwise(slice(sequence(lit(0), length(content) - 1,
        lit(stride)), 1, maxFrames))

  /** Resized metadata: the aspect-preserving fit of decoded dimensions
    * into a `maxSide` bounding box. */
  case class ResizedMeta(doc_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int)

  /** STUB resize — the metadata arithmetic of an aspect-preserving
    * thumbnail pass (a real deployment decodes + scales pixels in the
    * same partition-wise batch; the plumbing and the output schema are
    * what Spark sees either way). Deterministic and oracle-checkable:
    * out = round(dim * maxSide / longest), never upscaled. */
  def resizeAll(spark: SparkSession, media: DataFrame,
      maxSide: Int): Dataset[ResizedMeta] = {
    import spark.implicits._
    decodeAll(spark, media).mapPartitions { rows =>
      rows.map { m =>
        val longest = math.max(m.width, m.height)
        val scale =
          if (longest <= maxSide) 1.0 else maxSide.toDouble / longest
        ResizedMeta(m.doc_id, m.width, m.height,
          math.max(1, math.round(m.width * scale).toInt),
          math.max(1, math.round(m.height * scale).toInt))
      }
    }
  }

  /** STUB feature extractor — stands in for an image/audio embedding
    * model: a deterministic `dim`-float signature derived from payload
    * bytes (FNV-hash per lane, normalized to unit length so downstream
    * cosine ANN composes). Real deployments swap the body for an ONNX/
    * JNI model call; the per-partition batch shape (amortized model
    * load), the output schema (array<float>), and the unit-norm
    * contract survive unchanged. */
  case class MediaFeatures(doc_id: Long, feature: Array[Float])

  /** Perceptual 64-bit hash row. */
  case class MediaHash(doc_id: Long, phash: Long)

  /** STUB perceptual hash (average-hash shape): stands in for
    * decode → grayscale → 8×8 downsample → mean-threshold. Samples 64
    * deterministic "pixels" from the payload (the unsigned byte at
    * offset floor(i·len/64)), thresholds at their mean, packs 64 bits.
    * Identical payloads collide exactly, and a small payload edit
    * flips few sampled pixels, so near-identical images land within a
    * small Hamming distance — the property the banded blocking in
    * [[phashDupSummary]] exploits. A real deployment swaps the pixel
    * source for a codec call inside the same partition-wise batch;
    * the packing, banding, and verification are unchanged. */
  def perceptualHashAll(spark: SparkSession,
      media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => MediaHash(r.doc_id, phashBytes(r.content)))
    }
  }

  /** The stub average-hash kernel on one payload (shared by the batch
    * [[perceptualHashAll]] and the streaming ingest gate, so both
    * sides of the artifact contract hash identically). */
  def phashBytes(content: Array[Byte]): Long = {
    val len = content.length
    val px = new Array[Int](64)
    var i = 0
    while (i < 64) {
      // long arithmetic: i * len overflows Int past ~34 MB payloads
      px(i) =
        if (len == 0) 0
        else content((i.toLong * len / 64).toInt) & 0xff
      i += 1
    }
    val mean = px.sum.toDouble / 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (px(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** The persisted BLOCKING artifact for streaming multimodal ingest:
    * every corpus image's perceptual hash exploded into its 4×16-bit
    * bands — the table a stream-side probe equi-joins on (the image
    * analogue of [[DedupOps.minhashBands]]). 24 bytes × 4 rows per
    * image; any pair within Hamming 3 shares ≥1 band (pigeonhole). */
  def phashBands(spark: SparkSession, media: DataFrame): DataFrame = {
    val withH = perceptualHashAll(spark, media).toDF("doc_id", "phash")
    val bandVals = (0 until 4).map(b =>
      shiftrightunsigned(col("phash"), b * 16).bitwiseAND(lit(0xffffL)))
    withH.select(col("doc_id"), col("phash"),
      posexplode(array(bandVals: _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_val")
  }

  /** Per-image near-dup summary over perceptual hashes: 4×16-bit
    * banded blocking (any pair within Hamming 3 shares ≥1 band —
    * pigeonhole) + exact Hamming verify — the image analogue of
    * [[DedupOps.simhashSummary]], over binary payloads, with the same
    * band discipline. (8-bit bands were tried first and rejected:
    * only 256 bucket values per band makes bucket size ~N/200 and
    * candidate volume quadratic — 3.7M pairs from 5k images at
    * sf0.1; 16-bit bands cut it 55× to 67k.) Stable
    * one-row-per-image shape; hot buckets capped at `maxBucket`. */
  def phashDupSummary(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    // (id, phash) is 16 bytes/image and referenced four times (banding,
    // two verification joins, final summary join) — materialize the one
    // full-corpus decode+hash pass instead of re-running it per
    // reference, then share DedupOps' banded-Hamming tail (one band
    // discipline, not two)
    val withH = perceptualHashAll(spark, media).toDF("doc_id", "phash")
      .localCheckpoint(true)
    DedupOps.hammingNearDupSummary(withH, "doc_id", "phash",
      maxHamming, maxBucket)
  }

  def featureExtractAll(spark: SparkSession, media: DataFrame,
      dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition model load would happen here, once
      rows.map { r =>
        val v = new Array[Float](dim)
        var lane = 0
        while (lane < dim) {
          v(lane) = (graft.functions.Hash64.hashBytes(r.content, lane + 1L)
            .toDouble / Long.MaxValue.toDouble).toFloat
          lane += 1
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        val unit =
          if (norm == 0.0) v else v.map(x => (x / norm).toFloat)
        MediaFeatures(r.doc_id, unit)
      }
    }
  }
}
