package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with batch decode/feature-extraction over partitions.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[StubDecoder]]); everything
  * Spark-side is real and tested: the binary column schema, the metadata
  * struct, partition-wise batch processing through a typed
  * `mapPartitions` (the Scala analogue of `mapInPandas` batch UDFs —
  * decoder state is initialized once per partition, amortized over the
  * batch, exactly how a real codec handle would be), and the
  * hash/size bookkeeping a 100 TB media pipeline needs for dedup and
  * shard planning.
  */
object Multimodal {

  /** One media row: payload plus typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String, n_bytes: Long)

  /** Extracted features (decode output). */
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      checksum: Long)

  /** STUB decoder — stands in for an image/audio codec (not present in
    * this container). Deterministic over payload bytes so results are
    * reproducible and testable; a real deployment swaps `decode` for a
    * codec call with the same per-partition lifecycle.
    */
  class StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      // ??? real codec goes here; deterministic fake derived from content:
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (64 + (b0 % 8) * 64, 64 + (b1 % 8) * 64, 3)
    }
  }

  /** Build the media table: text payloads as opaque binary + metadata.
    * (In production this is the parquet/iceberg table the media lands in;
    * binary stays unparsed until the decode stage.)
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("text/plain;doc="), col("source")).as("kind"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** Batch feature extraction: one decoder per partition, streamed over
    * the rows — the mapInPandas/mapPartitions batch-UDF shape. No
    * shuffle; output is a typed Dataset ready for downstream joins.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder // per-partition init (codec handle)
      rows.map { r =>
        val (w, h, c) = decoder.decode(r.payload)
        val checksum = r.payload.foldLeft(1469598103934665603L)((a, b) =>
          (a ^ (b & 0xff)) * 1099511628211L) // FNV-1a, deterministic
        MediaFeatures(r.doc_id, r.kind, r.n_bytes, w, h, c, checksum)
      }
    }
  }

  /** Resized media (thumbnail pipeline): target box fit preserving aspect
    * ratio — integer arithmetic on the decoded dims. Same per-partition
    * decoder lifecycle; resize itself is part of the STUB (a real codec
    * would transform `payload`).
    */
  case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int, n_bytes: Long)

  def resizeTo(media: Dataset[MediaRow], maxSide: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder
      rows.map { r =>
        val (w, h, _) = decoder.decode(r.payload)
        val scaleNum = maxSide
        val longSide = math.max(w, h)
        val ow = math.max(1, w * scaleNum / longSide)
        val oh = math.max(1, h * scaleNum / longSide)
        ResizedMedia(r.doc_id, w, h, ow, oh, r.n_bytes)
      }
    }
  }

  /** Frame sampling (video-style): deterministic every-k-th "frame"
    * positions derived from content length — the batch shape of a frame
    * extractor (one row in → array of frame records out, exploded
    * downstream). Frames are stubbed as (index, byte offset) pairs.
    */
  case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long)

  def sampleFrames(media: Dataset[MediaRow], everyNBytes: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = (r.n_bytes / everyNBytes).toInt
      (0 to n).map(i => Frame(r.doc_id, i, i.toLong * everyNBytes))
    }
  }

  /** Oracle-checkable slice of the plumbing: sizes + content hash through
    * the binary column (encode → octet_length / md5 must agree with
    * DuckDB's blob semantics).
    */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        md5(col("payload")).as("content_md5"))

  val mediaStatsSql: String =
    """SELECT doc_id, 'text/plain;doc=' || source AS kind,
      |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |md5(text) AS content_md5
      |FROM documents""".stripMargin
}
