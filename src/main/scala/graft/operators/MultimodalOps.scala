package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed by per-partition batch transforms.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration, feature output. The codec itself is a STUB (`StubDecoder`):
  * this container has no image/audio libraries, so decode produces a
  * deterministic fake "decoded frame" from the bytes. Swapping in a real
  * decoder (JNI/javacv or a Python `mapInPandas` stage in a PySpark wrapper)
  * changes only [[StubDecoder.decode]] — the distributed plumbing is
  * identical.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata, the 100 TB layout — large
    * binaries stay columnar in parquet, metadata is prunable without
    * touching payload bytes. */
  final case class MediaRow(
      media_id: Long, modality: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Extracted features for one media row (decode → feature stage output). */
  final case class MediaFeatures(
      media_id: Long, modality: String, byte_len: Long,
      mean_byte: Double, frame_bytes: Long, ok: Boolean)

  /** STUB decode: deterministic fake standing in for an image/audio codec.
    * Marked clearly — see object doc. */
  object StubDecoder {
    /** "Decodes" payload bytes: returns (decoded-byte-count, mean byte
      * value) — a real decoder would return pixel/sample buffers. */
    def decode(payload: Array[Byte]): (Long, Double) = {
      if (payload == null || payload.isEmpty) (0L, 0.0)
      else {
        var s = 0L
        var i = 0
        while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
        (payload.length.toLong, s.toDouble / payload.length)
      }
    }
  }

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — used by
    * tests and the oracle query; a real pipeline reads binary parquet
    * directly. */
  def asMediaTable(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("media_id"),
      lit("text").as("modality"),
      encode(text, "UTF-8").as("payload"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))

  /** The decode/feature-extract stage: per-partition batch iteration (the
    * Scala analog of a Pandas-UDF `mapInPandas` stage — same batch shape,
    * same executor-local decode, no shuffle). Repartition upstream to bound
    * batch memory: payload bytes dominate, so partitions are sized by
    * `spark.sql.files.maxPartitionBytes`, not row count. */
  def extractFeatures(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (decoded, mean) = StubDecoder.decode(r.payload)
        MediaFeatures(r.media_id, r.modality,
          byte_len = if (r.payload == null) 0L else r.payload.length.toLong,
          mean_byte = mean,
          frame_bytes = math.min(decoded, 16L),
          ok = decoded > 0)
      }
    }
  }

  /** STUB resize: deterministic fake standing in for an image resize /
    * audio resample — truncates the payload to `maxBytes` and stamps the
    * new dimensions. A real implementation swaps the byte slice for a
    * codec call; the distributed shape (narrow per-partition transform,
    * no shuffle) is identical. */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.emptyByteArray else r.payload
      val resized = p.take(maxBytes)
      r.copy(payload = resized,
        width = math.min(r.width, maxBytes),
        height = math.min(r.height, maxBytes))
    })
  }

  /** STUB frame sampling: every `stride`-th byte stands in for every Nth
    * video frame / audio window. */
  def frameSampleStub(media: Dataset[MediaRow], stride: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val p = if (r.payload == null) Array.emptyByteArray else r.payload
      r.copy(payload = p.grouped(stride).map(_.head).toArray)
    })
  }

  /** Pure-Column metadata/digest path (no decode): byte length, content
    * digest, and a "first frame" sample digest — stays in codegen, used for
    * dedup/integrity at scale where full decode is unnecessary. */
  def mediaMetadata(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("media_id"),
      octet_length(encode(text, "UTF-8")).cast("long").as("byte_len"),
      md5(encode(text, "UTF-8")).as("content_md5"),
      md5(encode(substring(text, 1, 16), "UTF-8")).as("frame_md5"))
}
