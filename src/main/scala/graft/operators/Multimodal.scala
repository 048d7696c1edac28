package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns with typed metadata
  * alongside — the schema/partitioning/batching side of a decode pipeline is
  * real; the codec itself is STUBBED (this container has no image/audio
  * libraries) behind [[StubCodec]], a deterministic fake that derives
  * "decoded" properties from the bytes. Swap `StubCodec.decode` for a real
  * JNI/library call and nothing else changes.
  *
  * Scale design: decode runs in `mapPartitions` over an iterator — one codec
  * init per partition (not per row), streaming through rows without
  * materializing the partition, mirroring the batch shape of a Python
  * `mapInPandas` decode stage. Payload bytes stay columnar until the decode
  * projection; metadata-only queries never touch them (parquet column
  * pruning).
  */
object Multimodal {

  /** A media row: payload + envelope metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** "Decoded" features — the schema a real decoder would fill. */
  final case class DecodedMedia(media_id: Long, kind: String, byte_len: Int,
                                width: Int, height: Int, frames: Int,
                                feature: Array[Float])

  /** Deterministic fake codec: dimensions/features derived from payload
    * bytes. Replace with a real decoder; the pipeline shape is unchanged. */
  object StubCodec {
    def decode(row: MediaRow): DecodedMedia = {
      val n = row.payload.length
      // cheap deterministic byte-sum "signal" (stand-in for decoded content)
      var s = 0L
      var i = 0
      while (i < n) { s = (s * 31 + (row.payload(i) & 0xff)) & 0x7fffffffL; i += 1 }
      val feat = Array.tabulate(8)(j => (((s >> (j * 4)) & 0xf).toFloat) / 15.0f)
      // envelope-derived fields (byte_len math only) so downstream stages
      // (frame sampling) stay replayable by the oracle; the byte-fold `s`
      // feeds only the feature vector, the stand-in for decoded content
      DecodedMedia(row.media_id, row.kind, n,
        width = 64 + (n % 577), height = 64 + ((n * 31) % 359),
        frames = 1 + (n % 30), feature = feat)
    }
  }

  /** Wrap a text corpus as a binary media table (UTF-8 payloads) — the
    * stand-in ingest for image/audio blobs in this environment. */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** The decode stage: binary payloads → typed features, one codec per
    * partition, streamed. */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition codec init would go here
      it.map(StubCodec.decode)
    }
  }

  /** Resized media: original + target geometry with the scale factors a
    * real resampler would apply. */
  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int,
                                target_w: Int, target_h: Int,
                                scale_x: Double, scale_y: Double,
                                feature: Array[Float])

  /** The resize stage: per-partition streamed like decode (a real
    * resampler inits its kernel tables once per partition). The geometry
    * arithmetic is real; only the pixel work is stubbed (the feature
    * vector passes through, as a cheap resampler stand-in). */
  def resizeAll(decoded: Dataset[DecodedMedia], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { m =>
        ResizedMedia(m.media_id, m.kind, m.width, m.height, targetW, targetH,
          math.rint(targetW.toDouble / m.width * 1e6) / 1e6,
          math.rint(targetH.toDouble / m.height * 1e6) / 1e6,
          m.feature)
      }
    }
  }

  /** Frame sampling for video media: `k` evenly spaced frame indices over
    * `[0, frames)` — `floor(j·frames/k)` for j < k, deduplicated when the
    * clip is shorter than k — exploded to one row per sampled frame (the
    * fan-out shape a real frame extractor feeds downstream). Non-video
    * rows drop. */
  def sampleFrames(decoded: Dataset[DecodedMedia], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("frames"),
        explode(array_distinct(transform(sequence(lit(0), lit(k - 1)),
          j => floor(j * col("frames") / k).cast("int")))).as("frame_idx"))
  }
}
