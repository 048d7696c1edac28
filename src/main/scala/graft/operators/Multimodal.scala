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
      DecodedMedia(row.media_id, row.kind, n,
        width = 64 + (n % 577), height = 64 + ((n * 31) % 359),
        frames = 1 + (s % 30).toInt, feature = feat)
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
}
