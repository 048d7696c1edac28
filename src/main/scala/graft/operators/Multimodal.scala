package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns with typed metadata
  * alongside. Since r6 the IMAGE path is a real codec — PNG/BMP
  * decode → resize → re-encode through `javax.imageio` ([[ImageCodec]]),
  * exercised on real synthesized PNG bytes — while audio/video decoding
  * stays an honestly-labeled deterministic stub ([[StubCodec]]: the
  * container has no audio/video libraries). Swap `StubCodec.decode` for a
  * real JNI/library call and nothing else changes.
  *
  * Scale design: decode runs in `mapPartitions` over an iterator — codec
  * state (ImageIO reader instances, kernel tables) inits once per
  * partition, not per row, streaming through rows without materializing
  * the partition — the batch shape of a Python `mapInPandas` decode
  * stage. Payload bytes stay columnar until the decode projection;
  * metadata-only queries never touch them (parquet column pruning).
  */
object Multimodal {

  /** A media row: payload + envelope metadata. `src_bytes` is ingest-side
    * envelope metadata (size of the source object), carried through so
    * metadata-only queries never read `payload`. */
  final case class MediaRow(media_id: Long, kind: String,
                            src_bytes: Int, payload: Array[Byte])

  /** Decoded features. For images every field is read from the actual
    * pixels/header; for audio/video the stub derives them from the
    * envelope. */
  final case class DecodedMedia(media_id: Long, kind: String, byte_len: Int,
                                width: Int, height: Int, frames: Int,
                                feature: Array[Float])

  /** Real image codec on `javax.imageio` (PNG + BMP ship with the JDK).
    *
    * All methods are static-stateless and thread-safe; `ImageIO.read`
    * allocates its reader per call which is fine at the row sizes here —
    * a per-partition reusable `ImageReader` is the drop-in upgrade when
    * payloads grow.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    /** Deterministic synthetic PNG: `width`×`height`, pixel (x,y) is a
      * seeded gradient — real bytes a real decoder must parse. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0, "image dims must be positive")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = (seed + x * 31L + y * 131L) & 0xFFFFFF
          img.setRGB(x, y, v.toInt)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream(width * height / 2 + 64)
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decodeImage(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          "undecodable image payload (not PNG/BMP/GIF/JPEG)")
      img
    }

    /** 8-bin luma histogram, L1-normalized — a real pixel-derived feature
      * vector (the stand-in for a learned embedding). */
    def lumaHistogram(img: BufferedImage): Array[Float] = {
      val bins = new Array[Float](8)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          bins(luma >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w * h).toFloat
      bins.map(_ / n)
    }

    def decode(row: MediaRow): DecodedMedia = {
      val img = decodeImage(row.payload)
      DecodedMedia(row.media_id, row.kind, row.payload.length,
        img.getWidth, img.getHeight, frames = 1, lumaHistogram(img))
    }

    /** 64-bit average-hash (aHash) perceptual fingerprint: mean luma per
      * cell of an 8×8 block grid, bit i set when cell i is brighter than
      * the grid average. Re-encoded and mildly resampled variants land
      * within a few Hamming bits, so the SimHash pairing machinery
      * ([[graft.operators.Dedup.simhashPairsFromFingerprints]]) does
      * image near-dup at corpus scale — only 8-byte hashes shuffle,
      * pixels never leave their partition. Integer block sums, a single
      * double mean — deterministic on any JVM. */
    def aHash(img: BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      val sums = new Array[Long](64); val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          val c = cy * 8 + x * 8 / w
          sums(c) += luma; counts(c) += 1
          x += 1
        }
        y += 1
      }
      val means = Array.tabulate(64)(i =>
        if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
      val avg = means.sum / 64.0
      means.zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
        if (m > avg) acc | (1L << i) else acc
      }
    }

    /** Real resample: bilinear scale to (tw, th), re-encode as PNG. */
    def resizePng(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      require(tw > 0 && th > 0, "target dims must be positive")
      val src = decodeImage(payload)
      val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, tw, th, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream(tw * th / 2 + 64)
      ImageIO.write(dst, "png", out)
      out.toByteArray
    }
  }

  /** Deterministic fake codec for the kinds the container has no library
    * for (audio/video): dimensions/features derived from payload bytes.
    * Replace with a real decoder; the pipeline shape is unchanged. */
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

  /** Wrap a text corpus as a mixed-kind binary media table. IMAGE rows
    * (doc_id ≡ 0 mod 3) carry REAL synthesized PNG payloads whose
    * dimensions are a fixed function of doc_id (so the DuckDB gate can
    * predict what the real decoder must read back); audio/video rows
    * carry UTF-8 text bytes for the stub. Payload synthesis runs
    * per-partition on executors — the driver never holds images. */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id"),
        (when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("kind"),
        octet_length(encode(col(textCol), "UTF-8")).as("src_bytes"),
        encode(col(textCol), "UTF-8").as("text_payload"))
      .as[(Long, String, Int, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, srcBytes, textBytes) =>
          val payload =
            if (kind == "image")
              ImageCodec.encodePng(imageWidth(id), imageHeight(id), seed = id)
            else textBytes
          MediaRow(id, kind, srcBytes, payload)
        }
      }.toDF()
  }

  /** The synthesized image geometry — the contract the oracle replays and
    * the real decode must reproduce from actual PNG headers. */
  def imageWidth(id: Long): Int = (16 + (id * 13) % 48).toInt
  def imageHeight(id: Long): Int = (16 + (id * 7) % 32).toInt

  /** The decode stage: binary payloads → typed features, streamed per
    * partition; images through the real [[ImageCodec]], audio/video
    * through the labeled stub. */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "src_bytes", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.map { row =>
          if (row.kind == "image") ImageCodec.decode(row)
          else StubCodec.decode(row)
        }
      }
  }

  /** (media_id, ahash) perceptual fingerprints for the image rows —
    * streamed per partition like [[decodeAll]]. */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("media_id", "kind", "src_bytes", "payload").as[MediaRow]
      .mapPartitions(it => it.map(r =>
        (r.media_id, ImageCodec.aHash(ImageCodec.decodeImage(r.payload)))))
      .toDF("media_id", "ahash")
  }

  /** Image near-duplicate pairs: aHash fingerprints through the
    * guaranteed-recall pigeonhole Hamming pairing — the multimodal twin
    * of text SimHash dedup. Output (id_a, id_b, hamming). */
  def nearDuplicateImages(spark: SparkSession, media: DataFrame,
                          maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairsComplete(
      imageHashes(spark, media)
        .select(col("media_id").as("id"), col("ahash").as("sh")), maxHamming)

  /** Resized media: original + target geometry and, for images, the REAL
    * re-encoded payload's decoded dimensions (out_w/out_h read back from
    * the resized PNG, not assumed). */
  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int,
                                out_w: Int, out_h: Int,
                                scale_x: Double, scale_y: Double,
                                feature: Array[Float])

  /** The resize stage over a MEDIA table (payload in hand): images run
    * decode → bilinear resample → PNG re-encode → re-decode, so the
    * reported output geometry is read from real bytes; non-image rows
    * pass through the stub decode with arithmetic-only scaling. */
  def resizeMedia(spark: SparkSession, media: DataFrame,
                  targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    media.select("media_id", "kind", "src_bytes", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.map { row =>
          if (row.kind == "image") {
            val src = ImageCodec.decodeImage(row.payload)
            val resized = ImageCodec.resizePng(row.payload, targetW, targetH)
            val back = ImageCodec.decodeImage(resized)
            ResizedMedia(row.media_id, row.kind, src.getWidth, src.getHeight,
              back.getWidth, back.getHeight,
              math.rint(targetW.toDouble / src.getWidth * 1e6) / 1e6,
              math.rint(targetH.toDouble / src.getHeight * 1e6) / 1e6,
              ImageCodec.lumaHistogram(back))
          } else {
            val m = StubCodec.decode(row)
            ResizedMedia(m.media_id, m.kind, m.width, m.height,
              targetW, targetH,
              math.rint(targetW.toDouble / m.width * 1e6) / 1e6,
              math.rint(targetH.toDouble / m.height * 1e6) / 1e6,
              m.feature)
          }
        }
      }
  }

  /** Back-compat arithmetic resize over already-decoded rows (no payload
    * in hand — geometry only). */
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
