package graft

import java.time.Instant
import graft.core.Tables
import graft.functions.Buckets.Granularity
import graft.operators.{Metrics, Multimodal}
import org.apache.spark.sql.functions._

class MetricsMultimodalSpec extends GraftSuite {

  test("dense fill: every slot × observed combo present exactly once, zeros filled") {
    val req = Metrics.Request(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-31T00:00:00Z"),
      Granularity.parse("1d"), measures = Seq("count"), dimensions = Seq("event_type"))
    val res = Metrics.query(spark, Tables.events(spark, sf), req)
    val rows = res.df.collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == 30 * types.length, s"${rows.length} rows, ${types.length} types")
    assert(rows.map(_.getAs[Long]("count")).sum == Tables.events(spark, sf)
      .filter(col("ts") < lit("2024-01-31").cast("timestamp")).count())
  }

  test("rate = count / bucketSeconds for hour buckets") {
    val req = Metrics.Request(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-02T00:00:00Z"),
      Granularity.parse("1h"), measures = Seq("count", "rate"))
    val rows = Metrics.query(spark, Tables.events(spark, sf), req).df.collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("rate") - r.getAs[Long]("count") / 3600.0) < 1e-12)
    }
  }

  test("metrics filters restrict the fact scan") {
    val req = Metrics.Request(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-31T00:00:00Z"),
      Granularity.parse("1d"), measures = Seq("count"),
      filters = Map("event_type" -> Seq("error")))
    val total = Metrics.query(spark, Tables.events(spark, sf), req).df
      .agg(sum("count")).head().getLong(0)
    val want = Tables.events(spark, sf)
      .filter(col("event_type") === "error" &&
        col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-01-31").cast("timestamp")).count()
    assert(total == want)
  }

  test("row limit + truncation flag") {
    val req = Metrics.Request(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-31T00:00:00Z"),
      Granularity.parse("1h"), measures = Seq("count"), rowLimit = 100)
    val (rows, truncated) = Metrics.run(spark, Tables.events(spark, sf), req)
    assert(rows.length == 100 && truncated, "720 buckets must truncate at 100")
    val (all, notTrunc) = Metrics.run(spark, Tables.events(spark, sf),
      req.copy(rowLimit = 100000))
    assert(all.length == 720 && !notTrunc)
  }

  test("resource guard: high-cardinality dimension fails fast as a client error") {
    val req = Metrics.Request(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-31T00:00:00Z"),
      Granularity.parse("1h"), measures = Seq("count"), dimensions = Seq("user_id"),
      maxGroups = 1000) // 150 users x 720 buckets = 108000 groups > 1000
    val e = intercept[Metrics.ResourceLimitExceeded] {
      Metrics.query(spark, Tables.events(spark, sf), req)
    }
    assert(e.getMessage.contains("narrow the time range"))
  }

  test("fill join degrades from broadcast to shuffle above the group cap") {
    def plan(cap: Long): String = {
      val req = Metrics.Request(
        Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-08T00:00:00Z"),
        Granularity.parse("1d"), measures = Seq("count"), dimensions = Seq("event_type"),
        broadcastGroupCap = cap)
      val res = Metrics.query(spark, Tables.events(spark, sf), req)
      try res.df.queryExecution.executedPlan.toString finally res.cleanup()
    }
    assert(plan(Metrics.BroadcastGroupCap).contains("BroadcastHashJoin"))
    val degraded = plan(1) // tiny cap forces the shuffle path
    assert(degraded.contains("ShuffledHashJoin") || degraded.contains("SortMergeJoin"),
      degraded)
  }

  test("logstore retention drops old month partitions at the directory level") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl").toString
    graft.operators.Logstore.insertMany(
      Tables.events(spark, sf).select("event_id", "ts", "event_type"),
      dir, idCol = "event_id", tsCol = "ts")
    // synthesize an old partition
    val old = new java.io.File(s"$dir/month=2023-06"); old.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/month=2023-06/dummy.txt"), "x")
    val dropped = graft.operators.Logstore.dropPartitionsBefore(dir, "2024-01")
    assert(dropped == Seq("2023-06"))
    assert(!old.exists())
    // current data intact and readable
    assert(graft.operators.Logstore.scan(spark, dir).count() ==
      Tables.events(spark, sf).count())
  }

  test("multimodal decode is deterministic and schema-complete") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf))
    def key(m: Multimodal.DecodedMedia) =
      (m.media_id, m.kind, m.byte_len, m.width, m.height, m.frames, m.feature.toSeq)
    val d1 = Multimodal.decodeAll(spark, media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeAll(spark, media).collect().sortBy(_.media_id)
    assert(d1.map(key).toSeq == d2.map(key).toSeq, "deterministic decode")
    d1.foreach { m =>
      assert(m.byte_len > 0 && m.frames >= 1)
      if (m.kind == "image") {
        // REAL decode: dims read from actual PNG headers must equal the
        // synthesis contract
        assert(m.width == Multimodal.imageWidth(m.media_id))
        assert(m.height == Multimodal.imageHeight(m.media_id))
        assert(m.frames == 1)
        assert(math.abs(m.feature.sum - 1f) < 1e-4, "histogram L1-normalized")
      } else assert(m.width >= 64 && m.height >= 64)
      assert(m.feature.length == 8 && m.feature.forall(f => f >= 0f && f <= 1f))
      assert(Set("image", "audio", "video").contains(m.kind))
    }
  }

  test("image codec: PNG round-trip and real resize read back from bytes") {
    import Multimodal.ImageCodec
    val png = ImageCodec.encodePng(40, 24, seed = 7)
    // a real PNG: magic bytes + decodable + exact dims
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = ImageCodec.decodeImage(png)
    assert(img.getWidth == 40 && img.getHeight == 24)
    val resized = ImageCodec.resizePng(png, 10, 6)
    val back = ImageCodec.decodeImage(resized)
    assert(back.getWidth == 10 && back.getHeight == 6)
    // garbage payload is rejected, not silently decoded
    intercept[IllegalArgumentException] {
      ImageCodec.decodeImage(Array[Byte](1, 2, 3, 4))
    }
    // the distributed resize stage reports geometry read from re-encoded
    // bytes for every image row
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf))
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
    val rs = Multimodal.resizeMedia(spark, media, 24, 16).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.out_w == 24 && r.out_h == 16)
      assert(r.width == Multimodal.imageWidth(r.media_id))
      assert(r.height == Multimodal.imageHeight(r.media_id))
    }
  }

  test("multimodal resize and frame sampling stages") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf))
    val decoded = Multimodal.decodeAll(spark, media)
    val resized = Multimodal.resizeAll(decoded, 224, 224).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.out_w == 224 && r.out_h == 224)
      assert(math.abs(r.scale_x - 224.0 / r.width) < 1e-6)
      assert(math.abs(r.scale_y - 224.0 / r.height) < 1e-6)
      assert(r.feature.length == 8)
    }
    // 3 evenly spaced frames per video clip, deduped for short clips;
    // indices in range, ascending per clip, non-video kinds absent
    val frames = Multimodal.sampleFrames(decoded, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byClip = frames.groupBy(_._1)
    val videoIds = decoded.filter(_.kind == "video").collect()
      .map(m => m.media_id -> m.frames).toMap
    assert(byClip.keySet == videoIds.keySet)
    byClip.foreach { case (id, rows) =>
      val n = videoIds(id)
      val idxs = rows.map(_._3).toSeq
      assert(idxs == idxs.sorted && idxs.distinct == idxs)
      assert(idxs.forall(i => i >= 0 && i < n))
      assert(idxs == (0 until 3).map(j => j * n / 3).distinct)
    }
  }

  test("aHash: re-encode-invariant, resize-robust, distinct for different images") {
    import graft.operators.Multimodal.ImageCodec
    val png = ImageCodec.encodePng(48, 32, seed = 7)
    val h = ImageCodec.aHash(ImageCodec.decodeImage(png))
    // deterministic across decodes; invariant under 1:1 re-encode
    assert(h == ImageCodec.aHash(ImageCodec.decodeImage(png)))
    val reenc = ImageCodec.resizePng(png, 48, 32)
    assert(ImageCodec.aHash(ImageCodec.decodeImage(reenc)) == h)
    // a 2x downscale of the same image stays within a few bits
    val half = ImageCodec.resizePng(png, 24, 16)
    val hHalf = ImageCodec.aHash(ImageCodec.decodeImage(half))
    assert(java.lang.Long.bitCount(h ^ hHalf) <= 6,
      s"downscale moved ${java.lang.Long.bitCount(h ^ hHalf)} bits")
    // a structurally different image (checkerboard vs gradient) is far
    // away — note the synthetic gradients themselves are all similar by
    // CONSTRUCTION (seed shifts colors, not structure), which is exactly
    // why the corpus yields a rich near-dup pair set for the gate
    val board = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      board.setRGB(x, y, if (((x / 6) + (y / 4)) % 2 == 0) 0xFFFFFF else 0)
    val hOther = ImageCodec.aHash(board)
    assert(java.lang.Long.bitCount(h ^ hOther) > 6)
  }
}
