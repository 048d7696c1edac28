package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Pins the training-batch assembly operators: packing invariants that the
  * aggregate gate cannot see, and the shard export round-trip. */
class PackingSpec extends GraftSuite {

  test("packSequences: partition of the corpus, contiguous sequences, " +
      "every non-final sequence full") {
    val docs = graft.core.Tables.documents(spark, sf)
    val packed = Packing.packSequences(docs, capacityTokens = 1024,
      numStreams = 8).cache()
    try {
      // every document exactly once, token totals preserved
      assert(packed.count() == docs.count())
      assert(packed.select(countDistinct(col("id"))).head().getLong(0) ==
        docs.count())
      val srcTokens = docs
        .select(sum(Packing.tokenCount(col("text")))).head().getLong(0)
      assert(packed.select(sum(col("n_tok"))).head().getLong(0) == srcTokens)

      // per (stream, seq): positions are 0..n-1; seq ids are 0..max
      // contiguous per stream
      val seqs = packed.groupBy(col("stream"), col("seq_id"))
        .agg(count(lit(1)).as("n"), max(col("seq_pos")).as("maxpos"),
          sum(col("n_tok")).as("toks"))
        .cache()
      try {
        assert(seqs.filter(col("maxpos") =!= col("n") - 1).count() == 0)
        val perStream = seqs.groupBy(col("stream"))
          .agg(count(lit(1)).as("nseq"), max(col("seq_id")).as("maxseq"))
        assert(perStream.filter(col("maxseq") =!= col("nseq") - 1).count() == 0)

        // greedy-cut invariant: a sequence other than its stream's last
        // ends only when full — tokens-before-next-boundary >= capacity,
        // i.e. every non-final sequence carries >= capacity - (overflow
        // of its first doc) ... the checkable form: the exclusive cumsum
        // of the NEXT sequence's first doc lies in the next capacity
        // window, so each non-final seq's token total >= capacity minus
        // its own start offset within the window. Simplest exact pin:
        // summed over any prefix of sequences, tokens >= seq_count *
        // capacity for all but the last (window arithmetic), checked via
        // the boundary definition directly:
        val bad = seqs.as("a").join(seqs.as("b"),
            col("a.stream") === col("b.stream") &&
              col("a.seq_id") + 1 === col("b.seq_id"))
          .groupBy(col("a.stream"))
          .agg(sum(col("a.toks")).as("toksNonFinal"),
            count(lit(1)).as("nNonFinal"))
          .filter(col("toksNonFinal") < col("nNonFinal") * 1024)
        assert(bad.count() == 0,
          "non-final sequences must average >= capacity tokens")
      } finally { seqs.unpersist(); () }
    } finally { packed.unpersist(); () }
  }

  test("chunkDocuments: start arithmetic, tail handling, overlap coverage, " +
      "and content vs an in-JVM reference") {
    val docs = graft.core.Tables.documents(spark, sf)
    val (win, st) = (64, 48)
    val chunks = Packing.chunkDocuments(docs, window = win, stride = st,
      emitText = true).cache()
    try {
      // per-doc chunk count and index contiguity: 1 + ceil(max(n-w,0)/s)
      val perDoc = chunks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nc"), max(col("chunk_idx")).as("maxi"))
        .join(docs.select(col("doc_id"),
          Packing.tokenCount(col("text")).as("n")), "doc_id")
      assert(perDoc.filter(col("maxi") =!= col("nc") - 1).count() == 0)
      assert(perDoc.filter(col("nc") =!=
        lit(1L) + ceil(greatest(col("n") - win, lit(0L)).cast("double") / st)
          .cast("long")).count() == 0)
      // every non-final chunk is exactly `window` tokens; the tail chunk
      // is n - S*stride (<= window, >= 1)
      val sized = chunks.join(perDoc.select(col("doc_id"), col("nc"), col("n")),
        "doc_id")
      assert(sized.filter(col("chunk_idx") < col("nc") - 1 &&
        col("n_chunk_tok") =!= win).count() == 0)
      assert(sized.filter(col("chunk_idx") === col("nc") - 1 &&
        col("n_chunk_tok") =!=
          least(col("n") - (col("nc") - 1) * st, lit(win.toLong))).count() == 0)

      // in-JVM reference on a sample: chunk text and md5 reproduce exactly
      val sample = docs.filter(col("doc_id") < 7)
        .orderBy(col("doc_id"))
        .select(col("doc_id"), col("text")).collect()
      val got = chunks.filter(col("doc_id") < 7)
        .orderBy(col("doc_id"), col("chunk_idx"))
        .select(col("doc_id"), col("chunk_text"), col("chunk_md5")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val want = sample.flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        val nStarts = 1 + math.ceil(math.max(toks.length - win, 0) / st.toDouble).toInt
        (0 until nStarts).map { i =>
          val t = toks.slice(i * st, math.min(i * st + win, toks.length))
            .mkString(" ")
          val m = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (r.getLong(0), t, m)
        }
      }
      assert(got.toSeq == want.toSeq)

      // stride == window degenerates to a partition: concatenating chunks
      // in order reconstructs each document byte-for-byte
      val flat = Packing.chunkDocuments(docs, window = win, stride = win,
        emitText = true)
        .groupBy(col("doc_id"))
        .agg(concat_ws(" ", array_sort(collect_list(
          struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("rebuilt"))
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
      assert(flat.filter(col("rebuilt") =!= col("text")).count() == 0)
    } finally { chunks.unpersist(); () }
  }

  test("shardExport: manifest matches written files; round-trip lossless") {
    val docs = graft.core.Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_shardspec")
      .toString
    val manifest = Packing.shardExport(docs, path, numShards = 4).cache()
    try {
      assert(manifest.count() == 4)
      assert(manifest.select(sum(col("n_docs"))).head().getLong(0) ==
        docs.count())
      // shard dirs on disk match the manifest's shard ids
      val dirs = Option(new java.io.File(path).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .map(_.getName.stripPrefix("shard=").toLong).toSet
      assert(dirs ==
        manifest.select(col("shard")).collect().map(_.getLong(0)).toSet)
      // round-trip: the written corpus equals the source (id + text)
      val back = spark.read.parquet(path)
      assert(back.select(col("doc_id"), col("text"))
        .exceptAll(docs.select(col("doc_id"), col("text"))).count() == 0)
      assert(docs.select(col("doc_id"), col("text"))
        .exceptAll(back.select(col("doc_id"), col("text"))).count() == 0)
      // checksum really is content-sensitive: recompute over a corrupted
      // copy and expect a different value for the victim's shard
      val victim = docs.limit(1).select(col("doc_id")).head().getLong(0)
      val corrupted = docs.withColumn("text",
        when(col("doc_id") === victim, concat(col("text"), lit(" x")))
          .otherwise(col("text")))
      val path2 = java.nio.file.Files
        .createTempDirectory("graft_shardspec2").toString
      val manifest2 = Packing.shardExport(corrupted, path2, numShards = 4)
      val joined = manifest.as("a").join(manifest2.as("b"), "shard")
        .filter(col("a.checksum") =!= col("b.checksum"))
      assert(joined.count() == 1, "exactly the victim's shard must differ")
    } finally { manifest.unpersist(); () }
  }
}
