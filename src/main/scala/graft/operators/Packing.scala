package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly: greedy contiguous sequence packing and
  * hash-sharded export with a verifiable manifest — the two operations
  * between a curated corpus and an actual training run (the "pack into
  * context windows, write shards, ship a manifest" step every large
  * pretraining pipeline ends with; cf. the packing description in GPT-NeoX
  * / Megatron data loaders and the WebDataset shard+manifest convention).
  *
  * Scale design: both operators key every shuffle on a bounded-cardinality
  * hash-derived column (`stream` / `shard`), never on document content.
  * Packing is one shuffle (partition by stream, sort by id within stream);
  * export is one shuffle (partitionBy shard) plus a manifest aggregate over
  * 8-byte hashes. No windows over a global order anywhere — a window with
  * an empty PARTITION BY is the classic 100 TB single-partition trap.
  */
object Packing {

  /** Engine-portable shard/stream assignment: the first 16 bits of
    * `md5(CAST(id AS STRING))` mod `n`. md5-derived (not xxhash64) so the
    * DuckDB gate replicates assignments bit-for-bit:
    * `('0x'||substr(md5(CAST(id AS VARCHAR)),1,4))::UBIGINT % n`. */
  def portableShard(id: Column, n: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % n

  /** Whitespace token count, matching the corpus gates' tokenization
    * (`string_split(text, ' ')` on the DuckDB side). */
  def tokenCount(text: Column): Column = size(split(text, " ")).cast("long")

  /** Greedy contiguous sequence packing: documents are dealt into
    * `numStreams` hash streams, ordered by id within each stream, and cut
    * into training sequences of `capacityTokens` by exclusive running
    * token count — a document starts a new sequence exactly when the
    * tokens before it fill the current capacity multiple. The common
    * concat-and-cut packing discipline (documents separated by EOD,
    * sequences allowed to run over by less than one document) expressed
    * as one window; every assignment is deterministic and replicable in
    * plain SQL window functions, so the full output is oracle-checkable.
    *
    * One shuffle total: hash-partition by stream, sort by id within
    * partition (exactly the window's requirement). Streams bound both
    * sort size and skew: each holds ~1/numStreams of the corpus by count,
    * independent of document length distribution. The running sum is
    * exact integer arithmetic — no float division anywhere a boundary
    * could shift.
    *
    * Output: one row per document — (id, stream, seq_id, seq_pos, n_tok)
    * where seq_id counts sequences within the stream and seq_pos counts
    * documents within the sequence.
    */
  def packSequences(docs: DataFrame, capacityTokens: Long,
                    numStreams: Int = 8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(capacityTokens > 0 && numStreams > 0)
    val base = docs.select(col(idCol).as("id"),
        tokenCount(col(textCol)).as("n_tok"))
      .withColumn("stream", portableShard(col("id"), numStreams))
    val w = Window.partitionBy(col("stream")).orderBy(col("id"))
    val excl = sum(col("n_tok")).over(w) - col("n_tok")
    val seqId = ((excl - pmod(excl, lit(capacityTokens))) / capacityTokens)
      .cast("long")
    val withSeq = base.withColumn("seq_id", seqId)
    withSeq
      .withColumn("seq_pos", row_number()
        .over(Window.partitionBy(col("stream"), col("seq_id"))
          .orderBy(col("id"))).cast("long") - 1)
      .select(col("id"), col("stream"), col("seq_id"), col("seq_pos"),
        col("n_tok"))
  }

  /** Per-sequence packing summary — the gate/report shape: one row per
    * (stream, seq_id) with document count, token count, and the fill
    * ratio against capacity (>1.0 marks the overflow-tail sequence that
    * greedy cutting produces; every non-final sequence in a stream is
    * full by construction). */
  def packedSummary(docs: DataFrame, capacityTokens: Long,
                    numStreams: Int = 8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    packSequences(docs, capacityTokens, numStreams, idCol, textCol)
      .groupBy(col("stream"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("fill_ratio",
        round(col("n_tokens") / capacityTokens.toDouble, 6))

  /** Sliding-window document chunking: every document becomes overlapping
    * token windows of `window` tokens advancing by `stride` — the
    * context-window chunking step in front of embedding models and
    * long-document training (RAG chunkers, FiD passage splitters). Chunk
    * starts are `0, stride, 2·stride, …` and the LAST start is the
    * smallest multiple of `stride` covering the tail, so every token lands
    * in at least one chunk and (for `stride < window`) every boundary is
    * straddled by an overlapping chunk. A document with ≤ `window` tokens
    * yields exactly one chunk (itself).
    *
    * Pure narrow plan — tokenize, `transform` over a `sequence` of starts,
    * `explode` — no shuffle, no UDF, whole-stage codegen throughout; at
    * 100 TB it is a map-only pass whose output partitioning inherits the
    * scan's. By default each chunk is emitted as its md5 + token count
    * (16 B/chunk crossing the pipe, the shape the dedup/decontamination
    * ledgers downstream want); `emitText=true` adds the chunk text itself
    * for feature-extraction consumers.
    *
    * Output: (doc_id, chunk_idx, n_chunk_tok, chunk_md5 [, chunk_text]).
    */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 48,
                     emitText: Boolean = false,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
    // starts 0..S with S = ceil(max(n-window,0)/stride): the unique start
    // count under "cover every token, never start past the tail".
    val nChunks = lit(1L) +
      ceil(greatest(col("n_tok") - window, lit(0L)).cast("double") / stride)
        .cast("long")
    val chunks = transform(sequence(lit(0L), nChunks - 1), s => {
      val chunkToks = slice(col("toks"), (s * stride + 1).cast("int"),
        lit(window))
      val fields = Seq(
        s.cast("long").as("chunk_idx"),
        size(chunkToks).cast("long").as("n_chunk_tok"),
        md5(concat_ws(" ", chunkToks)).as("chunk_md5")) ++
        (if (emitText) Seq(concat_ws(" ", chunkToks).as("chunk_text"))
         else Seq.empty)
      struct(fields: _*)
    })
    base.select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id") +: (Seq("chunk_idx", "n_chunk_tok", "chunk_md5") ++
        (if (emitText) Seq("chunk_text") else Seq.empty))
        .map(f => col(s"c.$f")): _*)
  }

  /** 2^31-1, the Mersenne prime the manifest checksum folds into: per-doc
    * 60-bit md5 prefixes reduced mod p, summed (max shard size before
    * long overflow ≈ 2^32 docs), reduced again — order-independent,
    * engine-portable, and sensitive to any changed/missing/extra doc. */
  val ChecksumMod: Long = 2147483647L

  /** Hash-sharded training-data export: writes `numShards` shard
    * directories (`shard=K/`) of parquet under `path` and returns the
    * manifest — one row per shard with document count, token count, and
    * an order-independent content checksum (sum over docs of the first
    * 60 bits of `md5(text)` mod 2^31-1, folded mod 2^31-1). The manifest
    * is the contract a training job validates before reading: DuckDB
    * recomputes every column from the source corpus, so a lost row, a
    * duplicated row, or a corrupted text in any shard flips the gate.
    *
    * One shuffle (repartition by shard), writes happen shard-parallel,
    * and the manifest aggregates 8-byte values — document text never
    * crosses the wire a second time.
    */
  def shardExport(docs: DataFrame, path: String, numShards: Int = 8,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val sharded = docs
      .withColumn("shard", portableShard(col(idCol), numShards))
    sharded
      .repartition(numShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(path)
    // manifest computed from the FILES JUST WRITTEN (not the input frame):
    // it certifies the bytes on disk. Partition-column inference reads
    // `shard=K` back as int — normalize to long for a stable gate schema.
    docs.sparkSession.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("n_tokens"),
        pmod(sum(pmod(conv(substring(md5(col(textCol)), 1, 15), 16, 10)
            .cast("long"), lit(ChecksumMod))), lit(ChecksumMod))
          .as("checksum"))
  }
}
