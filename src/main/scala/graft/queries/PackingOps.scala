package graft.queries

import graft.core.Tables
import graft.operators.Packing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-batch assembly gates: sequence packing and sharded export
  * ([[graft.operators.Packing]]). Both outputs are engine-portable by
  * construction (md5-derived stream/shard assignment, integer token
  * arithmetic), so DuckDB replays the FULL results — per-document packing
  * assignments and per-shard manifest rows hash-match, not just totals. */
object PackingOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // every document's (stream, sequence, position) under greedy
    // contiguous packing at capacity 1024 — the window discipline is
    // pinned per-row: any reordering, boundary drift, or off-by-one in
    // the running count flips some row's assignment.
    "pack_sequences" -> ((s, dir) =>
      Packing.packSequences(Tables.documents(s, dir),
        capacityTokens = 1024, numStreams = 8)),

    // the shard manifest a training job validates before reading: writes
    // the hash-sharded corpus to parquet, then aggregates the WRITTEN
    // files. DuckDB recomputes n_docs/n_tokens/checksum per shard from
    // the source corpus — a lost, duplicated, or corrupted document in
    // any shard flips its checksum row.
    // sliding-window chunking at window=64/stride=48: the full per-chunk
    // table (index, token count, content md5) hash-matches DuckDB's
    // replication — any start drift, tail mishandling, or off-by-one in
    // the overlap changes some chunk's md5.
    // chunk-grain cross-document dedup (the RAG-prep shape: near-identical
    // passages shared across documents — boilerplate headers, quoted
    // blocks — collapse at CHUNK granularity even when the documents
    // differ): per doc, how many of its sliding-window chunks also appear
    // verbatim in ANOTHER document. Chunk identity is the chunk md5, so
    // DuckDB replicates the whole computation.
    "chunk_dedup_stats" -> ((s, dir) => {
      val chunks = Packing.chunkDocuments(Tables.documents(s, dir),
        window = 64, stride = 48)
      // chunks whose content appears in >= 2 distinct docs; the join
      // moves (md5, doc) pairs only, never text
      val shared = chunks.groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("chunk_md5")
      chunks.join(shared, Seq("chunk_md5"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared_chunks"))
        .join(chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks")),
          Seq("doc_id"), "right")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_shared_chunks"), lit(0L)).as("n_shared_chunks"))
    }),

    "chunk_documents" -> ((s, dir) =>
      Packing.chunkDocuments(Tables.documents(s, dir),
        window = 64, stride = 48)),

    "shard_export_manifest" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_shards").toString
      Packing.shardExport(Tables.documents(s, dir), path, numShards = 8)
    })
  )

  def oracles: Map[String, String] = Map(
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::UBIGINT % 8
        |      AS BIGINT) AS stream
        |  FROM documents),
        |c AS (
        |  SELECT *,
        |    CAST(sum(n_tok) OVER (PARTITION BY stream ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
        |      AS BIGINT) AS excl
        |  FROM t)
        |SELECT id, stream, excl // 1024 AS seq_id,
        |  CAST(row_number() OVER (PARTITION BY stream, excl // 1024
        |    ORDER BY id) - 1 AS BIGINT) AS seq_pos,
        |  n_tok
        |FROM c""".stripMargin,
    "chunk_documents" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, toks, n,
        |    unnest(generate_series(0,
        |      CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS s
        |  FROM d)
        |SELECT doc_id,
        |  CAST(s AS BIGINT) AS chunk_idx,
        |  CAST(len(toks[s*48+1 : least(s*48+64, n)]) AS BIGINT)
        |    AS n_chunk_tok,
        |  md5(array_to_string(toks[s*48+1 : least(s*48+64, n)], ' '))
        |    AS chunk_md5
        |FROM e""".stripMargin,
    "chunk_dedup_stats" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, toks, n,
        |    unnest(generate_series(0,
        |      CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS s
        |  FROM d),
        |c AS (
        |  SELECT doc_id,
        |    md5(array_to_string(toks[s*48+1 : least(s*48+64, n)], ' '))
        |      AS chunk_md5
        |  FROM e),
        |shared AS (
        |  SELECT chunk_md5 FROM c GROUP BY 1
        |  HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN chunk_md5 IN (SELECT chunk_md5 FROM shared)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks
        |FROM c GROUP BY 1""".stripMargin,
    "shard_export_manifest" ->
      """WITH d AS (
        |  SELECT text,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::UBIGINT % 8
        |      AS BIGINT) AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(('0x'||substr(md5(text),1,15))::UBIGINT % 2147483647)
        |    % 2147483647 AS BIGINT) AS checksum
        |FROM d GROUP BY shard""".stripMargin
  )
}
