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
