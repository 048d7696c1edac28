package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked ENTITY RESOLUTION (record linkage): canonicalize near-identical
  * string keys — "cold anvil" / "old anvil" — into one entity label, then
  * map every record to its entity.
  *
  * The 100 TB shape is dictionary-level resolution: candidate generation
  * and matching run over the DISTINCT value domain (the dictionary), never
  * over records — a 100 TB fact table with a few million distinct names
  * pairs within blocks of the few-million-row dictionary, and the records
  * only ever see one broadcast label join. Blocking (a cheap deterministic
  * key: last token, prefix, soundex-ish fold) bounds the quadratic stage
  * to within-block pairs, the standard record-linkage trick for exactly
  * this reason.
  *
  * Matching is exact Levenshtein (Spark's codegen'd `levenshtein`, same
  * integer metric DuckDB computes, so gates hash-match); clustering is the
  * engine's min-label [[Dedup.connectedComponents]] over matched pairs —
  * an entity is the lexicographically-least member name of its component.
  */
object EntityResolution {

  /** Candidate match pairs among the distinct values of `nameCol`:
    * one row per (name_a < name_b) sharing a block with edit distance
    * ≤ `maxDist`. `blockOf` derives the blocking key from a name column.
    * Only (block, name) tuples of the dictionary shuffle — records never
    * enter the pair stage. */
  def matchPairs(records: DataFrame, nameCol: String,
                 blockOf: Column => Column, maxDist: Int): DataFrame = {
    val names = records.select(col(nameCol).as("name")).distinct()
      .withColumn("blk", blockOf(col("name")))
    val a = names.select(col("blk"), col("name").as("name_a"))
    val b = names.select(col("blk"), col("name").as("name_b"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** Every record labeled with its canonical `entity` (min name of the
    * match component; an unmatched name is its own entity). The component
    * table is dictionary-sized, so it broadcasts onto the record stream —
    * records are never shuffled for resolution. */
  def resolve(records: DataFrame, nameCol: String,
              blockOf: Column => Column, maxDist: Int): DataFrame = {
    val pairs = matchPairs(records, nameCol, blockOf, maxDist)
    val labels = Dedup.connectedComponents(pairs, idA = "name_a", idB = "name_b")
      .withColumnRenamed("id", nameCol)
    records.join(broadcast(labels), Seq(nameCol), "left")
      .withColumn("entity", coalesce(col("component"), col(nameCol)))
      .drop("component")
  }
}
