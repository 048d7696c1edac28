package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and bounded
  * range join, composed from built-ins (preference (a) of the custom-op
  * ladder — no custom SparkPlan needed because the union/window and
  * bucket-join formulations already give distributed, shuffle-minimal
  * plans).
  */
object TemporalJoins {

  /** As-of join: for every left row, the latest right row with the same key
    * and `right.ts <= left.ts`.
    *
    * Formulation: tag + union both sides, single window pass per key ordered
    * by (ts, side) forward-filling the most recent right payload, keep left
    * rows. ONE shuffle on the key (same as a sort-merge join would need) and
    * no range explosion — this is the canonical scale-out as-of shape; a
    * sort-merge-based custom SparkPlan would save only the union overhead.
    *
    * @param left      left rows
    * @param right     right rows
    * @param keyCols   equi-key column names (both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (emitted as `asof_<name>`)
    */
  /** @param direction       "backward" (latest right at-or-before left, the
    *                        default) or "forward" (earliest right
    *                        at-or-after left) — pandas merge_asof's axes
    * @param toleranceMillis max |left.ts − matched.ts|: a match further
    *                        away nulls out (row kept, pandas semantics) */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               direction: String = "backward",
               toleranceMillis: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_pay", lit(null).cast(
        right.select(struct((rightTs +: payload).map(col): _*)).schema.head.dataType))
    val r = right
      .select((keyCols.map(col) :+
        col(rightTs).as("_ts") :+ lit(0).as("_side") :+
        struct((rightTs +: payload).map(col): _*).as("_pay")): _*)
    // align schemas: left keeps its own columns, right fills them with null
    val lNorm = l.select((keyCols.map(col) ++ Seq(col("_ts"), col("_side"), col("_pay")) ++
      leftCols.filterNot(keyCols.contains).map(col)): _*)
    val rNorm = leftCols.filterNot(keyCols.contains).foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lNorm.columns.map(col): _*)
    val unioned = lNorm.unionByName(rNorm)
    // right rows sort before left rows at equal ts (<=/>= semantics both
    // inclusive); forward simply walks time in reverse — same single
    // window pass, still ONE shuffle on the key
    val order =
      if (direction == "backward") Seq(col("_ts").asc, col("_side").asc)
      else Seq(col("_ts").desc, col("_side").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled0 = unioned.withColumn("_last", last(col("_pay"), ignoreNulls = true).over(w))
    // tolerance (pandas merge_asof): a match further than the bound nulls
    // out, the left row survives
    val filled = toleranceMillis match {
      case None => filled0
      case Some(tol) => filled0.withColumn("_last",
        when(col("_last").isNotNull &&
          abs(unix_millis(col("_ts")) -
            unix_millis(col("_last").getField(rightTs))) <= tol, col("_last")))
    }
    val outPayload = payload.map(p => col("_last").getField(p).as(s"asof_$p")) :+
      col("_last").getField(rightTs).as(s"asof_$rightTs")
    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ outPayload: _*)
  }

  /** Bounded range join: pairs (a, b) with equal keys and
    * `a.ts < b.ts <= a.ts + windowMillis`.
    *
    * A naive theta join explodes; instead both sides are bucketed to
    * `windowMillis`-wide time buckets and each left row probes its own and
    * the next bucket (any in-window partner lives in one of the two). The
    * join is a plain equi-join on (key, bucket) → hash-partitionable,
    * AQE-skew-splittable, no cross product.
    */
  def rangeJoinPairs(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, windowMillis: Long): DataFrame = {
    def bucketOf(t: Column): Column =
      floor(t.cast("double") / windowMillis.toDouble).cast("long")
    val a = df.select(col(keyCol).as("k"), col(idCol).as("id_a"),
        unix_millis(col(tsCol)).as("t_a"))
      .withColumn("bkt", explode(array(bucketOf(col("t_a")), bucketOf(col("t_a")) + 1)))
    val b = df.select(col(keyCol).as("k"), col(idCol).as("id_b"),
        unix_millis(col(tsCol)).as("t_b"))
      .withColumn("bkt", bucketOf(col("t_b")))
    // each b row lives in exactly one bucket and each a row probes two
    // distinct buckets → a matching pair joins exactly once, no dedup needed
    a.join(b, Seq("k", "bkt"))
      .filter(col("t_b") > col("t_a") && col("t_b") <= col("t_a") + windowMillis)
      .select(col("k"), col("id_a"), col("id_b"), (col("t_b") - col("t_a")).as("gap_ms"))
  }

  /** STREAM-STREAM interval join: correlate two live streams on a key
    * within a bounded event-time window (`0 <= right.ts - left.ts <=
    * windowMillis`) — e.g. delivery attempts against provider callbacks.
    *
    * This is Structured Streaming's native stateful join: BOTH sides
    * carry watermarks (`delayMillis` of allowed lateness) and the time
    * bound rides IN the join condition, which is what lets the state
    * store evict rows once the watermark passes their window — without
    * the bound the state grows forever. Inner semantics: a row emits
    * when its partner arrives; state size stays O(window × rate).
    *
    * Both inputs must be STREAMING frames. The left keeps its columns;
    * right payload lands as `j_<name>`. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                         leftTs: String, rightTs: String,
                         windowMillis: Long, delayMillis: Long): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "streamIntervalJoin needs two streaming inputs")
    val delay = s"$delayMillis milliseconds"
    val l = left.withWatermark(leftTs, delay)
    val rCols = right.columns.toSeq
    val r0 = right.withWatermark(rightTs, delay)
    val r = rCols.foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"j_$c"))
    l.join(r,
      col(keyCol) === col(s"j_$keyCol") &&
        col(s"j_$rightTs") >= col(leftTs) &&
        col(s"j_$rightTs") <= col(leftTs) + expr(s"INTERVAL $windowMillis MILLISECONDS"),
      "inner")
  }
}
