package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HEAVY-HITTER sketches (Misra–Gries summaries) as binary
  * columns: `graft_mg_agg(item, k)` folds strings into a k-counter
  * summary, `graft_mg_merge(sketch)` re-aggregates stored sketches,
  * `graft_mg_topk(sketch)` reads the surviving (item, count) candidates
  * out, largest first.
  *
  * The third member of the mergeable-summary family (HLL distinct, GK
  * quantiles — [[graft.operators.Sketches]]): frequent-item discovery at
  * FIXED memory over unbounded streams, the shape that finds boilerplate
  * n-grams / dominant tokens in a 100 TB corpus without a full
  * count-all-tokens shuffle. Like GK — and unlike Count-Min — the MG
  * bound is WORST-CASE deterministic, so gates pin it as hard booleans:
  * a summary over n items with k counters under any merge tree satisfies
  * `est ≤ true ≤ est + (n − m)/(k+1)` (m = the summary's surviving
  * count mass), hence every item with true count > (n − m)/(k+1) is
  * PRESENT. Merging sums counters then subtracts the (k+1)-largest
  * value — the Agarwal et al. (PODS '12) mergeable-summaries result,
  * which keeps the bound additive across any merge topology.
  *
  * Wire format (version, k, n, m implicit via entries, (len,bytes,count)*):
  * engine-owned and stable — these bytes live in commit-log state tables.
  */
object FrequencyExprs {

  private val FormatVersion: Byte = 1

  /** MG summary state: capped counter map + total items observed. */
  final class MgSummary(val k: Int) {
    val counters: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty
    var n: Long = 0L

    def insert(item: String): Unit = {
      n += 1
      counters.get(item) match {
        case Some(c) => counters.update(item, c + 1)
        case None if counters.size < k => counters.update(item, 1L)
        case None => // decrement-all, drop zeros (classic MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (i, c) => if (c <= 0) dead += i }
          dead.foreach(counters.remove)
      }
    }

    /** Mergeable-summaries combine: sum counters, then reduce to k by
      * subtracting the (k+1)-largest count from every counter. */
    def mergeIn(other: MgSummary): MgSummary = {
      require(other.k == k || counters.isEmpty || other.counters.isEmpty,
        s"cannot merge MG summaries of different k ($k vs ${other.k})")
      n += other.n
      other.counters.foreach { case (i, c) =>
        counters.update(i, counters.getOrElse(i, 0L) + c)
      }
      if (counters.size > k) {
        val cut = counters.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.mapValuesInPlace((_, c) => c - cut)
        counters.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(counters.remove)
      }
      this
    }
  }

  def serialize(s: MgSummary): Array[Byte] = {
    val items = s.counters.toSeq
    val byteItems = items.map { case (i, c) => (i.getBytes(StandardCharsets.UTF_8), c) }
    val size = 1 + 4 + 8 + 4 + byteItems.map(e => 4 + e._1.length + 8).sum
    val buf = ByteBuffer.allocate(size)
    buf.put(FormatVersion)
    buf.putInt(s.k)
    buf.putLong(s.n)
    buf.putInt(byteItems.size)
    byteItems.foreach { case (b, c) =>
      buf.putInt(b.length); buf.put(b); buf.putLong(c)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): MgSummary = {
    val buf = ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == FormatVersion, s"unknown mg sketch format version $ver")
    val s = new MgSummary(buf.getInt)
    s.n = buf.getLong
    val cnt = buf.getInt
    (0 until cnt).foreach { _ =>
      val len = buf.getInt
      val b = new Array[Byte](len); buf.get(b)
      s.counters.update(new String(b, StandardCharsets.UTF_8), buf.getLong)
    }
    s
  }
}

/** Aggregate strings into a serialized MG summary (nulls skipped). */
case class MgSketchAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FrequencyExprs.MgSummary] {

  require(k > 0, s"k must be positive, got $k")
  require(child.dataType == StringType,
    s"graft_mg_agg expects a string item, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): FrequencyExprs.MgSummary =
    new FrequencyExprs.MgSummary(k)

  override def update(buffer: FrequencyExprs.MgSummary,
                      input: InternalRow): FrequencyExprs.MgSummary = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.toString)
    buffer
  }

  override def merge(buffer: FrequencyExprs.MgSummary,
                     other: FrequencyExprs.MgSummary): FrequencyExprs.MgSummary =
    buffer.mergeIn(other)

  override def eval(buffer: FrequencyExprs.MgSummary): Any =
    FrequencyExprs.serialize(buffer)
  override def serialize(buffer: FrequencyExprs.MgSummary): Array[Byte] =
    FrequencyExprs.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): FrequencyExprs.MgSummary =
    FrequencyExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-aggregate serialized MG summaries (the rollup-merge aggregate).
  * The buffer adopts the first sketch's k. */
case class MgMergeAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FrequencyExprs.MgSummary] {

  require(child.dataType == BinaryType,
    s"graft_mg_merge expects a binary sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_merge"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): FrequencyExprs.MgSummary =
    new FrequencyExprs.MgSummary(0) // empty identity; adopts k on merge

  override def update(buffer: FrequencyExprs.MgSummary,
                      input: InternalRow): FrequencyExprs.MgSummary = {
    val v = child.eval(input)
    if (v == null) buffer
    else merge(buffer, FrequencyExprs.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: FrequencyExprs.MgSummary,
                     other: FrequencyExprs.MgSummary): FrequencyExprs.MgSummary =
    if (buffer.k == 0 && buffer.counters.isEmpty && buffer.n == 0) other
    else if (other.k == 0 && other.counters.isEmpty && other.n == 0) buffer
    else buffer.mergeIn(other)

  override def eval(buffer: FrequencyExprs.MgSummary): Any =
    FrequencyExprs.serialize(buffer)
  override def serialize(buffer: FrequencyExprs.MgSummary): Array[Byte] =
    FrequencyExprs.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): FrequencyExprs.MgSummary =
    FrequencyExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Candidate readout: `graft_mg_topk(sketch) →
  * array<struct<item: string, est: long, n: long, bound: long>>`,
  * count-descending then item-ascending (deterministic order). `est` is
  * the surviving counter (an UNDERcount), `bound` the deterministic
  * worst-case undercount `(n − m) / (k+1)` carried so consumers can
  * reason about `est ≤ true ≤ est + bound` without re-deriving it. */
case class MgTopK(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  require(child.dataType == BinaryType,
    s"graft_mg_topk expects a binary sketch, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("bound", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mg_topk"

  override def nullSafeEval(sketch: Any): Any = {
    val s = FrequencyExprs.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (s.n == 0) return null
    val m = s.counters.values.sum
    val bound = (s.n - m) / (s.k + 1)
    val rows = s.counters.toSeq.sortBy { case (i, c) => (-c, i) }.map {
      case (i, c) => InternalRow(UTF8String.fromString(i), c, s.n, bound)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrequencyRegistry {
  /** Register the MG heavy-hitter functions on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_agg",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_mg_agg k must be an int literal, got $other")
        }
        MgSketchAgg(exprs(0), k)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_merge", exprs => MgMergeAgg(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_topk", exprs => MgTopK(exprs(0)), "built-in")
  }

  /** Column forms; require [[install]] on the executing session. */
  def mgAgg(item: Column, k: Int): Column =
    call_function("graft_mg_agg", item, org.apache.spark.sql.functions.lit(k))
  def mgMerge(sketch: Column): Column = call_function("graft_mg_merge", sketch)
  def mgTopK(sketch: Column): Column = call_function("graft_mg_topk", sketch)
}
