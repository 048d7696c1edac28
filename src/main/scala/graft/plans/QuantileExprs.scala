package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Mergeable, DETERMINISTIC-error quantile sketches as first-class binary
  * columns: `graft_gk_agg(value, eps)` folds doubles into a
  * Greenwald–Khanna summary (Spark's own `QuantileSummaries`, the engine
  * behind `approxQuantile`), `graft_gk_merge(sketch)` re-aggregates
  * stored sketches, `graft_gk_quantiles(sketch, array(p...))` reads
  * quantiles out.
  *
  * Why GK and not a sampling sketch (t-digest, KLL, REQ): the GK bound is
  * WORST-CASE deterministic — a queried quantile's true rank is within
  * ε·n of target, always, for any data order and any merge tree — so a
  * correctness gate can pin the contract as a hard boolean instead of a
  * "with high probability" tolerance that flakes. Size is O((1/ε)·log(εn))
  * tuples; at the default ε=0.01 a sketch is ~few KB regardless of n.
  *
  * Why binary columns at all: the exact quantile of a growing fact store
  * is not incrementally maintainable (it needs a global sort or a full
  * re-scan per refresh). Sketch columns make quantile state MERGEABLE:
  * the rollup table keeps one sketch per group, a new batch folds in at
  * O(batch), and any coarser grain is `graft_gk_merge` over state rows —
  * the same algebra the HLL rollup uses for distinct counts
  * ([[graft.operators.Sketches]]).
  *
  * Wire format (version byte + eps + compressThreshold + count +
  * (value, g, delta)*): engine-owned, stable across JVMs — these bytes
  * live in commit-log tables, so the format is part of the table
  * contract, not an implementation detail.
  */
object QuantileExprs {

  private val FormatVersion: Byte = 1

  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val s = qs.sampled
    val buf = ByteBuffer.allocate(1 + 8 + 4 + 8 + 4 + s.length * 24)
    buf.put(FormatVersion)
    buf.putDouble(qs.relativeError)
    buf.putInt(qs.compressThreshold)
    buf.putLong(qs.count)
    buf.putInt(s.length)
    s.foreach { st => buf.putDouble(st.value); buf.putLong(st.g); buf.putLong(st.delta) }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val buf = ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == FormatVersion, s"unknown gk sketch format version $ver")
    val eps = buf.getDouble
    val ct = buf.getInt
    val count = buf.getLong
    val n = buf.getInt
    val sampled = Array.fill(n) {
      QuantileSummaries.Stats(buf.getDouble, buf.getLong, buf.getLong)
    }
    new QuantileSummaries(ct, eps, sampled, count, true)
  }

}

/** Aggregate doubles into a serialized GK summary. Nulls are skipped
  * (SQL aggregate convention); an all-null/empty group still emits a
  * valid empty sketch (count 0) so rollup algebra never branches on
  * null state. */
case class GkSketchAgg(child: Expression, relativeError: Double,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] {

  require(relativeError > 0 && relativeError < 1,
    s"relativeError must be in (0, 1), got $relativeError")
  require(child.dataType == DoubleType,
    s"graft_gk_agg expects a double value, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gk_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer else buffer.insert(v.asInstanceOf[Double])
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries = {
    val l = if (buffer.compressed) buffer else buffer.compress()
    val r = if (other.compressed) other else other.compress()
    if (r.count == 0) l else if (l.count == 0) r else l.merge(r)
  }

  override def eval(buffer: QuantileSummaries): Any =
    QuantileExprs.serialize(if (buffer.compressed) buffer else buffer.compress())

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileExprs.serialize(if (buffer.compressed) buffer else buffer.compress())
  override def deserialize(storageFormat: Array[Byte]): QuantileSummaries =
    QuantileExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-aggregate serialized GK sketches (the rollup-merge aggregate). */
case class GkMergeAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] {

  require(child.dataType == BinaryType,
    s"graft_gk_merge expects a binary sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gk_merge"
  override def children: Seq[Expression] = Seq(child)

  // empty marker: count == 0 summaries merge as identity
  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else merge(buffer, QuantileExprs.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries = {
    val l = if (buffer.compressed) buffer else buffer.compress()
    val r = if (other.compressed) other else other.compress()
    if (r.count == 0) l else if (l.count == 0) r else l.merge(r)
  }

  override def eval(buffer: QuantileSummaries): Any =
    QuantileExprs.serialize(if (buffer.compressed) buffer else buffer.compress())
  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileExprs.serialize(if (buffer.compressed) buffer else buffer.compress())
  override def deserialize(storageFormat: Array[Byte]): QuantileSummaries =
    QuantileExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Quantile readout: `graft_gk_quantiles(sketch, array(p...)) →
  * array<double>` (null for an empty sketch — there is no quantile of
  * nothing). Eval-only: runs once per STATE row, never on the fact
  * stream, so codegen residency buys nothing. */
case class GkQuantiles(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  require(left.dataType == BinaryType &&
    (right.dataType match { case ArrayType(DoubleType, _) => true; case _ => false }),
    s"graft_gk_quantiles expects (binary, array<double>), got " +
      s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gk_quantiles"

  override def nullSafeEval(sketch: Any, pcts: Any): Any = {
    val qs = QuantileExprs.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (qs.count == 0) return null
    val ps = pcts.asInstanceOf[ArrayData].toDoubleArray()
    require(ps.forall(p => p >= 0 && p <= 1), "percentiles must be in [0, 1]")
    val c = if (qs.compressed) qs else qs.compress()
    new GenericArrayData(ps.map(p => c.query(p).get))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantileRegistry {
  /** Register the GK quantile functions on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gk_agg",
      exprs => {
        val eps = exprs(1) match {
          case Literal(v: Double, DoubleType) => v
          case Literal(v: java.math.BigDecimal, _: DecimalType) => v.doubleValue()
          case other => throw new IllegalArgumentException(
            s"graft_gk_agg eps must be a double literal, got $other")
        }
        GkSketchAgg(exprs(0), eps)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gk_merge", exprs => GkMergeAgg(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gk_quantiles", exprs => GkQuantiles(exprs(0), exprs(1)), "built-in")
  }

  /** Column forms; require [[install]] on the executing session. */
  def gkAgg(value: Column, eps: Double): Column =
    call_function("graft_gk_agg", value,
      org.apache.spark.sql.functions.lit(eps))
  def gkMerge(sketch: Column): Column = call_function("graft_gk_merge", sketch)
  def gkQuantiles(sketch: Column, ps: Seq[Double]): Column =
    call_function("graft_gk_quantiles", sketch,
      org.apache.spark.sql.functions.array(
        ps.map(p => org.apache.spark.sql.functions.lit(p)): _*))
}
