package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `graft_vec_sum(array<double>) → array<double>` — element-wise vector
  * sum as a mergeable aggregate.
  *
  * This is the moment-aggregation primitive for distributed linear
  * algebra: covariance/Gram matrices ([[graft.operators.Projection]]),
  * centroid sums, feature-mean vectors. The buffer is ONE double array of
  * the vector width; partials combine map-side, so a d²-entry Gram sum
  * costs O(d²) doubles per partition over the wire — independent of row
  * count, exactly the shape a 1000-executor covariance pass needs.
  *
  * Why not `transform` + d separate `sum(element_at(v, i))` columns: that
  * plan is linear in d at ANALYSIS time (d² named expressions for a Gram
  * matrix blows past codegen limits around d ≈ 60); one array-valued
  * aggregate keeps the plan constant-size for any d.
  *
  * Null semantics: null rows are skipped (SQL aggregate convention);
  * an all-null/empty group evaluates to null. Rows must agree on vector
  * width — a mismatch is a data error and fails loudly rather than
  * silently truncating.
  */
object VecAggExprs {

  def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getDouble)
  }

  /** Register on a session (idempotent). */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum", exprs => VecSumAgg(exprs.head), "built-in")

  /** Column form; requires [[install]] on the executing session. */
  def vecSum(v: Column): Column = call_function("graft_vec_sum", v)
}

case class VecSumAgg(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }, s"graft_vec_sum expects array<double>, got ${child.dataType}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"
  override def children: Seq[Expression] = Seq(child)

  // length-0 marker = "no input yet" (a real 0-width vector sum is
  // indistinguishable and equally null-worthy)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buffer: Array[Double], v: Array[Double]): Array[Double] =
    if (v.isEmpty) buffer // empty marker (or 0-width vector) merges as identity
    else if (buffer.isEmpty) v
    else {
      require(buffer.length == v.length,
        s"graft_vec_sum: vector width mismatch (${buffer.length} vs ${v.length})")
      var i = 0
      while (i < v.length) { buffer(i) += v(i); i += 1 }
      buffer
    }

  // only scan for element nulls when the child's type admits them —
  // toDoubleArray would otherwise turn a null element into a silent 0.0
  // (UnsafeArrayData) or a bare NPE (GenericArrayData)
  private val elementsNullable = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (elementsNullable) {
        var i = 0
        while (i < arr.numElements()) {
          require(!arr.isNullAt(i),
            s"graft_vec_sum: null element at index $i (null vector rows are " +
              "skipped, but a null ELEMENT inside a vector is a data error)")
          i += 1
        }
      }
      add(buffer, arr.toDoubleArray())
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    add(buffer, other)

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] =
    VecAggExprs.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Double] =
    VecAggExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
