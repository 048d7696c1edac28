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

/** Bottom-k (KMV) sketches as binary columns: `graft_bk_agg(item, k)`
  * keeps the k distinct items with the SMALLEST md5 hashes,
  * `graft_bk_merge(sketch)` re-aggregates stored sketches,
  * `graft_bk_items(sketch)` reads the surviving items out hash-ascending.
  *
  * The fourth mergeable summary next to HLL/GK/MG — and the only one
  * whose CONTENT is exactly reproducible across engines: "the k distinct
  * items with the smallest md5 values" is a pure function of the item
  * SET, independent of arrival order, partitioning, and merge topology
  * (min-k is associative, commutative, idempotent), and md5 exists
  * everywhere — so a correctness gate hash-matches the full sample
  * against a standard-SQL recompute instead of pinning a tolerance
  * boolean. Semantically it is a uniform-without-replacement sample of
  * the distinct items (Bar-Yossef et al.'s KMV / bottom-k mins): the
  * incremental "show me example members per group" that a plain
  * reservoir cannot give deterministically, plus the KMV distinct
  * estimate (k−1)/h_k for free.
  *
  * Hash = first 8 bytes of md5(item) as an unsigned big-endian long
  * (compared unsigned; DuckDB replays it as
  * `('0x' || substr(md5(item), 1, 16))::UBIGINT`). Ties (hash collisions)
  * break on the item string, so even a collision cannot make the sample
  * engine-dependent. Wire format: version, k, n (items observed),
  * (hash, len, bytes)* hash-ascending.
  */
object BottomKExprs {

  private val FormatVersion: Byte = 1

  /** Unsigned-compare ordering for the 8-byte md5 prefix. Ties break on
    * UTF-8 BYTE order (unsigned), not Java's UTF-16 code-unit order —
    * the two differ for supplementary-plane characters, and the
    * cross-engine contract ("same sample in any engine") replays the
    * tie-break as binary/codepoint collation (DuckDB string order). */
  private val hashOrd: Ordering[(Long, String)] = new Ordering[(Long, String)] {
    def compare(a: (Long, String), b: (Long, String)): Int = {
      val c = java.lang.Long.compareUnsigned(a._1, b._1)
      if (c != 0) c
      else java.util.Arrays.compareUnsigned(
        a._2.getBytes(StandardCharsets.UTF_8),
        b._2.getBytes(StandardCharsets.UTF_8))
    }
  }

  def hashOf(item: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes(StandardCharsets.UTF_8))
    ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Bottom-k state: the k smallest (hash, item) pairs over DISTINCT
    * items, plus the total item count observed. */
  final class BkSummary(val k: Int) {
    // TreeSet on (hash, item): last() is the current k-th smallest
    val mins: mutable.TreeSet[(Long, String)] = mutable.TreeSet.empty(hashOrd)
    var n: Long = 0L

    def insert(item: String): Unit = {
      n += 1
      val e = (hashOf(item), item)
      if (mins.size < k) { mins += e; () }
      else if (hashOrd.compare(e, mins.last) < 0) {
        mins += e
        if (mins.size > k) { mins -= mins.last; () }
      }
    }

    def mergeIn(other: BkSummary): BkSummary = {
      require(other.k == k || mins.isEmpty || other.mins.isEmpty,
        s"cannot merge bottom-k summaries of different k ($k vs ${other.k})")
      n += other.n
      other.mins.foreach(mins += _)
      val cap = if (k > 0) k else other.k // k=0 only for the merge identity
      if (cap > 0) while (mins.size > cap) mins -= mins.last
      this
    }
  }

  def serialize(s: BkSummary): Array[Byte] = {
    val items = s.mins.toSeq
    val byteItems = items.map { case (h, i) =>
      (h, i.getBytes(StandardCharsets.UTF_8))
    }
    val buf = ByteBuffer.allocate(
      1 + 4 + 8 + 4 + byteItems.map(e => 8 + 4 + e._2.length).sum)
    buf.put(FormatVersion)
    buf.putInt(s.k)
    buf.putLong(s.n)
    buf.putInt(byteItems.size)
    byteItems.foreach { case (h, b) =>
      buf.putLong(h); buf.putInt(b.length); buf.put(b)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): BkSummary = {
    val buf = ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == FormatVersion, s"unknown bottom-k format version $ver")
    val s = new BkSummary(buf.getInt)
    s.n = buf.getLong
    val cnt = buf.getInt
    (0 until cnt).foreach { _ =>
      val h = buf.getLong
      val len = buf.getInt
      val b = new Array[Byte](len); buf.get(b)
      s.mins += ((h, new String(b, StandardCharsets.UTF_8)))
    }
    s
  }
}

/** Aggregate strings into a serialized bottom-k summary (nulls skipped). */
case class BottomKAgg(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKExprs.BkSummary] {

  require(k > 0, s"k must be positive, got $k")
  require(child.dataType == StringType,
    s"graft_bk_agg expects a string item, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bk_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): BottomKExprs.BkSummary =
    new BottomKExprs.BkSummary(k)

  override def update(buffer: BottomKExprs.BkSummary,
                      input: InternalRow): BottomKExprs.BkSummary = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.toString)
    buffer
  }

  override def merge(buffer: BottomKExprs.BkSummary,
                     other: BottomKExprs.BkSummary): BottomKExprs.BkSummary =
    buffer.mergeIn(other)

  override def eval(buffer: BottomKExprs.BkSummary): Any =
    BottomKExprs.serialize(buffer)
  override def serialize(buffer: BottomKExprs.BkSummary): Array[Byte] =
    BottomKExprs.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): BottomKExprs.BkSummary =
    BottomKExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-aggregate serialized bottom-k summaries (adopts the first sketch's
  * k; min-k union is associative/commutative/idempotent, so any merge
  * tree yields the identical sample). */
case class BottomKMergeAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKExprs.BkSummary] {

  require(child.dataType == BinaryType,
    s"graft_bk_merge expects a binary sketch, got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bk_merge"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): BottomKExprs.BkSummary =
    new BottomKExprs.BkSummary(0)

  override def update(buffer: BottomKExprs.BkSummary,
                      input: InternalRow): BottomKExprs.BkSummary = {
    val v = child.eval(input)
    if (v == null) buffer
    else merge(buffer, BottomKExprs.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: BottomKExprs.BkSummary,
                     other: BottomKExprs.BkSummary): BottomKExprs.BkSummary =
    if (buffer.k == 0 && buffer.mins.isEmpty && buffer.n == 0) other
    else if (other.k == 0 && other.mins.isEmpty && other.n == 0) buffer
    else buffer.mergeIn(other)

  override def eval(buffer: BottomKExprs.BkSummary): Any =
    BottomKExprs.serialize(buffer)
  override def serialize(buffer: BottomKExprs.BkSummary): Array[Byte] =
    BottomKExprs.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): BottomKExprs.BkSummary =
    BottomKExprs.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Sample readout: `graft_bk_items(sketch) → array<string>`,
  * hash-ascending — the deterministic k-sample of the distinct items. */
case class BottomKItems(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  require(child.dataType == BinaryType,
    s"graft_bk_items expects a binary sketch, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bk_items"

  override def nullSafeEval(sketch: Any): Any = {
    val s = BottomKExprs.deserialize(sketch.asInstanceOf[Array[Byte]])
    new GenericArrayData(
      s.mins.toSeq.map(e => UTF8String.fromString(e._2)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BottomKRegistry {
  /** Register the bottom-k functions on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bk_agg",
      exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_bk_agg k must be an int literal, got $other")
        }
        BottomKAgg(exprs(0), k)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bk_merge", exprs => BottomKMergeAgg(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bk_items", exprs => BottomKItems(exprs(0)), "built-in")
  }

  /** Column forms; require [[install]] on the executing session. */
  def bkAgg(item: Column, k: Int): Column =
    call_function("graft_bk_agg", item, org.apache.spark.sql.functions.lit(k))
  def bkMerge(sketch: Column): Column = call_function("graft_bk_merge", sketch)
  def bkItems(sketch: Column): Column = call_function("graft_bk_items", sketch)
}
