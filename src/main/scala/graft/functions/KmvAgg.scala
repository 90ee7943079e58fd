package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values buffer: the k smallest DISTINCT longs seen
  * so far, kept as a sorted ascending array. Insertion is a binary
  * search (duplicates rejected — a KMV sketch must hold distinct order
  * statistics, which is what [[TopKBuffer]] deliberately does NOT do)
  * plus an array shift; k is small (64 here), so both are a handful of
  * cache lines. A full buffer rejects most offers with one comparison
  * against the current maximum.
  */
final class KmvBuffer(val k: Int) {
  var size = 0
  val vals = new Array[Long](k)

  def offer(v: Long): Unit = {
    if (size == k && v >= vals(size - 1)) return
    var idx = java.util.Arrays.binarySearch(vals, 0, size, v)
    if (idx >= 0) return // already a retained minimum
    idx = -idx - 1
    val last = if (size < k) size else k - 1
    var i = last
    while (i > idx) { vals(i) = vals(i - 1); i -= 1 }
    vals(idx) = v
    if (size < k) size += 1
  }

  /** Sketch union — merging two KMV summaries of sets A and B yields
    * exactly the KMV summary of A ∪ B (the union's k minima are each
    * within their own set's k minima), which is what makes the partial
    * aggregation phase a lossless sketch merge.
    */
  def mergeFrom(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.size) { offer(o.vals(i)); i += 1 }
  }
}

/** Native KMV (k-minimum-values) distinct sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002) as a
  * `TypedImperativeAggregate`: per group, the k smallest distinct
  * values of a uniform-hash column, emitted ascending as
  * `array<long>`. The distinct estimate is then pure SQL over the
  * array: (k-1)·M / h_(k) when the buffer filled (M = hash domain
  * size), or the buffer size exactly when it did not.
  *
  * WHY this beats the alternatives at 100 TB:
  *  - `countDistinct` shuffles every distinct key; this sketch's
  *    PARTIAL phase caps each (group, partition) at k longs, so the
  *    shuffle carries ≤ k·|groups| values no matter the corpus size,
  *    and merge is exact sketch union (see [[KmvBuffer.mergeFrom]]).
  *  - `approx_count_distinct` (HLL) is cheaper per bit but its
  *    estimate depends on Spark's private register layout — it cannot
  *    back a cross-engine oracle. KMV's state is just order statistics
  *    of an ENGINE-PORTABLE hash (h48(md5), the house idiom), so a
  *    second engine reproduces the sketch bit-for-bit: this is the
  *    oracle-verifiable mergeable distinct sketch.
  *  - Unlike HLL, two groups' sketches also support SET OPERATIONS
  *    (union = merged minima; Jaccard = share of the union's minima
  *    present in both sides), which is what q_kmv_overlap audits.
  *
  * Null inputs are skipped (SQL aggregate convention).
  */
case class KmvMins(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 0, "kmv_mins requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = { b.mergeFrom(o); b }

  override def eval(b: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(b.vals, b.size))

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.size)
    var i = 0
    while (i < b.size) { out.writeLong(b.vals(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bk = in.readInt(); val n = in.readInt()
    val b = new KmvBuffer(bk)
    // incoming values arrive ascending, so each offer appends in O(1)
    var i = 0
    while (i < n) { b.offer(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_mins"
}

object KmvMins {
  /** Column surface: the k smallest distinct values per group,
    * ascending `array<long>`.
    */
  def kmvMins(k: Int, v: Column): Column =
    GraftSqlBridge.column(
      KmvMins(GraftSqlBridge.expression(v), k).toAggregateExpression())
}
