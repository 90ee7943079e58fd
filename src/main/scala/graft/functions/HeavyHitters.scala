package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary over long keys: at most k
  * counters; any key whose true frequency exceeds N/(k+1) is guaranteed
  * to be present when the summary is evaluated, and merged summaries
  * keep that bound (Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * The counts themselves are lower bounds (off by at most the total
  * decrement), so callers must NOT report them: the supported pattern
  * is sketch → candidate set → exact re-count of the candidates
  * (see `Advanced.heavyHitters`), which makes the final output exact
  * and engine-reproducible even though the sketch internals are
  * order-dependent.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[Long, Long](k * 2)

  def offer(key: Long): Unit = {
    val c = counts.get(key)
    if (c != 0L) counts.put(key, c + 1L)
    else if (counts.size < k) counts.put(key, 1L)
    else {
      // decrement-all: each miss pays one unit against every counter
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Standard MG merge: sum common counters, then if over k entries
    * subtract the (k+1)-th largest count from all and drop non-positive
    * — the error added is exactly that subtracted count, keeping the
    * combined deficit within (N1+N2)/(k+1).
    */
  def mergeFrom(o: MgBuffer): Unit = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = counts.get(e.getKey)
      counts.put(e.getKey, c + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Surviving keys, ascending (order is cosmetic — the candidate set
    * feeds an exact re-count).
    */
  def keysSorted: Array[Long] = {
    val out = new Array[Long](counts.size)
    var i = 0
    val it = counts.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** `misra_gries(k, key)`: array<long> of candidate heavy-hitter keys.
  * Same `TypedImperativeAggregate` surface as [[TopKByScore]] — the
  * partial phase keeps ≤ k counters per partition, the shuffle carries
  * one k-entry summary per partition regardless of input size.
  */
case class MisraGries(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0, "misra_gries requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = { b.mergeFrom(o); b }

  override def eval(b: MgBuffer): Any = new GenericArrayData(b.keysSorted)

  override def serialize(b: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bk = in.readInt(); val n = in.readInt()
    val b = new MgBuffer(bk)
    var i = 0
    while (i < n) { b.counts.put(in.readLong(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  def misraGries(k: Int, key: Column): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(key), k).toAggregateExpression())
}
