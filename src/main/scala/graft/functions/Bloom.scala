package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bloom filter over long keys as a bit-OR aggregate. Unlike the
  * Misra–Gries summary the result is fully deterministic — the bitset
  * is an OR over per-key bit patterns, independent of row order and
  * merge shape — so a query may branch on membership and still be
  * engine-reproducible, provided false positives are resolved by an
  * exact check (see `Dedup.bloomDedup`).
  *
  * k bit positions per key via Kirsch–Mitzenmacher double hashing on a
  * splitmix64-finalized key. numBits must be a power of two.
  */
object BloomBits {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBits(bits: Array[Long], numBits: Int, numHashes: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5deece66dL) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (((h1 + i * h2) % numBits) + numBits) % numBits
      bits(pos.toInt >>> 6) |= 1L << (pos.toInt & 63)
      i += 1
    }
  }

  def mightContain(bits: ArrayData, numHashes: Int, key: Long): Boolean = {
    val numBits = bits.numElements() << 6
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5deece66dL) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (((h1 + i * h2) % numBits) + numBits) % numBits
      if ((bits.getLong(pos.toInt >>> 6) & (1L << (pos.toInt & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(key)` → array<long> bitset (numBits/64 words). */
case class BloomAgg(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && (numBits & (numBits - 1)) == 0, "numBits must be a power of two")
  require(numHashes > 0, "numHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.setBits(b, numBits, numHashes, v.asInstanceOf[Long])
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    var i = 0
    while (i < b.length) { out.writeLong(b(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(bits, key)` — membership probe, codegen'd. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (array<bigint>, bigint), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = BooleanType

  override def nullSafeEval(bits: Any, key: Any): Any =
    BloomBits.mightContain(bits.asInstanceOf[ArrayData], numHashes, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomBits.mightContain($b, $numHashes, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}

object Bloom {
  def bloomAgg(numBits: Int, numHashes: Int, key: Column): Column =
    GraftSqlBridge.column(
      BloomAgg(GraftSqlBridge.expression(key), numBits, numHashes).toAggregateExpression())
  def mightContain(bits: Column, key: Column, numHashes: Int): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(bits), GraftSqlBridge.expression(key), numHashes))
}
