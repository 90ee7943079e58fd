package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd pair expansion: all ordered (a < b positionally)
  * combinations of a sorted long array, each packed as a·2³² + b —
  * the generator feeding every CF pair aggregate.
  *
  * Replaces the higher-order-function formulation
  * `flatten(transform(es, (x,i) -> transform(slice(es, i+2, size(es)), y -> ...)))`
  * which Catalyst cannot codegen (HOFs are interpreted) and which
  * allocates an O(n) `slice` COPY per element — O(n²) garbage per key.
  * Here `doGenCode` emits one tight double loop into a primitive
  * long[] wrapped zero-copy by UnsafeArrayData.
  *
  * Inputs are per-key element arrays bounded upstream (MaxHistory /
  * SwingUserCap caps in Recsys), so n(n−1)/2 stays small; elements must
  * be non-null, non-negative and < 2³² for the packing to be lossless
  * (ids in the fixtures are ~2¹⁵).
  */
case class PairPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_pack expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n > PairPack.MaxElems) throw new IllegalArgumentException(
      s"pair_pack: group of $n elements exceeds ${PairPack.MaxElems} " +
        "(n*(n-1)/2 pairs would overflow); cap the per-key list upstream")
    val out = new Array[Long](((n.toLong * (n - 1)) / 2).toInt)
    var p = 0
    var i = 0
    while (i < n) {
      val e = xs.getLong(i)
      if ((e & ~(PairPack.Base - 1L)) != 0L) throw new IllegalArgumentException(
        s"pair_pack: element $e outside [0, 2^32) — packing would be lossy")
      val a = e * PairPack.Base
      var j = i + 1
      while (j < n) { out(p) = a + xs.getLong(j); p += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      s"""
         |final int $n = $x.numElements();
         |if ($n > ${PairPack.MaxElems}) throw new IllegalArgumentException(
         |  "pair_pack: group of " + $n + " elements exceeds ${PairPack.MaxElems}; cap the per-key list upstream");
         |final long[] $out = new long[(int) (((long) $n * ($n - 1)) / 2)];
         |int $p = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $a = $x.getLong($i);
         |  if (($a & ~${PairPack.Base - 1L}L) != 0L) throw new IllegalArgumentException(
         |    "pair_pack: element " + $a + " outside [0, 2^32) — packing would be lossy");
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $out[$p++] = $a * ${PairPack.Base}L + $x.getLong($j);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pair_pack"
}

object PairPack {
  /** Packing base (2³²): ids must be below this. */
  val Base = 4294967296L

  /** Max per-key list size: n(n−1)/2 stays well inside Int and a
    * single group's pair array stays allocatable. Callers cap lists
    * upstream (MaxHistory / SwingUserCap / HotShingleDf); this is the
    * fail-fast backstop the round-2 advisor asked for.
    */
  val MaxElems = 65535

  def pairPack(c: Column): Column =
    GraftSqlBridge.column(PairPack(GraftSqlBridge.expression(c)))

  /** Validated SCALAR pair pack (a·2³² + b): PairPack over a 2-element
    * array, so scalar call sites (SimRank's contribution key) share the
    * exact packing formula AND its [0, 2^32) range check with the
    * generator sites instead of re-deriving the arithmetic unguarded
    * (r13 advice #2 — an out-of-range id now fails fast rather than
    * silently mismatching the validated store side of a pk join). */
  def packPair(a: Column, b: Column): Column =
    pairPack(org.apache.spark.sql.functions.array(a, b)).getItem(0)
}
