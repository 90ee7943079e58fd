package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd STRICTLY-LATER pair expansion: given two aligned arrays
  * (keys non-decreasing — e.g. first-purchase timestamps — and ids),
  * emits ids(i)·2³² + ids(j) for every i < j with keys(j) > keys(i).
  * Equal-key elements are incomparable and yield no pair, so the
  * result is independent of how ties would sort — exactly the
  * sequential "bought A strictly before B" semantics.
  *
  * Replaces the nested `transform/filter/flatten` HOF formulation in
  * seq_buy_pairs, which Catalyst interprets (no codegen) and which
  * allocated up to n(n−1)/2 null-padded struct pairs per user BEFORE
  * filtering. Here one tight double loop writes packed longs into a
  * primitive array; because keys are sorted, the inner loop starts at
  * a monotone pointer (first index with a strictly larger key), so
  * tie-heavy groups skip their incomparable prefix instead of
  * testing it.
  *
  * Same bounds contract as [[PairPack]]: lists capped upstream
  * (SeqCap), MaxElems backstop, ids in [0, 2³²).
  */
case class PairPackAfter(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pair_pack_after expects (array<bigint>, array<bigint>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(kv: Any, iv: Any): Any = {
    val ks = kv.asInstanceOf[ArrayData]
    val ids = iv.asInstanceOf[ArrayData]
    val n = ks.numElements()
    if (n != ids.numElements()) throw new IllegalArgumentException(
      s"pair_pack_after: key/id arrays differ in length ($n vs ${ids.numElements()})")
    if (n > PairPack.MaxElems) throw new IllegalArgumentException(
      s"pair_pack_after: group of $n elements exceeds ${PairPack.MaxElems}; cap the per-key list upstream")
    val out = new Array[Long](((n.toLong * (n - 1)) / 2).toInt)
    var p = 0
    var lo = 0
    var i = 0
    while (i < n) {
      val e = ids.getLong(i)
      if ((e & ~(PairPack.Base - 1L)) != 0L) throw new IllegalArgumentException(
        s"pair_pack_after: element $e outside [0, 2^32) — packing would be lossy")
      val a = e * PairPack.Base
      val k = ks.getLong(i)
      // The monotone `lo` pointer is only correct on sorted keys; the
      // expression is SQL-registered, so arbitrary callers must get an
      // error — not silently wrong pairs — on unsorted input.
      if (i > 0 && k < ks.getLong(i - 1)) throw new IllegalArgumentException(
        s"pair_pack_after: keys must be non-decreasing (key at index $i is smaller than its predecessor); sort_array the zipped pairs upstream")
      if (lo <= i) lo = i + 1
      while (lo < n && ks.getLong(lo) <= k) lo += 1
      var j = lo
      while (j < n) { out(p) = a + ids.getLong(j); p += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, p))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ks, ids) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val lo = ctx.freshName("lo")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val k = ctx.freshName("k")
      s"""
         |final int $n = $ks.numElements();
         |if ($n != $ids.numElements()) throw new IllegalArgumentException(
         |  "pair_pack_after: key/id arrays differ in length");
         |if ($n > ${PairPack.MaxElems}) throw new IllegalArgumentException(
         |  "pair_pack_after: group of " + $n + " elements exceeds ${PairPack.MaxElems}; cap the per-key list upstream");
         |long[] $out = new long[(int) (((long) $n * ($n - 1)) / 2)];
         |int $p = 0;
         |int $lo = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $a = $ids.getLong($i);
         |  if (($a & ~${PairPack.Base - 1L}L) != 0L) throw new IllegalArgumentException(
         |    "pair_pack_after: element " + $a + " outside [0, 2^32) — packing would be lossy");
         |  final long $k = $ks.getLong($i);
         |  if ($i > 0 && $k < $ks.getLong($i - 1)) throw new IllegalArgumentException(
         |    "pair_pack_after: keys must be non-decreasing (key at index " + $i + " is smaller than its predecessor); sort_array the zipped pairs upstream");
         |  if ($lo <= $i) $lo = $i + 1;
         |  while ($lo < $n && $ks.getLong($lo) <= $k) $lo++;
         |  for (int $j = $lo; $j < $n; $j++) {
         |    $out[$p++] = $a * ${PairPack.Base}L + $ids.getLong($j);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  java.util.Arrays.copyOf($out, $p));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pair_pack_after"
}

object PairPackAfter {
  def pairPackAfter(keys: Column, ids: Column): Column =
    GraftSqlBridge.column(PairPackAfter(
      GraftSqlBridge.expression(keys), GraftSqlBridge.expression(ids)))
}
