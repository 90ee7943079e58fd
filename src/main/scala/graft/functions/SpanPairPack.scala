package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd SPAN-pair expansion for the exact sequential-pattern tier:
  * given three aligned arrays — per-item first-step `smin`
  * (non-decreasing), item ids, and per-item last-step `smax` — emits
  * `item(i)·2³² + item(j)` for every ORDERED position pair i ≠ j with
  * `smin(i) < smax(j)`, i.e. every "item_i in some basket strictly
  * before a basket containing item_j" pattern witness.
  *
  * Replaces the double `explode` self-product in seqPatternsExact,
  * which materialized n² wide struct-pair ROWS per user before the
  * filter and aggregated on a two-long key. Here one tight loop per
  * user writes only the QUALIFYING pairs as packed primitive longs
  * (the swing/CF aggregate key shape): because `smin` is sorted
  * ascending, the i's qualifying against a given j are exactly the
  * prefix with smin < smax(j), found by one monotone scan per j.
  *
  * Bounds contract: lists capped upstream ([[graft.operators.MlRecsys.SeqExactCap]]);
  * [[MaxElems]] backstop keeps the worst-case n(n−1) output array
  * allocatable; ids validated in [0, 2³²) like [[PairPack]].
  */
case class SpanPairPack(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"span_pair_pack expects 3 array<bigint> columns, got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(sv: Any, iv: Any, xv: Any): Any = {
    val smin = sv.asInstanceOf[ArrayData]
    val ids = iv.asInstanceOf[ArrayData]
    val smax = xv.asInstanceOf[ArrayData]
    val n = smin.numElements()
    if (n != ids.numElements() || n != smax.numElements())
      throw new IllegalArgumentException(
        s"span_pair_pack: aligned arrays differ in length ($n, ${ids.numElements()}, ${smax.numElements()})")
    if (n > SpanPairPack.MaxElems) throw new IllegalArgumentException(
      s"span_pair_pack: group of $n elements exceeds ${SpanPairPack.MaxElems} " +
        "(n*(n-1) ordered pairs would not be allocatable); cap the per-key list upstream")
    // pass 1: qualifying-prefix length per j (smin sorted ⇒ one scan
    // each) + id/sort validation; pass 2: exact-size fill
    val hi = new Array[Int](n)
    var total = 0L
    var j = 0
    while (j < n) {
      val e = ids.getLong(j)
      if ((e & ~(PairPack.Base - 1L)) != 0L) throw new IllegalArgumentException(
        s"span_pair_pack: element $e outside [0, 2^32) — packing would be lossy")
      if (j > 0 && smin.getLong(j) < smin.getLong(j - 1))
        throw new IllegalArgumentException(
          "span_pair_pack: smin keys must be non-decreasing; sort_array the zipped spans upstream")
      val x = smax.getLong(j)
      var h = 0
      while (h < n && smin.getLong(h) < x) h += 1
      hi(j) = h
      total += h - (if (j < h) 1 else 0) // i ranges over the prefix, minus i=j
      j += 1
    }
    val out = new Array[Long](total.toInt)
    var p = 0
    j = 0
    while (j < n) {
      val b = ids.getLong(j)
      var i = 0
      val h = hi(j)
      while (i < h) {
        if (i != j) { out(p) = ids.getLong(i) * PairPack.Base + b; p += 1 }
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, iv, xv) => {
      val n = ctx.freshName("n")
      val hi = ctx.freshName("hi")
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val b = ctx.freshName("b")
      s"""
         |final int $n = $sv.numElements();
         |if ($n != $iv.numElements() || $n != $xv.numElements())
         |  throw new IllegalArgumentException("span_pair_pack: aligned arrays differ in length");
         |if ($n > ${SpanPairPack.MaxElems}) throw new IllegalArgumentException(
         |  "span_pair_pack: group of " + $n + " elements exceeds ${SpanPairPack.MaxElems}; cap the per-key list upstream");
         |final int[] $hi = new int[$n];
         |long $total = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $b = $iv.getLong($j);
         |  if (($b & ~${PairPack.Base - 1L}L) != 0L) throw new IllegalArgumentException(
         |    "span_pair_pack: element " + $b + " outside [0, 2^32) — packing would be lossy");
         |  if ($j > 0 && $sv.getLong($j) < $sv.getLong($j - 1)) throw new IllegalArgumentException(
         |    "span_pair_pack: smin keys must be non-decreasing; sort_array the zipped spans upstream");
         |  final long $x = $xv.getLong($j);
         |  int $h = 0;
         |  while ($h < $n && $sv.getLong($h) < $x) $h++;
         |  $hi[$j] = $h;
         |  $total += $h - (($j < $h) ? 1 : 0);
         |}
         |final long[] $out = new long[(int) $total];
         |int $p = 0;
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $b = $iv.getLong($j);
         |  final int $h = $hi[$j];
         |  for (int $i = 0; $i < $h; $i++) {
         |    if ($i != $j) $out[$p++] = $iv.getLong($i) * ${PairPack.Base}L + $b;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "span_pair_pack"
}

object SpanPairPack {
  /** Max per-key list size: n(n−1) ORDERED pairs must stay inside an
    * Int-sized allocation (tighter than PairPack's half-space bound).
    * Callers cap lists upstream (SeqExactCap = 200). */
  val MaxElems = 46340

  def spanPairPack(smin: Column, ids: Column, smax: Column): Column =
    GraftSqlBridge.column(SpanPairPack(
      GraftSqlBridge.expression(smin),
      GraftSqlBridge.expression(ids),
      GraftSqlBridge.expression(smax)))
}
