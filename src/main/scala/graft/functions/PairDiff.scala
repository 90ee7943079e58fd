package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd pairwise-difference expansion: for a per-key value array,
  * emits v(i)−v(j) for all i<j in EXACTLY [[PairPack]]'s iteration
  * order — `arrays_zip(pair_pack(ids), pair_diff(vals))` aligns each
  * packed id pair with its value difference. This is the Slope One
  * deviation kernel: summing the aligned differences per item pair
  * gives Σ(r_ui − r_uj), i.e. co-count · dev(i,j), with the same
  * single-generator, no-self-join plan shape as the CF pair aggregate.
  *
  * Same bounds contract as [[PairPack]] (lists capped upstream;
  * MaxElems backstop).
  */
case class PairDiff(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_diff expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n > PairPack.MaxElems) throw new IllegalArgumentException(
      s"pair_diff: group of $n elements exceeds ${PairPack.MaxElems}; cap the per-key list upstream")
    val out = new Array[Double](((n.toLong * (n - 1)) / 2).toInt)
    var p = 0
    var i = 0
    while (i < n) {
      val a = xs.getDouble(i)
      var j = i + 1
      while (j < n) { out(p) = a - xs.getDouble(j); p += 1; j += 1 }
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
         |  "pair_diff: group of " + $n + " elements exceeds ${PairPack.MaxElems}; cap the per-key list upstream");
         |final double[] $out = new double[(int) (((long) $n * ($n - 1)) / 2)];
         |int $p = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $a = $x.getDouble($i);
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $out[$p++] = $a - $x.getDouble($j);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pair_diff"
}

object PairDiff {
  def pairDiff(c: Column): Column =
    GraftSqlBridge.column(PairDiff(GraftSqlBridge.expression(c)))
}
