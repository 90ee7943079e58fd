package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd w-token shingling: array<string> tokens → array<string> of
  * space-joined w-grams. Replaces the interpreted
  * `transform(sequence(0, size(t)-w), i -> concat_ws(' ', slice(t, i+1, w)))`
  * chain, whose `slice` allocates a copy per shingle position — the
  * same HOF tax PairPack removed from the CF pipelines, here on the
  * ~1.4M-shingle dedup corpus scan. Output text is byte-identical to
  * the HOF/DuckDB formulations, so every oracle is unchanged.
  *
  * Emits an empty array when size(t) < w (callers filter those rows
  * the same way the previous `where(size(t) >= w)` guard did).
  */
case class Shingles(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements() - w + 1
    if (n <= 0) new GenericArrayData(new Array[Any](0))
    else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val parts = new Array[UTF8String](w)
        var j = 0
        while (j < w) { parts(j) = xs.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val args = (0 until w).map(j => s"$x.getUTF8String($i + $j)").mkString(", ")
      s"""
         |final int $n = $x.numElements() - ${w - 1};
         |final Object[] $out = new Object[java.lang.Math.max($n, 0)];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($spaceRef, $args);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object Shingles {
  def shingles(c: Column, w: Int): Column =
    GraftSqlBridge.column(Shingles(GraftSqlBridge.expression(c), w))
}
