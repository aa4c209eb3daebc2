package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path (SURVEY.md §7.4:
  * custom `Expression` only where built-ins genuinely fall short).
  *
  * The higher-order `aggregate(zip_with(...))` formulation of a dot product
  * is interpreted per element (lambda dispatch, boxing) and blocks
  * whole-stage codegen; at ANN scale the dot product runs corpus × queries
  * times, so it deserves a tight generated loop over the packed float
  * arrays. Semantics match the HOF version: left-to-right double-precision
  * accumulation; mismatched vector lengths yield NULL — exactly what
  * `aggregate(zip_with(...))` does (zip_with null-pads the shorter array and
  * the null poisons the sum), so malformed data surfaces identically in both
  * implementations instead of being silently truncated.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; enforced by callers (VectorFunctions),
  // ExpectsInputTypes is private[sql] in Spark 4
  override def dataType: DataType = DoubleType

  // null when either input is null OR lengths mismatch
  override def nullable: Boolean = true

  override def prettyName: String = "float_vector_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

object VectorExpressions {
  /** Codegen'd dot product over two `array<float>` columns. */
  def floatDot(a: Column, b: Column): Column =
    graftbridge.toColumn(FloatVectorDot(
      graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
