package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd 64-bit SimHash over an `array<long>` of per-token hashes:
  * bit i of the result is set iff Σ_tokens (2·bit_i(h) − 1) > 0 — the
  * per-bit majority vote.
  *
  * Bit-identical to the HOF formulation in `TextFunctions.simhash64Hof`
  * (per-bit `aggregate` over `xxhash64(token)`), but one pass: the HOF
  * re-evaluates `xxhash64` on every token FOR EVERY BIT — 64 string hashes
  * per token plus 64 interpreted lambda folds — where this expression
  * consumes each token hash once and updates 64 counters with shifts
  * (SURVEY.md §7.4 rule: native expression only where built-ins genuinely
  * fall short; reference near-dup surface per SURVEY §2.3).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  // input must be array<long> (non-null elements); enforced by the caller
  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val counters = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = th.getLong(j)
      var i = 0
      while (i < 64) {
        counters(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var r = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) r |= 1L << i
      i += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counters = ctx.freshName("counters")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |int[] $counters = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $counters[$i] += (((int) (($h >>> $i) & 1L)) << 1) - 1;
         |  }
         |}
         |long $r = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counters[$i] > 0) $r |= 1L << $i;
         |}
         |${ev.value} = $r;
       """.stripMargin
    })
}

object SimHash64 {
  /** Column API: 64-bit simhash of an `array<long>` of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    graftbridge.toColumn(SimHash64(graftbridge.toExpression(tokenHashes)))
}
