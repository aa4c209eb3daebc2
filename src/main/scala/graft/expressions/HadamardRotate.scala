package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Deterministic structured rotation y = (1/√n)·H·D·x — a sign-flipped
  * Walsh–Hadamard transform, the "fast rotation" used as a cheap stand-in
  * for a trained OPQ rotation (Ailon–Chazelle fast JL transform; the same
  * trick FAISS exposes as a pre-transform). H is the order-n Hadamard
  * matrix H[i][j] = (−1)^popcount(i AND j); D is a fixed diagonal of ±1
  * signs derived from a multiplicative hash of the coordinate index, so
  * the rotation needs NO training pass, no stored matrix, and is identical
  * on every executor by construction. (1/√n)·H·D is orthogonal, so inner
  * products — and therefore cosine ranking — are preserved up to float
  * rounding, while the energy of any variance-hoarding coordinate is
  * spread across ALL outputs: the decorrelation PQ subspace quantization
  * wants, at O(n²) row-local cost with zero search-time overhead.
  *
  * Exactness contract (what makes the full rotated-PQ pipeline
  * oracle-derivable): the sum over j runs LEFT TO RIGHT in doubles — the
  * naive order-defined form, deliberately NOT the O(n log n) butterfly,
  * whose different association order would change low-order float bits —
  * one division by √n after, then a single double→float rounding. NULL
  * when the input is NULL or its length is not a positive power of two
  * (H only exists for those orders) — fail loudly, never truncate.
  */
case class HadamardRotate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "hadamard_rotate"

  override protected def withNewChildInternal(newChild: Expression): HadamardRotate =
    copy(child = newChild)

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    if (n <= 0 || (n & (n - 1)) != 0) return null
    val scale = math.sqrt(n.toDouble)
    // D's signs: parity of popcount(knuth-hash(j)) — fixed, training-free
    val dpar = new Array[Int](n)
    var j = 0
    while (j < n) {
      dpar(j) = java.lang.Long.bitCount((j * 2654435761L) % 4294967296L) & 1
      j += 1
    }
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var k = 0
      while (k < n) {
        val x = vec.getFloat(k).toDouble
        if (((Integer.bitCount(i & k) + dpar(k)) & 1) == 0) s += x else s -= x
        k += 1
      }
      out(i) = (s / scale).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val scale = ctx.freshName("scale")
      val dpar = ctx.freshName("dpar")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |int $n = $v.numElements();
         |boolean $bad = $n <= 0 || ($n & ($n - 1)) != 0;
         |float[] $out = null;
         |if (!$bad) {
         |  double $scale = java.lang.Math.sqrt((double) $n);
         |  int[] $dpar = new int[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dpar[$j] = java.lang.Long.bitCount(($j * 2654435761L) % 4294967296L) & 1;
         |  }
         |  $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      double $x = (double) $v.getFloat($k);
         |      if (((java.lang.Integer.bitCount($i & $k) + $dpar[$k]) & 1) == 0) { $s += $x; } else { $s -= $x; }
         |    }
         |    $out[$i] = (float) ($s / $scale);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $genericArrayData($out);
         |}
       """.stripMargin
    })
}

object HadamardRotate {

  /** Column wrapper: rotate an `array<float>` whose length is a power of
    * two. One row in, one row out — row-local, shuffle-free. */
  def rotate(vec: Column): Column =
    graftbridge.toColumn(HadamardRotate(graftbridge.toExpression(vec)))
}
