package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the product-quantization hot paths
  * (SURVEY.md §7.4: custom `Expression` only where built-ins genuinely
  * fall short). Both paths were higher-order-function folds, and HOFs are
  * `CodegenFallback` in Spark — interpreted lambda dispatch per element,
  * blocking whole-stage codegen exactly where the work is per-corpus-row:
  *
  *   - the ADC scan scores EVERY encoded corpus row per query
  *     (m array lookups + adds — [[PqAdcScore]]);
  *   - the encode pass runs an m×ksub×dsub L2 argmin per corpus row at
  *     index build and once per Lloyd round during training
  *     ([[PqEncode]]).
  *
  * Semantics are BIT-IDENTICAL to the HOF folds they replace (same
  * left-to-right double accumulation, same (dist asc, code asc) argmin
  * tiebreak via strict `<` over ascending codes); structural problems
  * (index out of range, malformed codebook) yield NULL, mirroring how the
  * HOF versions null-poison their sums. Equivalence is pinned in
  * ExtensionsSpec against the retained `*Hof` reference implementations.
  */
object PqExpressions {

  /** Codegen'd ADC score over a per-query lookup table. */
  def adcScore(lut: Column, codes: Column, ksub: Int): Column =
    graftbridge.toColumn(PqAdcScore(
      graftbridge.toExpression(lut), graftbridge.toExpression(codes), ksub))

  /** Codegen'd PQ encoding against a flat (sub-major) codeword-vector
    * array; `ksub` is inferred from the array length at runtime. */
  def encode(vec: Column, cbvecs: Column, m: Int): Column =
    graftbridge.toColumn(PqEncode(
      graftbridge.toExpression(vec), graftbridge.toExpression(cbvecs), m))
}

/** `Σ_sub lut[sub·ksub + codes[sub]]` — the asymmetric-distance score of
  * one encoded corpus row against one query's lookup table. `lut` is the
  * flat m·ksub `array<double>` of subspace inner products
  * ([[graft.operators.Similarity]]'s LUT layout, index `sub·ksub + code`),
  * `codes` the row's m-element `array<int>`. NULL when either input is
  * NULL, any element is NULL, or an index falls outside the table —
  * exactly where the `aggregate(sequence(...))` fold it replaces
  * null-poisons. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_adc_score"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, c: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val idx = i * ksub + codes.getInt(i)
      if (idx < 0 || idx >= n || lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $c.numElements();
         |int $n = $l.numElements();
         |double $s = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($c.isNullAt($i)) { $bad = true; break; }
         |  int $idx = $i * $ksub + $c.getInt($i);
         |  if ($idx < 0 || $idx >= $n || $l.isNullAt($idx)) { $bad = true; break; }
         |  $s += $l.getDouble($idx);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Per-subspace L2 argmin encoding: for each of the `m` subspaces, the
  * code of the nearest codeword of `vec`'s slice — an m-element
  * `array<int>`, one row in, one row out. `cbvecs` is the flat sub-major
  * `array<array<float>>` of codeword vectors (index `sub·ksub + code`,
  * i.e. the sorted `__cb` struct array with just the `cvec` field kept);
  * `ksub` is `cbvecs.length / m`, so ONE broadcast array parameterizes the
  * whole encoding. Distances accumulate left-to-right in doubles and ties
  * keep the lowest code (strict `<` over ascending codes) — the exact
  * (dist asc, code asc) argmin of the HOF fold. NULL when the vector or
  * codebook shape is inconsistent (length not divisible by m, codeword of
  * the wrong width) — fail loudly, never truncate. */
case class PqEncode(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pq_encode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cbs = cb.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val ncb = cbs.numElements()
    if (m <= 0 || dim % m != 0 || ncb % m != 0 || ncb == 0) return null
    val dsub = dim / m
    val ksub = ncb / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        if (cbs.isNullAt(s * ksub + c)) return null
        val cv = cbs.getArray(s * ksub + c)
        if (cv.numElements() != dsub) return null
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = vec.getFloat(s * dsub + j).toDouble - cv.getFloat(j).toDouble
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val dim = ctx.freshName("dim")
      val ncb = ctx.freshName("ncb")
      val dsub = ctx.freshName("dsub")
      val ksub = ctx.freshName("ksub")
      val codes = ctx.freshName("codes")
      val bad = ctx.freshName("bad")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val arrayData = classOf[ArrayData].getName
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |int $dim = $v.numElements();
         |int $ncb = $cb.numElements();
         |boolean $bad = $m <= 0 || $ncb == 0 || ($dim % $m) != 0 || ($ncb % $m) != 0;
         |int[] $codes = null;
         |if (!$bad) {
         |  int $dsub = $dim / $m;
         |  int $ksub = $ncb / $m;
         |  $codes = new int[$m];
         |  for (int $s = 0; $s < $m && !$bad; $s++) {
         |    int $best = -1;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      if ($cb.isNullAt($s * $ksub + $c)) { $bad = true; break; }
         |      $arrayData $cv = $cb.getArray($s * $ksub + $c);
         |      if ($cv.numElements() != $dsub) { $bad = true; break; }
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        double $diff = ((double) $v.getFloat($s * $dsub + $j)) - ((double) $cv.getFloat($j));
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    if (!$bad) { $codes[$s] = $best; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $genericArrayData($codes);
         |}
       """.stripMargin
    })
}
