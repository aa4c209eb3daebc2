package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature over an `array<long>` of element hashes.
  *
  * With `shingleWidth == 1` slot i is `min over h of xxhash64(i, h)` —
  * bit-identical to the HOF formulation `transform(sequence(0, k-1), i ->
  * aggregate(hs, MaxLong, (m, h) -> least(m, xxhash64(i, h))))` (XxHash64
  * chains seed 42 → hashInt(i) → hashLong(h)).
  *
  * With `shingleWidth == w > 1` the input is PER-TOKEN hashes and each
  * shingle hash is rolled numerically — `hashLong(th[p+w-1], …
  * hashLong(th[p], 42))`, exactly what the builtin `xxhash64(th[p], …,
  * th[p+w-1])` computes — so w-gram shingling never materializes the
  * concatenated shingle STRINGS (measured: string building dominated the
  * whole MinHash pipeline ~6× at sf0.1). Fewer than w tokens degrade to one
  * clamped window over all tokens, mirroring `shingles()`'s whole-text
  * fallback.
  *
  * One generated (n·w + k·P)-hash loop per row instead of k interpreted
  * lambda folds with per-element boxing (SURVEY.md §7.4 rule: native
  * expression only where built-ins genuinely fall short).
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleWidth: Int = 1)
    extends UnaryExpression {

  require(numHashes > 0 && shingleWidth > 0)

  // input must be array<long> (non-null elements); enforced by the caller
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val p = if (shingleWidth == 1) n else math.max(n - shingleWidth + 1, if (n > 0) 1 else 0)
    val sh = new Array[Long](p)
    var i = 0
    while (i < p) {
      if (shingleWidth == 1) sh(i) = th.getLong(i)
      else {
        var s = 42L
        var t = i
        val end = math.min(i + shingleWidth, n)
        while (t < end) { s = XXH64.hashLong(th.getLong(t), s); t += 1 }
        sh(i) = s
      }
      i += 1
    }
    val out = new Array[Long](numHashes)
    i = 0
    while (i < numHashes) {
      val seed = XXH64.hashInt(i, 42L)
      var m = Long.MaxValue
      var j = 0
      while (j < p) {
        val h = XXH64.hashLong(sh(j), seed)
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val sh = ctx.freshName("sh")
      val out = ctx.freshName("out")
      val seed = ctx.freshName("seed")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val end = ctx.freshName("end")
      val shingleCode =
        if (shingleWidth == 1) s"$sh[$i] = $a.getLong($i);"
        else
          s"""long $s = 42L;
             |  int $end = java.lang.Math.min($i + $shingleWidth, $n);
             |  for (int $t = $i; $t < $end; $t++) { $s = $xxh.hashLong($a.getLong($t), $s); }
             |  $sh[$i] = $s;""".stripMargin
      s"""
         |int $n = $a.numElements();
         |int $p = ${if (shingleWidth == 1) n
                     else s"java.lang.Math.max($n - ${shingleWidth - 1}, $n > 0 ? 1 : 0)"};
         |long[] $sh = new long[$p];
         |for (int $i = 0; $i < $p; $i++) {
         |  $shingleCode
         |}
         |long[] $out = new long[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $seed = $xxh.hashInt($i, 42L);
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $p; $j++) {
         |    long $h = $xxh.hashLong($sh[$j], $seed);
         |    if ($h < $m) $m = $h;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
}

object MinHashSignature {
  /** Column API: signature of `numHashes` minima over an `array<long>` of
    * shingle hashes (`shingleWidth` 1) or per-token hashes rolled into
    * w-gram shingle hashes (`shingleWidth` w). */
  def minhashSignature(elementHashes: Column, numHashes: Int, shingleWidth: Int = 1): Column =
    graftbridge.toColumn(
      MinHashSignature(graftbridge.toExpression(elementHashes), numHashes, shingleWidth))

  /** Column API: w-gram rolled shingle hashes themselves (see
    * [[ShingleHashes]]). */
  def shingleHashes(tokenHashes: Column, shingleWidth: Int): Column =
    graftbridge.toColumn(
      ShingleHashes(graftbridge.toExpression(tokenHashes), shingleWidth))
}

/** Codegen'd w-gram shingle hashes over an `array<long>` of per-token
  * hashes: element p is the seed-42 xxhash64 chain over tokens p..p+w-1
  * (identical to the builtin `xxhash64(th[p], …, th[p+w-1])`), with fewer
  * than w tokens degrading to one clamped window — the numeric twin of
  * `TextFunctions.shingles` shingle IDENTITY (two shingles are equal iff
  * their token windows are equal, modulo 64-bit collisions), without ever
  * concatenating shingle strings. Feeds set ops (distinct/explode/join) in
  * the inverted-index jaccard path where only identity matters, cutting both
  * CPU and shuffle width. */
case class ShingleHashes(child: Expression, shingleWidth: Int)
    extends UnaryExpression {

  require(shingleWidth > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  private def numShingles(n: Int): Int =
    if (n == 0) 0 else math.max(n - shingleWidth + 1, 1)

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val p = numShingles(n)
    val out = new Array[Long](p)
    var i = 0
    while (i < p) {
      var s = 42L
      var t = i
      val end = math.min(i + shingleWidth, n)
      while (t < end) { s = XXH64.hashLong(th.getLong(t), s); t += 1 }
      out(i) = s
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val end = ctx.freshName("end")
      s"""
         |int $n = $a.numElements();
         |int $p = $n == 0 ? 0 : java.lang.Math.max($n - ${shingleWidth - 1}, 1);
         |long[] $out = new long[$p];
         |for (int $i = 0; $i < $p; $i++) {
         |  long $s = 42L;
         |  int $end = java.lang.Math.min($i + $shingleWidth, $n);
         |  for (int $t = $i; $t < $end; $t++) { $s = $xxh.hashLong($a.getLong($t), $s); }
         |  $out[$i] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
}
