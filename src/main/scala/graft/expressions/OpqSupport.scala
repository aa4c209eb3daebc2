package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Support expressions for the trained-OPQ rotation
  * ([[graft.operators.Similarity.trainOpqRotation]]): the orthogonal
  * Procrustes step needs the dim×dim correlation matrix M = Σ_rows ŷ·xᵀ
  * of reconstructed-vs-raw vectors — a sum of per-row outer products over
  * the whole corpus. [[OuterProductQuant]] emits one row's outer product
  * micro-quantized to integer units (order-independent exact summation —
  * the same determinism trick as the k-means/PQ mean reduces), and
  * [[LongVectorSumAgg]] reduces those flat arrays element-wise with a
  * single fixed-length buffer (associative + commutative ⇒ map-side
  * partial aggregation; each partition forwards ONE dim² long array no
  * matter how many rows flow in — the corpus never shuffles).
  */
object OpqSupport {

  /** Flat micro-quantized outer product: out[i·|b|+j] = round(a_i·b_j·1e6). */
  def outerProductQuant(a: Column, b: Column): Column =
    graftbridge.toColumn(OuterProductQuant(
      graftbridge.toExpression(a), graftbridge.toExpression(b)))

  /** Element-wise sum of fixed-length `array<long>` rows. */
  def longVectorSum(vec: Column, length: Int): Column =
    graftbridge.toColumn(
      LongVectorSumAgg(graftbridge.toExpression(vec), length)
        .toAggregateExpression())
}

/** One row's outer product a·bᵀ, flattened row-major and micro-quantized:
  * out[i·|b|+j] = round(a_i · b_j · 1e6) as long (Math.round — deterministic;
  * |a_i·b_j| must stay ≪ 9.2e12, which every unit-scale embedding product
  * does by ten orders of magnitude). NULL propagates from either input. */
case class OuterProductQuant(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "outer_product_quant"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OuterProductQuant =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](na * nb)
    var i = 0
    while (i < na) {
      val x = a.getFloat(i).toDouble
      var j = 0
      while (j < nb) {
        out(i * nb + j) = Math.round(x * b.getFloat(j).toDouble * 1e6)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val genericArrayData = classOf[GenericArrayData].getName
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |long[] $out = new long[$na * $nb];
         |for (int $i = 0; $i < $na; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  for (int $j = 0; $j < $nb; $j++) {
         |    $out[$i * $nb + $j] = java.lang.Math.round($x * ((double) $b.getFloat($j)) * 1e6);
         |  }
         |}
         |${ev.value} = new $genericArrayData($out);
       """.stripMargin
    })
}

/** Element-wise sum of fixed-length `array<long>` inputs into one
  * `array<long>` — the reduction half of the correlation-matrix pass.
  * Rows of the wrong length are rejected loudly (never silently padded);
  * NULL rows are skipped. Associative and commutative, so Spark plans
  * map-side partials: each partition contributes one `length`-long buffer. */
case class LongVectorSumAgg(
    child: Expression,
    length: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_vector_sum"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](length)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == length,
        s"long_vector_sum: expected length $length, got ${arr.numElements()}")
      var i = 0
      while (i < length) {
        buffer(i) += arr.getLong(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < length) {
      b1(i) += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(length)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LongVectorSumAgg =
    copy(child = newChildren.head)
}
