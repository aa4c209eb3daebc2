package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Group-level KLL quantile sketch (Karnin–Lang–Liberty 2016, the Apache
  * DataSketches implementation Spark itself bundles): aggregates a double
  * column into one compact mergeable sketch per group, the quantile
  * counterpart of the HLL distinct-count store in
  * [[graft.operators.Sketches]].
  *
  * The buffer is a heap KLL sketch of parameter `k` — O(k · log(n/k))
  * space, associative+commutative update/merge, so Spark plans map-side
  * partial aggregation and per-group state stays bounded no matter how
  * many rows flow in. UNLIKE HLL, KLL compaction flips RANDOM coins: two
  * runs over the same data may produce different (all individually valid)
  * sketches, so the store's contract is the published rank-error bound
  * (~1.65/√k normalized rank error at 99% confidence), never
  * byte-equality — the specs and the declared property query pin
  * tolerance, not bits.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union of serialized KLL sketches (a `binary` column of
  * [[KllSketchAgg]] outputs) straight to quantile estimates at the given
  * ranks — the store-side re-aggregation: input is sketch rows, never raw
  * values. Returns `array<double>` aligned with `ranks` (all NaN when
  * every input sketch was empty, so downstream arithmetic fails loudly
  * instead of silently reading 0.0). */
case class KllUnionAgg(
    child: Expression,
    ranks: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_union"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: KllDoublesSketch): Any =
    new GenericArrayData(
      if (buffer.isEmpty) ranks.map(_ => Double.NaN).toArray
      else ranks.map(buffer.getQuantile).toArray)

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllUnionAgg =
    copy(child = newChildren.head)
}

object KllSketchAgg {

  /** Aggregate a double column into one serialized KLL sketch. */
  def kllSketch(values: Column, k: Int = 200): Column =
    graftbridge.toColumn(
      KllSketchAgg(graftbridge.toExpression(values), k).toAggregateExpression())

  /** Union serialized sketches and read quantiles at `ranks`. */
  def kllUnionQuantiles(sketches: Column, ranks: Seq[Double], k: Int = 200): Column =
    graftbridge.toColumn(
      KllUnionAgg(graftbridge.toExpression(sketches), ranks, k).toAggregateExpression())
}
