package graft.expressions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}

/** Group-level frequent-items (heavy-hitters) sketch — the Misra–Gries /
  * SpaceSaving family as implemented by Apache DataSketches `LongsSketch`:
  * aggregates a long item column into one compact mergeable sketch per
  * group, the HEAVY-HITTERS member of the sketch store (HLL = distinct,
  * KLL = quantiles, this = top items). O(maxMapSize) space per group;
  * update/merge are associative+commutative, so Spark plans map-side
  * partial aggregation.
  *
  * DETERMINISM: the sketch's ESTIMATES depend on purge/merge order (which
  * varies with partitioning), but its GUARANTEES do not — every item's
  * true count lies in [lower bound, upper bound], and the
  * NO_FALSE_NEGATIVES item list misses no item whose true count exceeds
  * the maximum error. The store's contract is those guarantees —
  * tolerance/membership pins, never byte- or estimate-equality (the KLL
  * convention, for a different root cause). */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: LongsSketch, b2: LongsSketch): LongsSketch = b1.merge(b2)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

/** Union of serialized [[FreqSketchAgg]] sketches straight to the tracked
  * item table: every active item with its estimate and exact-count bounds,
  * under the NO_FALSE_NEGATIVES contract (an item whose true count exceeds
  * the merged sketch's maximum error is guaranteed present). Returns
  * `array<struct<item, est, lb, ub>>` — at most ~¾·maxMapSize entries,
  * bounded by construction. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_union"

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(b1: LongsSketch, b2: LongsSketch): LongsSketch = b1.merge(b2)

  override def eval(buffer: LongsSketch): Any =
    new GenericArrayData(
      buffer.getFrequentItems(0L, ErrorType.NO_FALSE_NEGATIVES).map { r =>
        InternalRow(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound)
      })

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqUnionAgg =
    copy(child = newChildren.head)
}

object FreqSketchAgg {

  /** Aggregate a long item column into one serialized frequent-items
    * sketch. `maxMapSize` must be a power of 2 (DataSketches contract). */
  def freqSketch(items: Column, maxMapSize: Int = 256): Column =
    graftbridge.toColumn(
      FreqSketchAgg(graftbridge.toExpression(items), maxMapSize)
        .toAggregateExpression())

  /** Union serialized sketches and read the tracked item table. */
  def freqUnionItems(sketches: Column, maxMapSize: Int = 256): Column =
    graftbridge.toColumn(
      FreqUnionAgg(graftbridge.toExpression(sketches), maxMapSize)
        .toAggregateExpression())
}
