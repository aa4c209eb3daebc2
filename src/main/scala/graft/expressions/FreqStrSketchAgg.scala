package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** STRING-domain twin of [[FreqSketchAgg]] — the same Misra–Gries /
  * SpaceSaving heavy-hitters family over DataSketches `ItemsSketch[String]`
  * instead of `LongsSketch`, for the domains/tokens/suppliers-by-name use
  * the sketch store's scaladoc advertises: a string item column must NOT
  * ride the long sketch (a non-ANSI long cast NULLs every item and the
  * store fills with silently-empty sketches). Same space bound
  * (O(maxMapSize · avg item len) per group), same associative+commutative
  * update/merge (map-side partials planned), same [lb, ub] +
  * NO_FALSE_NEGATIVES guarantees; serialization via the DataSketches
  * string serde, NOT interchangeable with the long sketch's binaries —
  * [[FreqStrUnionAgg]] only unions binaries written by this aggregate. */
case class FreqStrSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_str_sketch"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] =
    b1.merge(b2)

  override def eval(buffer: ItemsSketch[String]): Any = serialize(buffer)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqStrSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqStrSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqStrSketchAgg =
    copy(child = newChildren.head)
}

/** Union of serialized [[FreqStrSketchAgg]] sketches to the tracked item
  * table — `array<struct<item: string, est, lb, ub>>` under the same
  * NO_FALSE_NEGATIVES contract as [[FreqUnionAgg]]. */
case class FreqStrUnionAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_str_union"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe()))
    buffer
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] =
    b1.merge(b2)

  override def eval(buffer: ItemsSketch[String]): Any =
    new GenericArrayData(
      buffer.getFrequentItems(0L, ErrorType.NO_FALSE_NEGATIVES).map { r =>
        InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
          r.getLowerBound, r.getUpperBound)
      })

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqStrUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqStrUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqStrUnionAgg =
    copy(child = newChildren.head)
}

object FreqStrSketchAgg {

  /** Aggregate a string item column into one serialized frequent-items
    * sketch. `maxMapSize` must be a power of 2 (DataSketches contract). */
  def freqStrSketch(items: Column, maxMapSize: Int = 256): Column =
    graftbridge.toColumn(
      FreqStrSketchAgg(graftbridge.toExpression(items), maxMapSize)
        .toAggregateExpression())

  /** Union serialized string sketches and read the tracked item table. */
  def freqStrUnionItems(sketches: Column, maxMapSize: Int = 256): Column =
    graftbridge.toColumn(
      FreqStrUnionAgg(graftbridge.toExpression(sketches), maxMapSize)
        .toAggregateExpression())
}
