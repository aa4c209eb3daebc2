package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Group-level THETA sketch (Apache DataSketches): the SET-ALGEBRA member
  * of the sketch store — where HLL only answers "how many distinct",
  * theta sketches keep a bounded uniform sample of item HASHES and so
  * support distinct-count INTERSECTION and DIFFERENCE across arbitrary
  * segments ("users who did A and B", "users in yesterday's cohort but
  * not today's") without ever joining raw events. O(2^lgK · 8) bytes per
  * group; update/merge associative + commutative → map-side partials.
  *
  * DETERMINISM — stronger than the frequent-items store: a theta sketch
  * retains the k smallest item hashes under a fixed seed, and min-k over
  * a set is ORDER-INDEPENDENT, so the same item multiset yields the same
  * retained set (and the same ordered compact serialization) at ANY
  * partitioning, in both exact and sampling mode — pinned byte-for-byte
  * in OpsSpec. Estimates are exact below ~2^lgK distinct items; above,
  * the published relative error is ~1/√(2^lgK) per std.
  *
  * Items: integral types update through the long hash, strings through
  * the string hash (both native DataSketches update overloads) — the
  * operator dispatches on the column type up front, never a silent cast. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    stringItems: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      if (stringItems) buffer.update(v.asInstanceOf[UTF8String].toString)
      else buffer.update(v.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult)
    b1
  }

  // ordered compact form: the canonical serialization the byte-equality
  // pin relies on (same retained hash set → same bytes)
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Union of serialized theta sketches back to one merged sketch binary —
  * the store's re-aggregation member (estimate via [[ThetaEstimate]]). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buffer.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(b1: Union, b2: Union): Union = { b1.union(b2.getResult); b1 }
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

private[expressions] object ThetaOps {
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))

  def intersect(a: Array[Byte], b: Array[Byte]): CompactSketch =
    SetOperation.builder().buildIntersection().intersect(wrap(a), wrap(b))

  def aNotB(a: Array[Byte], b: Array[Byte]): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b))

  def union(a: Array[Byte], b: Array[Byte]): CompactSketch = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult
  }
}

/** Scalar distinct-count estimate of one serialized theta sketch.
  * Post-aggregation O(groups) rows — interpreted eval is fine. */
case class ThetaEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(input: Any): Any =
    ThetaOps.wrap(input.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** |A ∩ B| estimate over two serialized theta sketches — the row-local
  * segment-overlap primitive: join two segment tables on the group key
  * and the whole set algebra happens without touching raw events. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      .getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
}

/** |A \ B| estimate over two serialized theta sketches. */
case class ThetaANotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_anotb_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      .getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotBEstimate =
    copy(left = l, right = r)
}

/** |A ∪ B| estimate over two serialized theta sketches (the Jaccard
  * denominator). */
case class ThetaUnionEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_union_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      .getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnionEstimate =
    copy(left = l, right = r)
}

object ThetaSketchAgg {

  /** Aggregate an item column into one serialized theta sketch.
    * `stringItems` selects the string-hash update path; the integral path
    * casts the child to LONG here so Int/Short/Byte columns hash
    * identically to a pre-cast Long column (update() evaluates a Long
    * unconditionally — without this cast a direct caller on an Int column
    * would ClassCastException at execution). */
  def thetaSketch(items: Column, lgK: Int, stringItems: Boolean): Column = {
    val child = if (stringItems) items else items.cast("long")
    graftbridge.toColumn(
      ThetaSketchAgg(graftbridge.toExpression(child), lgK, stringItems)
        .toAggregateExpression())
  }

  /** Union serialized sketches to one merged sketch binary. */
  def thetaUnion(sketches: Column, lgK: Int): Column =
    graftbridge.toColumn(
      ThetaUnionAgg(graftbridge.toExpression(sketches), lgK)
        .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    graftbridge.toColumn(ThetaEstimate(graftbridge.toExpression(sketch)))

  def thetaIntersectEstimate(a: Column, b: Column): Column =
    graftbridge.toColumn(
      ThetaIntersectEstimate(graftbridge.toExpression(a), graftbridge.toExpression(b)))

  def thetaANotBEstimate(a: Column, b: Column): Column =
    graftbridge.toColumn(
      ThetaANotBEstimate(graftbridge.toExpression(a), graftbridge.toExpression(b)))

  def thetaUnionEstimate(a: Column, b: Column): Column =
    graftbridge.toColumn(
      ThetaUnionEstimate(graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
