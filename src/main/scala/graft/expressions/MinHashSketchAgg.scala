package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Group-level MinHash sketch (SURVEY.md §7.4's optional
  * `TypedImperativeAggregate`): aggregates rows of pre-hashed shingles
  * (`array<long>`) into one k-slot MinHash signature per group.
  *
  * The buffer is a fixed k-long array; update/merge are elementwise mins, so
  * the aggregate is associative+commutative and Spark plans it with map-side
  * partial aggregation — each group's signature costs O(k) memory no matter
  * how many rows or shingles flow in. Signatures of two groups estimate the
  * Jaccard similarity of their shingle sets via slot-equality fraction
  * ([[MinHashSketchAgg.sketchJaccard]]).
  */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  /** splitmix64-style finalizer over (slot seed, shingle hash) — the
    * simulated permutation family. */
  @inline private def mix(i: Int, h: Long): Long = {
    var z = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var j = 0
      while (j < arr.numElements()) {
        val h = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val m = mix(i, h)
          if (m < buffer(i)) buffer(i) = m
          i += 1
        }
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

object MinHashSketchAgg {

  /** Aggregate a column of pre-hashed shingles (`array<long>`, e.g.
    * `transform(shingles(text), s -> xxhash64(s))`) into a k-slot signature. */
  def minhashSketch(shingleHashes: Column, numHashes: Int = 32): Column =
    graftbridge.toColumn(
      MinHashSketchAgg(graftbridge.toExpression(shingleHashes), numHashes)
        .toAggregateExpression())

  /** Estimated Jaccard similarity between two equal-length signatures:
    * the fraction of agreeing slots. */
  def sketchJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a).cast("double")
}
