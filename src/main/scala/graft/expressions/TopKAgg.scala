package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over `struct<score: double, id: long>` rows: the
  * buffer holds AT MOST 2k candidates and compacts to the best k by
  * (score desc, id asc) whenever it fills — so per-group state is O(k) no
  * matter how many candidate rows flow in. That bound is the point:
  *
  *  - in BATCH, `groupBy(q).agg(topK(...))` ranks candidates with map-side
  *    partial aggregation — each map task forwards at most k candidates
  *    per group, where the window-function formulation shuffles EVERY
  *    candidate row to sort it (WindowGroupLimit recovers some of this,
  *    but only after a full sort of the per-partition slice);
  *  - in STREAMING, it is the difference between a legal update-mode
  *    aggregate with O(k) state per query and a `collect_list` whose state
  *    grows with every candidate ever seen.
  *
  * Associative + commutative (merge concatenates and compacts), so Spark
  * plans partial aggregation. Ties break on the LOWEST id — the same total
  * (score desc, id asc) order every top-k query in this repo uses, which
  * makes results reproducible and lets the declared query share the
  * window-formulation's DuckDB oracle. NULL inputs (or null score/id
  * fields) are skipped. Output: `array<struct<score, id>>` sorted by the
  * ranking order, length ≤ k.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k >= 1, "k must be at least 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  // (score desc, id asc) — java.lang.Double.compare semantics for NaN/-0.0
  private def rankOrder: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def compact(b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (b.length > k) {
      val best = b.sorted(rankOrder).take(k)
      b.clear()
      b ++= best
    }
    b
  }

  override def update(
      buffer: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buffer += ((row.getDouble(0), row.getLong(1)))
        if (buffer.length >= 2 * k) compact(buffer)
      }
    }
    buffer
  }

  override def merge(
      b1: ArrayBuffer[(Double, Long)],
      b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b1 ++= b2
    compact(b1)
  }

  override def eval(buffer: ArrayBuffer[(Double, Long)]): Any = {
    val best = buffer.sorted(rankOrder).take(k)
    new GenericArrayData(best.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    }.toArray[Any])
  }

  override def serialize(buffer: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 16)
    bb.putInt(buffer.length)
    buffer.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new ArrayBuffer[(Double, Long)](n max (k + 1))
    var i = 0
    while (i < n) { b += ((bb.getDouble, bb.getLong)); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {

  /** Top-k of `struct(score, id)` per group, sorted (score desc, id asc),
    * length ≤ k. Build the struct with exactly two fields in that order,
    * e.g. `struct(col("cos"), col("doc_id"))`. */
  def topKByScore(scoreAndId: Column, k: Int): Column =
    graftbridge.toColumn(
      TopKAgg(graftbridge.toExpression(scoreAndId), k).toAggregateExpression())
}
