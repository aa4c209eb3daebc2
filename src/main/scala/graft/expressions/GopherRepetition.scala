package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** The COMPLETE Gopher A1.1 repetition-signal family (Rae et al. 2021) as
  * one row-local expression: for each document,
  *
  *   - `top{2,3,4}_chars` — `count × charLen` of the MOST FREQUENT
  *     n-gram (ties broken by larger charLen): the numerator of
  *     Gopher's "fraction of characters contained within the most
  *     frequently-occurring n-gram";
  *   - `dup{5..10}_chars` — the character mass of token positions covered
  *     by ANY n-gram occurring more than once, overlaps counted once
  *     (Gopher's "fraction of characters contained within all duplicate
  *     n-grams", numerator);
  *   - `total_chars` — the shared denominator.
  *
  * Character mass is the sum of TOKEN character lengths (inter-token
  * separators excluded on both sides of every fraction — a deliberate,
  * documented simplification that keeps numerator and denominator in the
  * same unit and the whole family exactly oracle-derivable). Where two
  * equally-frequent grams differ in length the paper is ambiguous; the
  * longer gram wins, which is deterministic and needs no further rule.
  *
  * Inputs are the doc's token xxhash64 array and token char-length array
  * ([[graft.operators.Corpus.gopherRepetition]] builds both row-locally).
  * Gram identity is a 64-bit polynomial roll of the token hashes —
  * grouping by it equals grouping by the token sequence under the same
  * collision-free-at-the-test-SF assumption the other hash-keyed
  * operators document. All nine signals compute in one evaluation with
  * doc-sized hash maps — no explode, no shuffle, the whole A1.1 family
  * is a map over the corpus scan. NULL on null/misaligned inputs. */
object GopherRepetition {

  def apply(tokenHashes: Column, tokenLens: Column): Column =
    graftbridge.toColumn(GopherRepetition(
      graftbridge.toExpression(tokenHashes), graftbridge.toExpression(tokenLens)))

  val TopNs: Seq[Int] = Seq(2, 3, 4)
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  private val P = 1099511628211L // FNV-64 prime as the rolling base

  /** Shared by the interpreted and codegen paths. Returns null on a null
    * element or length mismatch. */
  def compute(hashes: ArrayData, lens: ArrayData): InternalRow = {
    val t = hashes.numElements()
    if (lens.numElements() != t) return null
    val h = new Array[Long](t)
    val l = new Array[Long](t)
    var i = 0
    var total = 0L
    while (i < t) {
      if (hashes.isNullAt(i) || lens.isNullAt(i)) return null
      h(i) = hashes.getLong(i)
      l(i) = lens.getLong(i)
      total += l(i)
      i += 1
    }
    val out = new Array[Any](1 + TopNs.length + DupNs.length)
    out(0) = total
    var slot = 1
    TopNs.foreach { n =>
      var top = 0L
      if (t >= n) {
        // gram hash -> (count, charLen); charLen identical across
        // occurrences under the collision-free assumption
        val m = new java.util.HashMap[java.lang.Long, Array[Long]]()
        var s = 0
        while (s + n <= t) {
          var g = 0L
          var cl = 0L
          var j = 0
          while (j < n) { g = g * P + h(s + j); cl += l(s + j); j += 1 }
          val e = m.get(g)
          if (e == null) m.put(g, Array(1L, cl)) else e(0) += 1L
          s += 1
        }
        // the MOST FREQUENT gram's char mass (count desc, then charLen
        // desc as the deterministic tie rule — the paper doesn't specify
        // one); NOT max(count×len), which could prefer a rarer long gram
        var bestC = 0L
        var bestL = 0L
        val it = m.values().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e(0) > bestC || (e(0) == bestC && e(1) > bestL)) {
            bestC = e(0); bestL = e(1)
          }
        }
        top = bestC * bestL
      }
      out(slot) = top; slot += 1
    }
    DupNs.foreach { n =>
      var dup = 0L
      if (t >= n) {
        val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        var s = 0
        while (s + n <= t) {
          var g = 0L
          var j = 0
          while (j < n) { g = g * P + h(s + j); j += 1 }
          val c = m.get(g)
          m.put(g, if (c == null) 1L else c + 1L)
          s += 1
        }
        val covered = new Array[Boolean](t)
        s = 0
        while (s + n <= t) {
          var g = 0L
          var j = 0
          while (j < n) { g = g * P + h(s + j); j += 1 }
          if (m.get(g) >= 2L) {
            j = 0
            while (j < n) { covered(s + j) = true; j += 1 }
          }
          s += 1
        }
        var p = 0
        while (p < t) { if (covered(p)) dup += l(p); p += 1 }
      }
      out(slot) = dup; slot += 1
    }
    new GenericInternalRow(out)
  }
}

case class GopherRepetition(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(
    StructField("total_chars", LongType, nullable = false) +:
      (GopherRepetition.TopNs.map(n =>
        StructField(s"top${n}_chars", LongType, nullable = false)) ++
        GopherRepetition.DupNs.map(n =>
          StructField(s"dup${n}_chars", LongType, nullable = false))))

  override def nullable: Boolean = true

  override def prettyName: String = "gopher_repetition"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GopherRepetition =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(hs: Any, ls: Any): Any =
    GopherRepetition.compute(hs.asInstanceOf[ArrayData], ls.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, ls) => {
      s"""
         |${ev.value} = graft.expressions.GopherRepetition.compute($hs, $ls);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}
