package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Row-local n-gram repetition counts over an `array<long>` of gram hashes
  * (the [[ShingleHashes]] output): returns
  * `struct(n_ngrams, top_ngram_count, dup_ngram_count)` — total grams, the
  * count of the most frequent gram, and the total count of grams occurring
  * more than once. These are the per-document inputs of the Gopher/C4-style
  * repetition quality rules (`Corpus.repetitionStats` derives
  * `top_ngram_frac` / `dup_ngram_frac` from exactly these three counters).
  *
  * Registered on the SQL surface as `ngram_repetition`, this puts the
  * repetition side of the quality gate within reach of `spark.sql`-only
  * users as ONE row-local expression — no explode, no per-gram shuffle:
  * the whole histogram lives in a doc-sized hash map for the duration of
  * one row's evaluation. Counts are exact integers, so the derived fracs
  * are bit-identical to any engine computing the same per-doc histogram
  * (the declared `sql_native_repetition` query pins this against DuckDB).
  *
  * Null array → null struct; null gram slots (never produced by
  * [[ShingleHashes]]) are skipped defensively. Interpreted and codegen
  * paths share [[NgramRepetition.compute]] verbatim.
  */
case class NgramRepetition(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("top_ngram_count", LongType, nullable = false),
    StructField("dup_ngram_count", LongType, nullable = false)))

  override def prettyName: String = "ngram_repetition"

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.expressions.NgramRepetition.compute($a);
       """.stripMargin
    })
}

object NgramRepetition {

  /** Shared by the interpreted and codegen paths. */
  def compute(grams: ArrayData): InternalRow = {
    val n = grams.numElements()
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]](math.max(16, n * 2))
    var total = 0L
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        total += 1L
        val k = java.lang.Long.valueOf(grams.getLong(i))
        val slot = counts.get(k)
        if (slot == null) counts.put(k, Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    new GenericInternalRow(Array[Any](total, top, dup))
  }

  /** Column wrapper. */
  def ngramRepetition(gramHashes: Column): Column =
    graftbridge.toColumn(NgramRepetition(graftbridge.toExpression(gramHashes)))
}
