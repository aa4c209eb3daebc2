package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native form of the [[graft.operators.Corpus.charStats]]
  * signals. The HOF formulation (per-DISTINCT-character `filter` scans)
  * is O(distinct × n) with interpreted lambda dispatch per element —
  * measured 12 s over sf0.1, the most expensive "row-local" operator in
  * the scale audit. This expression walks the string's code points once,
  * classifying (alpha / digit / whitespace / other, Java-regex `\s`
  * semantics) and building the code-point histogram in one HashMap; the
  * entropy is then one `ln` per DISTINCT code point, each quantized
  * HALF_UP to integer micro-nats (the exact rounding `round()` applies
  * in both Spark and DuckDB — `Math.round` floors negative halves and
  * would diverge) and summed exactly. Bit-identical to the HOF + regex
  * formulation by construction; the declared `text_char_stats` oracle is
  * unchanged and re-verified after the swap. NULL text → NULL struct
  * (the operator coalesces to empty first, as before). */
object CharClassStats {

  def apply(text: Column): Column =
    graftbridge.toColumn(CharClassStats(graftbridge.toExpression(text)))

  private def isJavaRegexSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** Shared by the interpreted and codegen paths. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val hist = new java.util.HashMap[Integer, Array[Long]]()
    var nChars = 0L
    var nAlpha = 0L
    var nDigit = 0L
    var nSpace = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      nChars += 1L
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) nAlpha += 1L
      else if (cp >= '0' && cp <= '9') nDigit += 1L
      else if (isJavaRegexSpace(cp)) nSpace += 1L
      val e = hist.get(cp)
      if (e == null) hist.put(cp, Array(1L)) else e(0) += 1L
    }
    var entropy = 0L
    if (nChars > 0L) {
      val it = hist.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        val microLp = new JBigDecimal(math.log(c.toDouble / nChars) * 1e6)
          .setScale(0, RoundingMode.HALF_UP).longValueExact()
        entropy += c * (-microLp)
      }
    }
    new GenericInternalRow(Array[Any](
      nChars, nAlpha, nDigit, nSpace, nChars - nAlpha - nDigit - nSpace, entropy))
  }
}

case class CharClassStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false),
    StructField("entropy_micro_nats", LongType, nullable = false)))

  override def prettyName: String = "char_class_stats"

  override protected def withNewChildInternal(newChild: Expression): CharClassStats =
    copy(child = newChild)

  override def nullSafeEval(t: Any): Any =
    CharClassStats.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = graft.expressions.CharClassStats.compute($t);
       """.stripMargin
    })
}
