package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM Viterbi segmentation for production vocabularies —
  * the [[BpeEncode]] pattern applied to the SentencePiece-style tokenizer:
  * [[graft.operators.Corpus.unigramSegment]]'s reference formulation is a
  * nested-`aggregate` HOF expression whose tree is far past whole-stage
  * codegen, so it evaluates INTERPRETED at ~10 ms per word — the 10×
  * scale rehearsal caught exactly that as an hour-long straggler task.
  * This expression holds the trained piece scores as plain driver-side
  * metadata (the bounded-artifact pattern) and runs the same DP in plain
  * Scala: O(len · maxPieceLen) hash lookups per word, microseconds.
  *
  * EXACT TWIN CONTRACT (pinned in PipelineOpsSpec): same truncation
  * (first `maxWordLen` code points), same scores (vocab hit, else the
  * single-char −20-nat fallback, else the forbidden score), same
  * strictly-greater argmax (ties keep the SMALLEST split point), same
  * backpointer walk — bit-identical spans to the HOF reference on every
  * input.
  *
  * Null contract: NULL word → NULL. Output
  * `array<struct<start:int,piece:string>>`, starts 1-based in the
  * truncated word; the empty word segments to an empty array. Codegen
  * stays inside whole-stage via one referenced-object call. */
object UnigramViterbi {
  def apply(word: Column, scores: Map[String, Long],
      maxPieceLen: Int, maxWordLen: Int): Column =
    graftbridge.toColumn(UnigramViterbi(graftbridge.toExpression(word),
      scores.toSeq.sortBy(_._1), maxPieceLen, maxWordLen))
}

case class UnigramViterbi(
    child: Expression,
    scoreRows: Seq[(String, Long)],
    maxPieceLen: Int,
    maxWordLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
    "need maxWordLen >= maxPieceLen >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start", IntegerType, nullable = false),
      StructField("piece", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "unigram_viterbi"

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](scoreRows.length * 2)
    scoreRows.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  /** The shared DP (see the HOF reference in Corpus.unigramViterbiHof). */
  def segment(wordRaw: UTF8String): GenericArrayData = {
    // first maxWordLen CODE POINTS (substring/length SQL semantics)
    val full = wordRaw.toString
    val cps = new java.util.ArrayList[String](full.length)
    var i = 0
    while (i < full.length && cps.size < maxWordLen) {
      val cp = full.codePointAt(i)
      val cn = Character.charCount(cp)
      cps.add(full.substring(i, i + cn))
      i += cn
    }
    val n = cps.size
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // prefix strings for O(1) piece materialization
    val joined = new Array[String](n + 1)
    joined(0) = ""
    var k = 0
    while (k < n) { joined(k + 1) = joined(k) + cps.get(k); k += 1 }
    def piece(j: Int, p: Int): String = joined(p).substring(joined(j).length)
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    best(0) = 0L; bp(0) = 0
    var p = 1
    while (p <= n) {
      var b = Long.MinValue / 4
      var bj = -1
      var j = math.max(0, p - maxPieceLen)
      while (j < p) {
        val pc = piece(j, p)
        val hit = scores.get(pc)
        val ps: Long =
          if (hit != null) hit.longValue()
          else if (p - j == 1) graft.operators.Corpus.UnigramUnkMicro
          else graft.operators.Corpus.UnigramForbiddenMicro
        val cand = best(j) + ps
        if (cand > b) { b = cand; bj = j }
        j += 1
      }
      best(p) = b; bp(p) = bj
      p += 1
    }
    // backpointer walk
    val starts = new java.util.ArrayList[Integer]()
    val pieces = new java.util.ArrayList[String]()
    var pos = n
    while (pos > 0) {
      val j = bp(pos)
      starts.add(0, Integer.valueOf(j + 1))
      pieces.add(0, piece(j, pos))
      pos = j
    }
    val out = new Array[Any](starts.size)
    var r = 0
    while (r < starts.size) {
      out(r) = InternalRow(starts.get(r).intValue(),
        UTF8String.fromString(pieces.get(r)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(w: Any): Any = segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = $ref.segment($w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
}
