package graft.expressions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup keys (the CCNet-style
  * normalize-then-hash convention): Unicode normalization (NFC by default;
  * NFKC additionally folds compatibility characters — width variants,
  * ligatures), then Locale.ROOT lowercasing, then whitespace collapse to
  * single spaces with edge trim. Two renderings of the same content —
  * composed vs decomposed accents, stray runs of whitespace, case
  * variation — hash to the same dedup key after this, which raw
  * `md5(text)` exact dedup misses entirely.
  *
  * Spark has no built-in Unicode normalizer, hence a native expression
  * (SURVEY.md §7.4 preference order: expression over UDF — null handling,
  * codegen, and no Scala-lambda serialization). The per-row work is one
  * `java.text.Normalizer` pass (the cost floor any implementation pays)
  * plus one precompiled-regex collapse; codegen calls the same static
  * helper, so interpreted and compiled paths are identical by
  * construction.
  *
  * Engine parity (the oracle contract): on any text, the result equals
  * `trim(regexp_replace(lower(nfc_normalize(s)), '\s+', ' ', 'g'))` in
  * DuckDB up to the engines' shared Unicode semantics; the declared query
  * pins this on the corpus, and the unicode edge cases (NFC vs NFD input,
  * NFKC ligature folding) are pinned in PipelineOpsSpec.
  */
case class NormalizeText(
    child: Expression,
    form: String = "NFC",
    caseFold: Boolean = true,
    collapseWs: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = StringType

  // a non-string child fails analysis cleanly (cast explicitly to opt in)
  // instead of being silently stringified via toString; ExpectsInputTypes —
  // which would add the implicit cast too — is private[sql] in Spark 4
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def prettyName: String = "normalize_text"

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.toString, form, caseFold, collapseWs))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // string literal is one of the validated Normalizer.Form names
      val formLit = "\"" + form + "\""
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expressions.NormalizeText.normalize(
         |    $s.toString(), $formLit, $caseFold, $collapseWs));
       """.stripMargin
    })

  // fail at construction, not per row, on an unknown form name
  require(NormalizeText.Forms.contains(form),
    s"form must be one of ${NormalizeText.Forms.mkString("/")}, got $form")
}

object NormalizeText {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  private val Ws = Pattern.compile("\\s+")

  /** The whole normalization, shared verbatim by the interpreted and
    * codegen paths (static forwarder makes it reachable from generated
    * Java). */
  def normalize(s: String, form: String, caseFold: Boolean, collapseWs: Boolean): String = {
    var r = Normalizer.normalize(s, Normalizer.Form.valueOf(form))
    if (caseFold) r = r.toLowerCase(Locale.ROOT)
    if (collapseWs) r = Ws.matcher(r).replaceAll(" ").trim
    r
  }
}
