package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression.
  *
  * Text arriving from a 100 TB crawl mixes byte representations of the
  * SAME string (composed é vs e + combining acute), which silently
  * breaks exact dedup, fingerprinting, shingling and tokenization —
  * normalization is the mandatory first stage of every text pipeline.
  * Spark has no built-in for it; a Scala UDF would break whole-stage
  * codegen on the hottest full-corpus map, so this is a codegen'd
  * expression (same rationale as the vector expressions): the
  * generated code calls `java.text.Normalizer` directly, no boxing,
  * null-safe, stays inside the WholeStageCodegen span.
  *
  * Semantics match `java.text.Normalizer.normalize(s, form)`; both it
  * and DuckDB's `nfc_normalize` implement the Unicode canonical
  * algorithms, which the oracle relies on. */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString(",")}, got $form")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($x.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

/** Column-level API for text normalization. */
object textnorm {

  def normalize(text: Column, form: String): Column =
    ColumnShim.column(UnicodeNormalize(ColumnShim.expression(text), form))

  /** Canonical composition — the form to standardize a corpus on. */
  def nfc(text: Column): Column = normalize(text, "NFC")

  /** The full normalization stage of a training pipeline: NFC, strip
    * control characters (keep \t\n), collapse whitespace runs, trim.
    * Composed from the codegen'd expression + codegen'd built-ins —
    * the whole stage stays in one WholeStageCodegen span. */
  def forTraining(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(text), "[\\p{Cc}\\p{Cf}&&[^\\t\\n]]", ""),
      "[ \\t\\x0B\\f\\r]+", " "))
}
