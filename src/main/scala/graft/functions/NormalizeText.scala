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

/** Encoding-repair core: UTF-8 text that was mis-decoded as
  * Windows-1252 somewhere upstream ("é" arriving as "Ã©") — the
  * single most common corruption in web crawls (the ftfy class).
  * Repair = re-encode the chars as cp1252 bytes and strictly
  * re-decode as UTF-8; STRICTNESS IS THE GUARD: clean text (whose
  * cp1252 bytes are not valid UTF-8 — a lone é is 0xE9) fails the
  * decode and passes through untouched, pure ASCII round-trips to
  * itself, and anything cp1252 cannot encode (emoji, CJK) is left
  * alone. A genuine repair strictly shortens the string (multi-byte
  * sequences collapse), which is the acceptance check; up to 3 layers
  * of double-corruption unwind (each layer shortens, so the loop
  * terminates). Deterministic and pure — replayable by an engine-
  * independent byte-mapping table, which is exactly how the oracle
  * checks it. */
object MojibakeRepair {

  /** SLOPPY cp1252 (ftfy's convention): the 27 defined 0x80–0x9F
    * specials map per the spec, the five UNDEFINED bytes (81 8D 8F
    * 90 9D) map to the same-valued C1 controls instead of failing —
    * real mis-decoders pass those bytes through, and a strict table
    * would refuse to unwind exactly the strings that contain them
    * (e.g. a double-corrupted em dash). Everything else is Latin-1
    * identity. The table IS the definition — no Charset object, so
    * the mapping is engine-portable and spec-citable. */
  private val ByteToChar: Array[Char] = {
    val a = Array.tabulate[Char](256)(_.toChar) // ASCII + Latin-1 + C1
    val specials = Seq(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
      0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
      0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
      0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
      0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
      0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
      0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    specials.foreach { case (b, c) => a(b) = c }
    a
  }
  // inverse as a flat array (all cp1252 codepoints are < U+2200);
  // -1 = not cp1252-encodable
  private val CharToByte: Array[Int] = {
    val a = Array.fill(0x2200)(-1)
    var b = 0
    while (b < 256) {
      val c = ByteToChar(b)
      a(c) = b
      b += 1
    }
    a
  }

  /** `bytes` decoded as sloppy cp1252 — the corruption a mis-decoder
    * applies; exposed so fixtures and specs share the exact table. */
  def corruptDecode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  def fix(s: String): String = {
    var cur = s
    var rounds = 0
    while (rounds < 3) {
      val next = fixOnce(cur)
      if (next eq cur) return cur
      cur = next
      rounds += 1
    }
    cur
  }

  private def fixOnce(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { ascii = s.charAt(i) < 0x80; i += 1 }
    if (ascii) return s // hot path: ASCII cannot be mojibake
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = if (c < 0x2200) CharToByte(c) else -1
      if (b < 0) return s // not cp1252-encodable: never touched
      bytes(i) = b.toByte
      i += 1
    }
    try {
      val r = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .decode(java.nio.ByteBuffer.wrap(bytes)).toString // strict
      if (r.length < s.length) r else s
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }
}

/** [[MojibakeRepair]] as a codegen'd expression — the repair runs in
  * the same WholeStageCodegen span as the rest of the normalization
  * stage (same no-UDF rationale as [[UnicodeNormalize]]). */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      MojibakeRepair.fix(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.MojibakeRepair.fix($x.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level API for text normalization. */
object textnorm {

  /** Repair UTF-8-as-cp1252 mojibake (see [[MojibakeRepair]]). */
  def fixMojibake(text: Column): Column =
    ColumnShim.column(FixMojibake(ColumnShim.expression(text)))

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
