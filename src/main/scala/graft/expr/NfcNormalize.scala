package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression
  * (SURVEY.md §2 B.10 text curation).
  *
  * Web-crawled corpora mix composed (U+00E9) and decomposed
  * (e + U+0301) encodings of the same text, which breaks exact-hash
  * dedup, token counting, and vocabulary construction — every serious
  * curation pipeline canonicalizes to NFC before fingerprinting.
  * Spark has no built-in for this (DuckDB ships `nfc_normalize`), so
  * it is the textbook custom-scalar-Expression case: a per-row JDK
  * `java.text.Normalizer` call, codegen'd so the normalization of a
  * 100 TB corpus stays inside whole-stage codegen rather than paying
  * an interpreted virtual call per row.
  *
  * The fast path matters: `Normalizer.isNormalized` is O(n) with no
  * allocation and virtually all real text is already NFC, so the
  * expensive normalize-with-copy only runs on the rows that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Shared by the interpreted and generated paths. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
