package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * first step of dedup-grade text canonicalization: the same visible
  * text can arrive precomposed ("é" U+00E9) or decomposed
  * ("e" + combining acute U+0301) depending on the source's OS/editor/
  * scraper, and every hash-based operator downstream (exact dedup,
  * minhash shingles, line fingerprints) would treat the two as
  * different documents. NFC is the canonical-composition form — the
  * standard choice for equality-sensitive pipelines.
  *
  * Implementation: `java.text.Normalizer` (ICU-equivalent for canonical
  * forms; both it and DuckDB's utf8proc implement the same Unicode
  * canonical composition algorithm, so the q148 oracle replays it with
  * `nfc_normalize`). The fast path: `Normalizer.isNormalized` is O(n)
  * with no allocation and almost always true for real corpora, so the
  * copying normalize pass runs only on the rare decomposed row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
}
