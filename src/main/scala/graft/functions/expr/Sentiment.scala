package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lexicon sentiment scorer as a native Catalyst expression.
  *
  * Replaces the reference's spark-nlp `analyze_sentimentdl_use_imdb`
  * pipeline (`apps/process_reviews.py:133-135`). Output domain is exactly
  * the reference's {pos, neg, n/a} (`README.md:259-260`): distinct-token
  * hit counts against positive/negative word lists; `n/a` on null/blank
  * text or a tie.
  */
case class Sentiment(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "sentiment"

  override def nullSafeEval(input: Any): Any =
    Sentiment.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.Sentiment.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Sentiment =
    copy(child = newChild)
}

object Sentiment {

  private def toSet(words: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }
  private val pos = toSet(graft.functions.TextFunctions.positiveWords)
  private val neg = toSet(graft.functions.TextFunctions.negativeWords)

  private val POS = UTF8String.fromString("pos")
  private val NEG = UTF8String.fromString("neg")
  private val NA = UTF8String.fromString("n/a")

  /** Static so generated code can call it. */
  def compute(text: UTF8String): UTF8String = {
    if (text == null) return NA
    val s = text.toString.trim
    if (s.isEmpty) return NA
    val toks = s.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val seen = new java.util.HashSet[String]()
    var p = 0
    var n = 0
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      if (tok.nonEmpty && seen.add(tok)) {
        if (pos.contains(tok)) p += 1
        else if (neg.contains(tok)) n += 1
      }
      i += 1
    }
    if (p > n) POS else if (n > p) NEG else NA
  }

  /** Null text scores "n/a" (UnaryExpression null-propagates before
    * `compute` sees the input, hence the coalesce).
    */
  def sentiment_label(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      toCol(Sentiment(toExpr(c))), org.apache.spark.sql.functions.lit("n/a"))
}
