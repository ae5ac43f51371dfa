package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Language identification as a native Catalyst expression.
  *
  * Replaces the reference's spark-nlp `detect_language_220` pipeline
  * (`apps/process_reviews.py:125-127`) with a deterministic stopword-overlap
  * classifier. Semantics: the ISO-639-1 code whose stopword list shares the
  * most DISTINCT tokens with the text; "und" when no list matches. CJK is
  * scored by character containment (no whitespace tokens).
  *
  * Why an expression and not a `Column` composition: the composed form
  * (8 x `array_intersect` against literal arrays + an argmax fold of `when`s)
  * builds a plan tree large enough to push task binaries to ~8 MiB and blow
  * past codegen limits; this single node with a static `compute` keeps the
  * stage inside whole-stage codegen with one virtual call per row.
  */
case class LangId(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.LangId.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** (lang, stopword set) sorted by lang code — ties resolve to the
    * alphabetically first language, deterministically.
    */
  private val wordLists: Array[(String, java.util.HashSet[String])] =
    graft.functions.TextFunctions.stopwords.toSeq.sortBy(_._1)
      .filterNot(_._1 == "zh")
      .map { case (lang, words) =>
        val s = new java.util.HashSet[String]()
        words.foreach(s.add)
        (lang, s)
      }.toArray

  private val zhChars: Array[String] =
    graft.functions.TextFunctions.stopwords("zh").toArray

  private val und = UTF8String.fromString("und")
  private val codes: Array[UTF8String] =
    (wordLists.map(_._1) :+ "zh").map(UTF8String.fromString)

  /** Static so generated code can call it. */
  def compute(text: UTF8String): UTF8String = {
    if (text == null) return und
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val scores = new Array[Int](wordLists.length + 1)
    // distinct-token overlap per language
    val seen = new java.util.HashSet[String]()
    val toks = s.trim.split("\\s+")
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty && seen.add(tok)) {
        var l = 0
        while (l < wordLists.length) {
          if (wordLists(l)._2.contains(tok)) scores(l) += 1
          l += 1
        }
      }
      t += 1
    }
    // zh: distinct character containment
    var z = 0
    var zhScore = 0
    while (z < zhChars.length) {
      if (s.contains(zhChars(z))) zhScore += 1
      z += 1
    }
    scores(wordLists.length) = zhScore

    var best = 0
    var bestIdx = -1
    var i = 0
    while (i < scores.length) {
      if (scores(i) > best) { best = scores(i); bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) und else codes(bestIdx)
  }

  /** Null text classifies as "und" (UnaryExpression null-propagates before
    * `compute` sees the input, hence the coalesce).
    */
  def lang_id(c: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      toCol(LangId(toExpr(c))), org.apache.spark.sql.functions.lit("und"))
}
