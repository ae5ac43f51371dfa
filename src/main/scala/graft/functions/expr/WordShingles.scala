package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of normalized text (lowercase, split on
  * whitespace, empties dropped; consecutive n-tuples joined by one space;
  * first-occurrence order) as a native one-pass Catalyst expression.
  *
  * The built-in composition (`transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i+1, n)))`) re-evaluates the `tokens` subtree — a regex
  * split plus a filter lambda — on every one of the ~|tokens| iterations
  * per row, because lambda bodies don't cache invariant subtrees. One
  * tokenization per row here. Semantics match the DuckDB oracle exactly
  * (set equality; see q26_ngram_jaccard).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with ImplicitCastInputTypes {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val empty = new GenericArrayData(Array.empty[Any])

  /** Static so generated code can call it. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return empty
    val toks0 = text.toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var m = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) m += 1; i += 1 }
    if (m < n) return empty
    val toks = if (m == toks0.length) toks0 else toks0.filter(_.nonEmpty)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Null text yields an empty array (matching the composed
    * `when(...).otherwise(array())` form) — UnaryExpression null-propagates
    * before `compute` sees the input, hence the coalesce.
    */
  def word_shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      toCol(WordShingles(toExpr(text), n)),
      org.apache.spark.sql.functions.array().cast("array<string>"))
}

/** Distinct CHARACTER n-gram shingles of normalized text (lowercase,
  * whitespace runs collapsed to one space) — one pass, same rationale as
  * [[WordShingles]].
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression
    with ImplicitCastInputTypes {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.CharShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {

  private val empty = new GenericArrayData(Array.empty[Any])

  /** Static so generated code can call it. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return empty
    val norm = text.toString.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    if (norm.length < n) {
      if (norm.isEmpty) return empty
      return new GenericArrayData(Array[Any](UTF8String.fromString(norm)))
    }
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= norm.length - n) {
      seen.add(norm.substring(i, i + n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  def char_shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      toCol(CharShingles(toExpr(text), n)),
      org.apache.spark.sql.functions.array().cast("array<string>"))
}
