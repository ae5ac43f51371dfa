package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token count as a native Catalyst expression: the number of
  * maximal non-whitespace runs, counted in ONE pass over the UTF-8 bytes.
  *
  * Semantically identical to `size(tokens(text))` (SQL trim + lowercase +
  * regex split + filter-empties + size): token count is case-invariant, a
  * non-empty token is exactly a maximal non-`\s` run, and the SQL `trim`
  * in the composed form strips only SPACES (not Java `String.trim`'s
  * <= 0x20 class), which the split + empty-filter already handles — so a
  * boundary control char like U+0001 counts as a token in BOTH forms
  * (pinned in ExpressionsSpec). Run splitting uses Java's regex `\s`
  * class: space, \t, \n, \x0B, \f, \r — all ASCII, so byte-level scanning
  * is correct for any UTF-8 input: multi-byte sequences never contain
  * ASCII-range bytes.
  */
case class TokenCount(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static so generated code can call it. */
  def compute(s: UTF8String): Int = {
    val n = s.numBytes
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val ws = isWs(s.getByte(i))
      if (!ws && !inTok) count += 1
      inTok = !ws
      i += 1
    }
    count
  }

  def token_count(c: Column): Column = toCol(TokenCount(toExpr(c)))
}
