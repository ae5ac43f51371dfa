package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the two symbol-array kernels every tokenizer trainer
  * and encoder loops over ([[graft.search.BpeVocab]] / WordPiece): the
  * greedy single-merge application and the adjacent-pair enumeration.
  *
  * Why native (r15, guide "per-task work" tier): both were Spark
  * higher-order-function compositions, which are CodegenFallback —
  * evaluated interpreted, per element, with boxed lambdas. The merge fold
  * additionally rebuilt its accumulator ARRAY per element
  * (`concat(slice(acc, ...), array(...))`), O(len²) allocations per word
  * per merge step; a k-merge training run multiplies that by k at
  * distinct-word cardinality, and the sf0.1 profile showed the tokenizer
  * family's hot stages dominated by exactly this churn (q198's top stage
  * 0.66 s on one task with zero I/O). Each kernel here is one linear
  * pass, no intermediate arrays. Semantics are pinned by BpeVocabSpec /
  * WordPieceSpec and the q145/q176/q198/q202-family oracles, which replay
  * the HOF formulation in SQL — bit-identical outputs are the contract.
  */
object BpeSymbols {

  /** Greedy left-to-right non-overlapping application of ONE merge —
    * exact semantics of the replaced fold:
    * `aggregate(syms, [], (acc, s) -> if (last(acc) = left AND s = right)
    * replace-last-with-(left||right) else append s)`, where a null last
    * element, an empty accumulator, or a null incoming symbol all fail
    * the match (three-valued logic routed the fold to `otherwise`) and a
    * non-matching null symbol is APPENDED as null. A null input array
    * yields null (the fold was null-propagating). */
  case class MergeOnceExpr(child: Expression, left: String, right: String)
      extends UnaryExpression {

    private val leftU = UTF8String.fromString(left)
    private val rightU = UTF8String.fromString(right)
    private val mergedU = UTF8String.fromString(left + right)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"merge_once needs array<string>, got $other")
      }

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "merge_once"

    override def nullSafeEval(input: Any): Any =
      BpeSymbols.mergeOnceCompute(input.asInstanceOf[ArrayData], leftU, rightU, mergedU)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // merge symbols as REFERENCE OBJECTS: the generated source is
      // identical for every (left, right), so a k-step training loop
      // compiles this projection once per session, not once per step
      val l = ctx.addReferenceObj("mergeLeft", leftU,
        "org.apache.spark.unsafe.types.UTF8String")
      val r = ctx.addReferenceObj("mergeRight", rightU,
        "org.apache.spark.unsafe.types.UTF8String")
      val m = ctx.addReferenceObj("mergeMerged", mergedU,
        "org.apache.spark.unsafe.types.UTF8String")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.expr.BpeSymbols.mergeOnceCompute($c, $l, $r, $m)")
    }

    override protected def withNewChildInternal(newChild: Expression): MergeOnceExpr =
      copy(child = newChild)
  }

  /** Static so generated code can call it. */
  def mergeOnceCompute(syms: ArrayData, left: UTF8String, right: UTF8String,
                       merged: UTF8String): ArrayData = {
    val n = syms.numElements()
    val buf = new Array[AnyRef](n)
    var len = 0
    var i = 0
    while (i < n) {
      val s = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      if (len > 0 && s != null && right.equals(s) && left.equals(buf(len - 1)))
        buf(len - 1) = merged
      else { buf(len) = s; len += 1 }
      i += 1
    }
    new GenericArrayData(if (len == n) buf else java.util.Arrays.copyOf(buf, len))
  }

  /** Adjacent pairs of a symbol array as `array<struct<l,r>>` — exact
    * semantics of the replaced
    * `when(size(syms) > 1, transform(sequence(1, size-1), i ->
    * struct(syms[i], syms[i+1]))).otherwise([])`: a NULL or short input
    * yields the EMPTY array (the `when` fell through to the constant
    * `otherwise`), and null elements surface as null struct fields. */
  case class SymPairsExpr(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sym_pairs needs array<string>, got $other")
      }

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("l", StringType), StructField("r", StringType))),
      containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "sym_pairs"

    // null input -> empty array, NOT null (the when/otherwise contract)
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) BpeSymbols.EmptyPairs
      else BpeSymbols.symPairsCompute(v.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
            graft.functions.expr.BpeSymbols.EmptyPairs() :
            graft.functions.expr.BpeSymbols.symPairsCompute(${c.value});
        """,
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): SymPairsExpr =
      copy(child = newChild)
  }

  /** Static so generated code can call it (method form for Java). */
  def EmptyPairs(): ArrayData = EmptyPairsVal
  private val EmptyPairsVal: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Static so generated code can call it. */
  def symPairsCompute(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n <= 1) return EmptyPairsVal
    val out = new Array[Any](n - 1)
    var prev: UTF8String = if (syms.isNullAt(0)) null else syms.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      out(i - 1) = InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-codepoint character split — native form of
    * `transform(sequence(1, length(word)), i -> substr(word, i, 1))`:
    * one byte walk over the UTF-8 encoding, one slice per codepoint, no
    * interpreted lambda and no per-element substring scan (the composed
    * substr(i, 1) re-walks the prefix per element — O(n²) per word).
    * Callers only feed non-empty tokens; an empty string yields [] here
    * (the composed form's descending sequence(1, 0) emitted two empty
    * symbols for an input no tokenizer path produces). Null propagates. */
  case class CharSplitExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"char_split needs string, got $other")
      }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "char_split"
    override def nullSafeEval(input: Any): Any =
      BpeSymbols.charSplitCompute(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.expr.BpeSymbols.charSplitCompute($c)")
    override protected def withNewChildInternal(newChild: Expression): CharSplitExpr =
      copy(child = newChild)
  }

  /** Static so generated code can call it. */
  def charSplitCompute(word: UTF8String): ArrayData = {
    val bytes = word.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      out.add(UTF8String.fromBytes(bytes, i, math.min(w, n - i)))
      i += w
    }
    new GenericArrayData(out.toArray)
  }

  /** UTF-8 bytes as uppercase two-char hex symbols — native form of
    * `transform(sequence(1, length(encode(word,'UTF-8'))), bi ->
    * substr(hex(encode(word,'UTF-8')), 2*bi-1, 2))`: one pass over the
    * bytes, no intermediate hex string, no interpreted lambda. Same
    * empty-string note as [[CharSplitExpr]]. Null propagates. */
  case class ByteSplitExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"byte_split needs string, got $other")
      }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "byte_split"
    override def nullSafeEval(input: Any): Any =
      BpeSymbols.byteSplitCompute(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.expr.BpeSymbols.byteSplitCompute($c)")
    override protected def withNewChildInternal(newChild: Expression): ByteSplitExpr =
      copy(child = newChild)
  }

  private val HexDigits = "0123456789ABCDEF".getBytes

  /** Static so generated code can call it. */
  def byteSplitCompute(word: UTF8String): ArrayData = {
    val bytes = word.getBytes
    val out = new Array[AnyRef](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val pair = new Array[Byte](2)
      pair(0) = HexDigits(b >>> 4)
      pair(1) = HexDigits(b & 0xf)
      out(i) = UTF8String.fromBytes(pair)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All substrings of codepoint-lengths 1..maxPieceLen, start-major then
    * length-minor — native form of the Unigram seed enumeration
    * `flatten(transform(sequence(1, len), i -> transform(sequence(1,
    * least(P, len-i+1)), l -> substr(i, l))))`, which was interpreted and
    * re-walked the word per emitted substring. One codepoint-boundary
    * walk, one byte-slice per substring, same order and multiplicity.
    * Null propagates; callers never pass empty words (tokens() filters). */
  case class AllSubstringsExpr(child: Expression, maxPieceLen: Int)
      extends UnaryExpression {
    require(maxPieceLen >= 1, s"all_substrings: maxPieceLen >= 1, got $maxPieceLen")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"all_substrings needs string, got $other")
      }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "all_substrings"
    override def nullSafeEval(input: Any): Any =
      BpeSymbols.allSubstringsCompute(input.asInstanceOf[UTF8String], maxPieceLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.expr.BpeSymbols.allSubstringsCompute($c, $maxPieceLen)")
    override protected def withNewChildInternal(newChild: Expression): AllSubstringsExpr =
      copy(child = newChild)
  }

  /** Static so generated code can call it. */
  def allSubstringsCompute(word: UTF8String, maxPieceLen: Int): ArrayData = {
    val bytes = word.getBytes
    val n = bytes.length
    // codepoint start offsets (+ end sentinel)
    val starts = new Array[Int](n + 1)
    var m = 0
    var i = 0
    while (i < n) {
      starts(m) = i
      m += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(m) = n
    var total = 0
    var s = 0
    while (s < m) { total += math.min(maxPieceLen, m - s); s += 1 }
    val out = new Array[AnyRef](total)
    var o = 0
    s = 0
    while (s < m) {
      val maxL = math.min(maxPieceLen, m - s)
      var l = 1
      while (l <= maxL) {
        out(o) = UTF8String.fromBytes(bytes, starts(s), starts(s + l) - starts(s))
        o += 1
        l += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  def all_substrings(word: Column, maxPieceLen: Int): Column =
    toCol(AllSubstringsExpr(toExpr(word), maxPieceLen))

  def merge_once(syms: Column, left: String, right: String): Column =
    toCol(MergeOnceExpr(toExpr(syms), left, right))

  def sym_pairs(syms: Column): Column = toCol(SymPairsExpr(toExpr(syms)))

  def char_split(word: Column): Column = toCol(CharSplitExpr(toExpr(word)))

  def byte_split(word: Column): Column = toCol(ByteSplitExpr(toExpr(word)))
}
