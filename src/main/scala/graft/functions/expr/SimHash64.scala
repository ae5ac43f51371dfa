package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of an `array<string>` feature column (tokens or shingles).
  *
  * Near-duplicate fingerprint: documents whose feature sets mostly overlap
  * produce hashes within a small Hamming distance. Implemented as a native
  * Catalyst expression with `doGenCode` so it stays inside whole-stage
  * codegen — a Scala UDF here would force a serialization boundary per row,
  * which at 100 TB is the difference between a scan-bound and a CPU-bound
  * stage. (Replaces nothing in the reference — new training-data scope; see
  * SURVEY.md §7 step 8.)
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** FNV-1a 64-bit over the element's UTF-8 bytes (public-domain spec).
    * Chosen over xxhash64 deliberately: FNV-1a is a short byte fold that an
    * external SQL engine can recompute (the q25 DuckDB oracle re-derives
    * every signature from raw text), making the whole simhash pipeline
    * cross-engine verifiable; for the short tokens/shingles fed to a
    * sketch the speed difference vs xxhash is noise.
    */
  def fnv1a64(s: UTF8String): Long = {
    var h = 0xCBF29CE484222325L
    var j = 0
    val n = s.numBytes
    while (j < n) {
      h = (h ^ (s.getByte(j) & 0xFFL)) * 0x100000001B3L
      j += 1
    }
    h
  }

  /** FNV-1a hash each element; each hash votes its 64 bits +1/-1; sign of
    * the per-bit tally is the output bit. Static so generated code can
    * call it.
    */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
}
