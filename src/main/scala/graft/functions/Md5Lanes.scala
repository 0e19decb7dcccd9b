package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** MD5 digest as four big-endian unsigned 32-bit lanes (`array<long>`).
  *
  * The engine's oracle-portable hash paths are all defined as nibble
  * ranges of the MD5 hex digest — `conv(substring(md5(x), a, n), 16, 10)`
  * — because any engine can replay that. But evaluated literally, every
  * lane pays: one digest, one 32-char hex string allocation, a substring,
  * and a base-16 string parse. This kernel computes the digest ONCE and
  * returns the four lanes as longs directly from the digest bytes —
  * bit-identical to the hex round-trip (lane i = hex chars [8i+1, 8i+8]
  * read base 16) with zero string work. Consumers pick lanes with
  * `element_at`; whole-stage codegen's subexpression elimination shares
  * one `compute` call across all lanes of the same input, which is what
  * makes the 16-permutation MinHash signature cost 4 digests per posting
  * row instead of 16 hex round-trips.
  *
  * The MessageDigest instance is thread-local: codegen calls this in a
  * tight per-row loop and `MessageDigest.getInstance` per row is an
  * allocation + provider lookup the loop cannot afford.
  */
case class Md5Lanes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_lanes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_lanes needs a binary child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    Md5Lanes.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Lanes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)
}

object Md5Lanes {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  // NOT named `eval` — see the note on [[WordShingles.compute]].
  def compute(bytes: Array[Byte]): ArrayData = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    val out = new Array[Any](4)
    var i = 0
    while (i < 4) {
      out(i) = ((dig(4 * i) & 0xffL) << 24) |
        ((dig(4 * i + 1) & 0xffL) << 16) |
        ((dig(4 * i + 2) & 0xffL) << 8) |
        (dig(4 * i + 3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }
}
