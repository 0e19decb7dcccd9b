package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native CHARACTER n-gram shingling: every stride-1 window of `n`
  * Unicode code points, as an array column.
  *
  * Semantics contract (must equal what the DuckDB oracles compute):
  * shingle i (0-based) is `substr(text, i + 1, n)` in CHARACTER
  * indexing — code points, not bytes — for i in 0 .. numChars − n;
  * fewer than n characters → empty array. This is the window set under
  * [[graft.operators.Dedup.charDuplicateSpans]], the suffix-array-
  * equivalent exact-substring dedup (Lee et al. 2022).
  *
  * One pass over the bytes records each character's byte offset (UTF-8
  * lead bytes are `(b & 0xC0) != 0x80`), then each shingle is one
  * bounded byte-range copy — no per-window character re-scan, which is
  * what the declarative `transform(sequence(...), i -> substr(...))`
  * form would do (substr from a string head is O(i), making the row
  * O(len²); this kernel is O(len · bytes-per-window)).
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"

  override protected def nullSafeEval(v: Any): Any =
    CharShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  private val Empty = new GenericArrayData(Array.empty[Any])

  // NOT named `eval` — same static-forwarder trap as WordShingles:
  // the inherited eval(InternalRow) would suppress the companion's
  // forwarder and silently drop the stage to interpreted mode.
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // byte offset of each character; one trailing sentinel = len
    var chars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) chars += 1; i += 1 }
    if (chars < n) return Empty
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = len
    val out = new Array[Any](chars - n + 1)
    var s = 0
    while (s <= chars - n) {
      val from = starts(s)
      out(s) = UTF8String.fromBytes(bytes, from, starts(s + n) - from)
      s += 1
    }
    new GenericArrayData(out)
  }
}
