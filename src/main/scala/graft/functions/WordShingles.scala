package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling over a single-space-tokenized text column.
  *
  * Semantics contract (must equal the declarative form
  * `transform(sequence(...), i -> concat_ws(' ', slice(split(text,' '), i, n)))`
  * so the DuckDB oracles hold): tokens are `split(text, " ")` with empty
  * tokens preserved; shingle i is tokens i..i+n−1 joined by one space;
  * fewer than n tokens → empty array.
  *
  * Because the split pattern is the literal single space, every shingle is
  * a CONTIGUOUS BYTE SPAN of the original string (the text is exactly
  * token₀ + ' ' + token₁ + ...), so the kernel makes one pass to find
  * space offsets and one bounded copy per shingle — no token array, no
  * sequence array, no per-shingle slice array, no concat buffer. The
  * 0x20 byte never occurs inside a multi-byte UTF-8 sequence, so byte
  * scanning is UTF-8-safe. This sits under every shingle-based dedup
  * operator, which is the hottest non-relational path in the engine.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Empty = new GenericArrayData(Array.empty[Any])

  // NOT named `eval`: the case class inherits eval(InternalRow), which
  // suppresses the companion's static forwarder — generated code calling
  // WordShingles.eval(UTF8String, int) then fails to compile and the whole
  // stage silently drops to interpreted mode (CodegenSpec guards this)
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes // materializes once; spans index into it
    val len = bytes.length
    // token start offsets: 0 and every position after a space byte
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val numTokens = spaces + 1
    if (numTokens < n) return Empty
    val starts = new Array[Int](numTokens + 1) // sentinel: starts(numTokens) = len + 1
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numTokens) = len + 1
    val out = new Array[Any](numTokens - n + 1)
    var s = 0
    while (s <= numTokens - n) {
      val from = starts(s)
      val until = starts(s + n) - 1 // up to the space before token s+n (or len)
      out(s) = UTF8String.fromBytes(bytes, from, until - from)
      s += 1
    }
    new GenericArrayData(out)
  }
}
