package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-class histogram: one code-point pass over the string
  * producing all 28 counts of [[TextFunctions.charEntropy]]'s alphabet
  * (`a`–`z`, space, other) as an `array<long>`.
  *
  * Semantics contract (spec-pinned): element i equals the declarative
  * length-delta form `length(s) − length(translate(s, class_i, ""))` for
  * the 27 literal classes, and element 27 (other) is
  * `length(s) − Σ first 27` — counts are CODE POINTS, exactly like
  * Spark's `length`, so astral-plane characters count once, not twice.
  *
  * Why native: the declarative form re-runs translate-and-measure per
  * class, and the entropy expression references each count several times
  * (guard, weight, remainder-sum) — conditional branches block codegen's
  * subexpression elimination, so the scan pays ~80 string passes per row.
  * This kernel pays ONE.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_class_counts"

  override protected def nullSafeEval(v: Any): Any =
    CharClassCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

object CharClassCounts {
  val NumClasses = 28 // 26 letters + space + other

  // NOT named `eval` — see WordShingles.compute for why.
  def compute(text: UTF8String): ArrayData = {
    val counts = new Array[Long](NumClasses)
    val s = text.toString
    val n = s.length
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val idx =
        if (cp >= 'a' && cp <= 'z') cp - 'a'
        else if (cp == ' ') 26
        else 27
      counts(idx) += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }
}
