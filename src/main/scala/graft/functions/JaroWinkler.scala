package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (Jaro 1989; Winkler 1990) — the
  * record-linkage string comparator Spark has no built-in for (DuckDB,
  * Postgres/fuzzystrmatch, and every MDM product ship one): match count
  * within the ⌊max(|a|,|b|)/2⌋−1 window, half-transposition discount,
  * then Winkler's common-prefix boost `j + ℓ·0.1·(1−j)` (ℓ ≤ 4) applied
  * only above the 0.7 boost threshold.
  *
  * Variant contract: exactly the RapidFuzz/DuckDB formulation — boost
  * threshold 0.7 INclusive-exclusive as `j > 0.7`, prefix cap 4, weight
  * 0.1, either input empty → 0 (both empty is 0, not 1), transpositions
  * = ⌊unordered-matches/2⌋, and the same operand order in the floating
  * divisions — so `jaro_winkler_similarity` in DuckDB reproduces it
  * bitwise on ASCII inputs (q171's oracle is exactly that; on non-ASCII
  * this implementation compares UTF-16 code units).
  *
  * Why native: the algorithm needs per-row scratch state (the matched
  * flags) and data-dependent loops — inexpressible as built-in Column
  * algebra short of an O(n²) explode — while as a codegen'd expression
  * it runs inside the scan stage like any other predicate.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The RapidFuzz/DuckDB-form similarity in [0, 1]. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: walk both matched sequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // the exact RapidFuzz operand order, so DuckDB replays bitwise
    var sim = (m / la.toDouble + m / lb.toDouble +
      (m - t) / m.toDouble) / 3.0
    if (sim > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      sim += l * 0.1 * (1.0 - sim)
    }
    sim
  }
}
