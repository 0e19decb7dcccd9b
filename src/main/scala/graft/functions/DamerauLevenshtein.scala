package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native UNRESTRICTED Damerau–Levenshtein distance (Lowrance & Wagner
  * 1975) — edits + adjacent transpositions where, unlike the common OSA
  * restriction, a transposed pair may be edited again later ('ca'→'abc'
  * is 2: transpose then insert; OSA says 3). This is the variant DuckDB's
  * `damerau_levenshtein` implements (q172's oracle cross-validates the
  * two implementations value-for-value), and the edit metric record
  * linkage wants when swapped letters are a common error class. Spark
  * ships plain `levenshtein` only.
  *
  * Integer DP over UTF-16 code units with the last-occurrence table —
  * O(|a|·|b|) time, O(|a|·|b|) ints of scratch per row, fully
  * deterministic (no floats anywhere). Why native: data-dependent DP
  * with per-row scratch state is inexpressible as Column algebra;
  * as a codegen'd expression it runs inside the scan like any predicate.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Hard bound on DP cells (la+2)·(lb+2): 4M cells = 16 MB of scratch
    * int per row in flight. The unrestricted variant inherently needs the
    * full matrix (the last-occurrence transposition can reach arbitrarily
    * far back, so no banded/two-row reduction exists) — without a guard,
    * two 100k-char documents allocate ~40 GB inside codegen and OOM the
    * executor. Callers comparing long text should truncate explicitly
    * (`substr`) so the bound they compute under is visible in the plan.
    */
  val MaxCells: Long = 4L * 1000 * 1000

  /** Lowrance–Wagner distance; empty-vs-s is |s|. Hot path (this runs
    * once per candidate pair inside the scan): ONE flat int array for the
    * whole DP, an int[128] last-occurrence table for ASCII with a lazy
    * map fallback for wider chars — no per-cell allocation, no boxing on
    * the common path. Inputs whose DP exceeds [[MaxCells]] fail loudly —
    * a silent null would quietly change linkage results, and a silent
    * truncation would report a wrong distance.
    */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    if ((la + 2L) * (lb + 2L) > MaxCells)
      throw new IllegalArgumentException(
        s"damerau_levenshtein: DP of ${la}x$lb chars exceeds the " +
          s"$MaxCells-cell bound (~16 MB scratch); truncate inputs " +
          "(substr) before comparing document-scale text")
    val inf = la + lb
    val w = lb + 2
    // flat (la+2) x (lb+2) DP with a sentinel row/column of `inf`
    val d = new Array[Int]((la + 2) * w)
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val lastAscii = new Array[Int](128)
    var lastWide: java.util.HashMap[Character, Integer] = null
    def lastOf(c: Char): Int =
      if (c < 128) lastAscii(c)
      else if (lastWide == null) 0
      else { val v = lastWide.get(c); if (v == null) 0 else v.intValue }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = lastOf(b.charAt(j - 1))
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        d((i + 1) * w + j + 1) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      val ca = a.charAt(i - 1)
      if (ca < 128) lastAscii(ca) = i
      else {
        if (lastWide == null) lastWide = new java.util.HashMap[Character, Integer]()
        lastWide.put(ca, i)
      }
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}
