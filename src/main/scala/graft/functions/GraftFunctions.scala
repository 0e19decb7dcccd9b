package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the BLAKE2b pseudonym hash.
  *
  * A `udf()` would box every row (String <-> UTF8String copies + closure
  * dispatch); a native expression with `doGenCode` keeps the call inside
  * whole-stage codegen as one static invocation on UTF8String, which matters
  * on the 100 TB uid-pseudonymization path (SURVEY.md §7.5).
  */
case class Blake2bExpr(child: Expression, digestSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "blake2b_hex"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    UTF8String.fromString(Blake2b.hexDigest(s.getBytes, digestSize))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Blake2b.hexDigest($c.getBytes(), $digestSize))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bExpr =
    copy(child = newChild)
}

/** Column-level entry points for graft's custom functions. */
object GraftFunctions {

  /** blake2b(digest_size) hex digest of a string column — the reference's
    * uid pseudonym is `blake2b_hex(c, 5)` (10 hex chars).
    */
  def blake2b_hex(c: Column, digestSize: Int = 5): Column =
    org.apache.spark.sql.GraftShim.column(
      Blake2bExpr(expression(c), digestSize))

  /** Cosine similarity between an array<float|double> column and a constant
    * query vector, computed as codegen'd higher-order functions (no UDF):
    * dot(a,q) / (norm(a) * norm(q)).
    */
  def cosine_sim(vec: Column, query: Array[Double]): Column = {
    val q = lit(query)
    val dot = aggregate(
      zip_with(vec, q, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    val normA = sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val normQ = math.sqrt(query.map(x => x * x).sum)
    dot / (normA * lit(normQ))
  }

  /** Dot product of two array columns (double arithmetic). */
  def dot_product(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an array column. */
  def l2_norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.GraftShim.expression(c)
}
