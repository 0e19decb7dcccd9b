package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-label word-boundary replacement.
  *
  * Sequential `regexp_replace` folds are UNSOUND for this job in both
  * orders: ascending lets a prefix label ("Acme") eat the front of a
  * longer one ("Acme Corp"); longest-first lets a later short label match
  * INSIDE an earlier replacement token (label "2" vs the "2" in
  * "ANON_CLIENT 2"). The only correct shape is one pass: a single
  * alternation ordered longest-first (Java alternation is first-match, so
  * longest wins at each position), emitting each match's token directly —
  * replaced text is never rescanned.
  *
  * Matching is case-insensitive; a match maps to the token of the first
  * (sorted) label sharing its lowercase form. Whole-stage codegen'd via a
  * reference object (the compiled pattern lives on the expression).
  */
case class MultiWordReplace(child: Expression, labels: Seq[String],
                            tokens: Seq[String]) extends UnaryExpression {
  require(labels.nonEmpty && labels.length == tokens.length,
    "labels and tokens must be non-empty and aligned")
  require(labels.forall(l => l != null && l.nonEmpty),
    "empty label would match zero-width at every word boundary")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_word_replace"

  @transient private lazy val pattern: Pattern = {
    val alts = labels.sortBy(l => (-l.length, l)).map(Pattern.quote).mkString("|")
    Pattern.compile(s"(?i)\\b(?:$alts)\\b")
  }

  // Locale.ROOT throughout: default-locale lowercasing (Turkish dotless-ı
  // etc.) would desynchronize the map keys from (?i) matching and throw
  // per row on lookup
  @transient private lazy val tokenByLower: Map[String, String] =
    labels.zip(tokens).sortBy(_._1)
      .foldLeft(Map.empty[String, String]) { case (m, (l, t)) =>
        val k = l.toLowerCase(java.util.Locale.ROOT)
        if (m.contains(k)) m else m + (k -> t)
      }

  def replace(input: UTF8String): UTF8String = {
    val s = input.toString
    val m = pattern.matcher(s)
    if (!m.find()) return input
    val sb = new java.lang.StringBuilder(s.length + 16)
    var last = 0
    do {
      sb.append(s, last, m.start())
      sb.append(tokenByLower(m.group().toLowerCase(java.util.Locale.ROOT)))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(v: Any): Any =
    replace(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiWordReplace", this)
    defineCodeGen(ctx, ev, c => s"$ref.replace($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiWordReplace =
    copy(child = newChild)
}
