package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Training corpora scraped from the web mix precomposed ("é" U+00E9) and
  * decomposed ("e" + U+0301) encodings of the same text; left unnormalized
  * they defeat exact dedup (different bytes, same rendered text), split
  * token statistics, and inflate vocabulary. NFC canonical composition is
  * the standard fix and Spark has no built-in for it (`regexp_replace`
  * cannot express it), so this is a genuine kernel gap — preference order
  * (a) compose built-ins is impossible, (b) native Expression is this.
  *
  * Cost posture for the 100 TB scan path: real corpora are dominantly
  * ASCII or already-NFC. The kernel short-circuits pure-ASCII inputs on a
  * byte scan (no String materialization, no allocation), answers
  * already-normalized non-ASCII via `Normalizer.isNormalized` (quick-check
  * property walk, still allocation-free on the output side — the input
  * UTF8String is returned as-is), and only pays the full normalize +
  * re-encode for strings that actually change. Semantics match DuckDB's
  * `nfc_normalize` (both implement Unicode canonical composition), which
  * is what lets q62 hash-check this cross-engine.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  // reject non-string children at ANALYSIS time: without this, a
  // mis-typed call passes planning and dies mid-job in codegen/eval
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  // NOT named `eval` — see the note on [[WordShingles.compute]]: the
  // inherited eval(InternalRow) would suppress the static forwarder and
  // silently drop the stage to interpreted mode.
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity on ASCII, and ASCII dominates
    // web corpora — return the input without materializing a String
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
