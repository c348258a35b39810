package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the first cleaning pass every
  * training-data pipeline applies before tokenizing or hashing
  * (CCNet/C4-style): Unicode NFC composition, ASCII control-character
  * removal (U+0000–U+001F, U+007F), whitespace-run collapse, and
  * edge trim.
  *
  * Semantics are defined as the exact sequence
  * `trim(collapse(stripControls(nfc(s))), ' ')`, which both engines of
  * the correctness gate can express identically: after the control
  * strip, the only remaining character of the RE2/Java-ASCII `\s` class
  * is the literal space (tab/LF/VT/FF/CR are all controls), so the
  * collapse step is a plain `' '+ → ' '` in both dialects, and the trim
  * is space-only (DuckDB's bare `trim` also eats U+00A0 — the oracle
  * must pass an explicit `' '` trim set; Unicode spaces like NBSP are
  * deliberately preserved by BOTH engines under these semantics).
  */
object TextNorm {

  /** Static entry point shared by interpreted eval and generated code
    * (this object deliberately has no companion class, so Scala emits
    * static forwarders and Janino can call
    * `graft.functions.TextNorm.normalize(...)` directly).
    */
  def normalize(s: UTF8String): UTF8String = {
    // Zero-copy fast path: pure ASCII with no controls, no doubled
    // spaces, no edge spaces is NFC-invariant and already normal — the
    // overwhelmingly common case on a cleaned corpus, and the one that
    // matters at 100 TB (no String materialization, no allocation).
    val nb = s.numBytes
    var i = 0
    var clean = true
    while (clean && i < nb) {
      val b = s.getByte(i)
      if (b < 0x20 || b == 0x7f) clean = false // controls AND non-ASCII (b<0)
      else if (b == ' ') {
        if (i == 0 || i == nb - 1 || (i + 1 < nb && s.getByte(i + 1) == ' '))
          clean = false
      }
      i += 1
    }
    if (clean) return s

    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    var j = 0
    while (j < n) {
      val c = nfc.charAt(j)
      if (c < 0x20 || c == 0x7f) {
        // control: dropped; a space run interrupted by controls is
        // still one run (strip-then-collapse order)
      } else if (c == ' ') {
        pendingSpace = true
      } else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        started = true
        pendingSpace = false
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** `normalized($"text")` — the column-level entry point. */
  def normalized(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))
}

/** The Catalyst expression tier (SURVEY §4 custom-operator taxonomy,
  * same rung as F1): `doGenCode` emits a single static call, so the
  * projection stays inside whole-stage codegen — no UDF boundary, no
  * serialization, null handling inherited from `UnaryExpression`.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression {

  // ExpectsInputTypes is unusable outside org.apache.spark.sql
  // (AbstractDataType is sql-private), so type-check by hand
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs a string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")

  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}
