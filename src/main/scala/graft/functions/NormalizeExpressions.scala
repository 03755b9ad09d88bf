package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native codegen'd expression — the
 * canonical first stage of the published corpus-cleaning recipes
 * (SlimPajama, Soboleva 2023: "NFC normalization" before the length
 * filter and MinHash dedup; CCNet applies the same canonicalization in
 * its preprocessing).
 *
 * Spark has no builtin for this, and a Scala UDF would force
 * UTF8String→String→UTF8String conversion plus serialization overhead on
 * EVERY document of a 100 TB corpus. The kernel instead:
 *
 *  - ASCII fast path: a single byte scan — ASCII is closed under NFC
 *    (no combining sequences, no compatibility forms), so a pure-ASCII
 *    document returns the INPUT UTF8String untouched, zero-copy. Web
 *    corpora are dominantly ASCII at the byte level, so the common case
 *    allocates nothing.
 *  - Non-ASCII: `java.text.Normalizer` (ICU-equivalent UAX #15
 *    implementation in the JDK) with a redundant-copy guard when the
 *    text was already in NFC.
 *
 * The whole call stays inside whole-stage codegen via a static kernel
 * call, like [[ShingleKernels]].
 *
 * Oracle parity: DuckDB's `nfc_normalize(text)` implements the same
 * UAX #15 canonical composition, so results are byte-identical and the
 * stage is externally pinnable.
 */
object NormalizeKernels {
  def nfc(t: UTF8String): UTF8String = {
    val b = t.getBytes
    var i = 0
    while (i < b.length) {
      if (b(i) < 0) { // multi-byte UTF-8 lead/continuation → slow path
        val s = t.toString
        val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        return if (n == s) t else UTF8String.fromString(n)
      }
      i += 1
    }
    t // pure ASCII: NFC-invariant, zero-copy
  }
}

/** NFC-normalize a string column (codegen'd; NULL propagates). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(t: Any): Any =
    NormalizeKernels.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeKernels.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
