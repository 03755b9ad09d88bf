package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Native PQ (product-quantization) kernels — SURVEY §7.4 tier (b), the
 * same rationale as [[VectorKernels]]: the PQ encode/training argmin
 * scores every (row, subspace) against k codewords, and the former
 * `array_min(transform(codewords, struct(dist, j)))` formulation paid an
 * interpreted higher-order function PLUS a struct allocation per
 * codeword per row — measured dominating the production IVFADC row
 * (m=16, k=256: ~82M codeword evaluations per corpus pass; the literal-
 * codeword variant additionally crashed Janino outright at
 * m·k·subDim = 2048). These kernels take the codebook as FLAT primitive
 * arrays (all k codewords concatenated + their k precomputed norms) and
 * run two nested primitive loops — no allocation, no per-element
 * interpretation, bit-identical integer math with ties to the smallest
 * code index (exactly the (dist, j) struct-min order).
 */
object PqKernels {
  /** argmin_j (cn[j] − 2·dot(sv, cw[j·sub..])) — the L2 argmin with the
    * query-independent |sv|² term dropped (argmin- and tie-preserving
    * under a constant shift). Ties break to the smallest j. */
  def pqArgMin(sv: ArrayData, cwFlat: ArrayData, cn: ArrayData): java.lang.Integer = {
    val sub = sv.numElements()
    val k = cn.numElements()
    if (sub == 0 || k == 0 || cwFlat.numElements() != k * sub) return null
    var best = Long.MaxValue
    var bj = -1
    var j = 0
    while (j < k) {
      var dot = 0L
      var i = 0
      val off = j * sub
      while (i < sub) {
        dot += sv.getLong(i) * cwFlat.getLong(off + i)
        i += 1
      }
      val d = cn.getLong(j) - 2L * dot
      if (d < best) { best = d; bj = j }
      j += 1
    }
    Integer.valueOf(bj)
  }

  /** The per-query ADC table for one subspace: dot(sv, cw[j]) for every
    * codeword j, as one primitive long array. */
  def pqAdc(sv: ArrayData, cwFlat: ArrayData): ArrayData = {
    val sub = sv.numElements()
    if (sub == 0 || cwFlat.numElements() % sub != 0) return null
    val k = cwFlat.numElements() / sub
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var dot = 0L
      var i = 0
      val off = j * sub
      while (i < sub) {
        dot += sv.getLong(i) * cwFlat.getLong(off + i)
        i += 1
      }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codeword argmin over a flat codebook (codegen'd): returns the winning
  * code index as INT, null if the codebook shape is inconsistent. */
case class PqArgMinQ(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with LongArrayInputCheck {
  override def prettyName: String = "graft_pq_argmin"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(first.dataType, "subvector")
      .orElse(checkLongArray(second.dataType, "flat codebook"))
      .orElse(checkLongArray(third.dataType, "codeword norms"))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqKernels.pqArgMin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val r = ctx.freshName("pqargmin")
      s"""
        java.lang.Integer $r = graft.functions.PqKernels.pqArgMin($a, $b, $c);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqArgMinQ =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Per-subspace ADC table (codegen'd): array of dot(sv, codeword_j). */
case class PqAdcQ(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayInputCheck {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(left.dataType, "subvector")
      .orElse(checkLongArray(right.dataType, "flat codebook"))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("pqadc")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.PqKernels.pqAdc($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcQ =
    copy(left = newLeft, right = newRight)
}
