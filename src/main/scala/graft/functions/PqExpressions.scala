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

object CentroidKernels {
  /** round(x, 6) exactly as Spark's Round(DoubleType, HALF_UP):
    * BigDecimal.valueOf (the canonical Double.toString value) → setScale. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /**
   * argmax_j round(cos(vec, cent_j), 6) over a FLAT centroid layout,
   * ties to the smallest index — the kernel form of the k-means-family
   * assignment `array_min(transform(cents, struct(-round(cos),cent)))`.
   * BIT-IDENTICAL to that formulation PROVIDED the centroid arrays are
   * sorted by cent id ascending (then smallest-index tie = smallest-cent
   * tie, the struct-min order). The cosine replays cosineFromQ exactly:
   * dot / (sqrt(max(na,1))·sqrt(max(nb,1))) with the 6-decimal HALF_UP
   * round. Cost control: a candidate whose RAW cosine sits more than
   * 1.1e-6 below the best ROUNDED cosine cannot round at or above it
   * (rounding moves a value by ≤ 5e-7 + ulp), so only near-winners pay
   * the BigDecimal — the common element is one dot product and one
   * compare.
   */
  def argMaxCos6(vec: ArrayData, centsFlat: ArrayData,
                 centNorms: ArrayData): java.lang.Integer = {
    val dim = vec.numElements()
    val k = centNorms.numElements()
    if (dim == 0 || k == 0 || centsFlat.numElements() != k * dim) return null
    var na = 0L
    var i = 0
    while (i < dim) { val v = vec.getLong(i); na += v * v; i += 1 }
    val sa = Math.sqrt(Math.max(na, 1L).toDouble)
    var best = Double.NegativeInfinity
    var bj = -1
    var j = 0
    while (j < k) {
      var dot = 0L
      i = 0
      val off = j * dim
      while (i < dim) { dot += vec.getLong(i) * centsFlat.getLong(off + i); i += 1 }
      val raw = dot.toDouble /
        (sa * Math.sqrt(Math.max(centNorms.getLong(j), 1L).toDouble))
      if (raw + 1.1e-6 > best) {
        val r = round6(raw)
        if (r > best) { best = r; bj = j }
      }
      j += 1
    }
    Integer.valueOf(bj)
  }
}

/** Centroid-assignment argmax over a flat centroid table (codegen'd):
  * returns the winning centroid INDEX (0-based), null on shape mismatch.
  * The centroid arrays MUST be sorted by cent id — see
  * [[CentroidKernels.argMaxCos6]]'s tie-break contract. */
case class ArgMaxCos6Q(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with LongArrayInputCheck {
  override def prettyName: String = "graft_argmax_cos6"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(first.dataType, "vector")
      .orElse(checkLongArray(second.dataType, "flat centroids"))
      .orElse(checkLongArray(third.dataType, "centroid norms"))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    CentroidKernels.argMaxCos6(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val r = ctx.freshName("argmaxcos")
      s"""
        java.lang.Integer $r = graft.functions.CentroidKernels.argMaxCos6($a, $b, $c);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ArgMaxCos6Q =
    copy(first = newFirst, second = newSecond, third = newThird)
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
