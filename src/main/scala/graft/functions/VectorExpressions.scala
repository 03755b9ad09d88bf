package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst vector kernels — SURVEY §7.4 custom-vs-built-in contract,
 * tier (b). The ANN/similarity family (pipeline/Similarity.scala) scores
 * O(|corpus|·|queries|) candidate pairs; with the dot product written as
 * `aggregate(zip_with(a, b, _*_), 0, _+_)` every pair pays two interpreted
 * higher-order functions plus an intermediate array allocation —
 * ArrayTransform/ArrayAggregate are CodegenFallback, so the *hot pair loop*
 * of every top-k/near-dup query drops out of whole-stage codegen. These
 * expressions emit a direct static call into [[VectorKernels]] (a tight
 * primitive `while` loop over the two ArrayData), keeping candidate scoring
 * inside the generated join loop. Semantics are bit-identical to the HOF
 * formulation: integer math (order-independent), null on length mismatch
 * (zip_with pads the shorter side with null → sum null) or any null element.
 */
object VectorKernels {
  /** Integer dot product of two quantized (long) vectors. */
  def dotQ(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Integer squared L2 norm of a quantized (long) vector. */
  def normSqQ(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      acc += v * v
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

private[functions] trait LongArrayInputCheck { self: Expression =>
  protected def checkLongArray(dt: DataType, side: String): Option[String] =
    dt match {
      case ArrayType(LongType, _) => None
      case other => Some(s"$prettyName requires ARRAY<BIGINT> $side, got ${other.sql}")
    }
}

/** Integer dot product of two ARRAY<BIGINT> columns (codegen'd). */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayInputCheck {
  override def prettyName: String = "graft_dotq"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(left.dataType, "left").orElse(checkLongArray(right.dataType, "right"))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotq")
      s"""
        java.lang.Long $r = graft.functions.VectorKernels.dotQ($a, $b);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

/** Integer squared L2 norm of an ARRAY<BIGINT> column (codegen'd). */
case class NormSqQ(child: Expression)
    extends UnaryExpression with LongArrayInputCheck {
  override def prettyName: String = "graft_normsq"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(child.dataType, "input")
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.normSqQ(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("normsq")
      s"""
        java.lang.Long $r = graft.functions.VectorKernels.normSqQ($a);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NormSqQ =
    copy(child = newChild)
}
