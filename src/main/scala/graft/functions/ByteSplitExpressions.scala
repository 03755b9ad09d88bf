package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/**
 * Binary-safe SplitContent kernel — SURVEY §7.4 tier (b). The text-mode
 * splitContent (`split` + `transform`) operates on STRING content, which
 * corrupts arbitrary bytes (0xFF is not valid UTF-8); the reference's
 * default Byte Sequence Format is HEXADECIMAL over raw bytes
 * (SplitContent.h:40-49). This expression scans the byte array directly:
 * left-to-right non-overlapping delimiter matches (SplitContentTests.cpp
 * "SmallSplits": FFFF over FF FF FF consumes the first two, the third is
 * payload), keep-mode append/prepend, empty fragments dropped.
 */
object ByteSplitKernels {
  def splitBytes(content: Array[Byte], delim: Array[Byte],
                 keep: Boolean, leading: Boolean): ArrayData = {
    if (delim.isEmpty) return new GenericArrayData(Array[Any](content))
    // left-to-right non-overlapping match offsets
    val matches = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i <= content.length - delim.length) {
      var j = 0
      while (j < delim.length && content(i + j) == delim(j)) j += 1
      if (j == delim.length) { matches += i; i += delim.length }
      else i += 1
    }
    // raw parts between matches (incl. empty leading/trailing/mid parts)
    val bounds = (-delim.length +: matches.toSeq) :+ content.length
    val parts: Seq[Array[Byte]] = bounds.sliding(2).map { w =>
      java.util.Arrays.copyOfRange(content, w.head + delim.length, w.last)
    }.toSeq
    val lastIdx = parts.length - 1
    val assembled: Seq[Array[Byte]] =
      if (!keep) parts
      else if (leading) parts.zipWithIndex.map { case (p, k) =>
        if (k > 0) delim ++ p else p
      }
      else parts.zipWithIndex.map { case (p, k) =>
        if (k < lastIdx) p ++ delim else p
      }
    new GenericArrayData(
      assembled.filter(_.nonEmpty).map(_.asInstanceOf[Any]).toArray)
  }
}

/** Split BINARY content on a byte sequence (codegen'd); `keep`/`leading`
  * mirror Keep Byte Sequence and Byte Sequence Location. */
case class SplitByteSequence(child: Expression, delim: Array[Byte],
                             keep: Boolean, leading: Boolean)
    extends UnaryExpression {
  override def prettyName: String = "graft_split_bytes"
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(c: Any): Any =
    ByteSplitKernels.splitBytes(c.asInstanceOf[Array[Byte]], delim, keep, leading)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val delimRef = ctx.addReferenceObj("delim", delim, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteSplitKernels.splitBytes($c, $delimRef, $keep, $leading);")
  }

  override protected def withNewChildInternal(newChild: Expression): SplitByteSequence =
    copy(child = newChild)
}
