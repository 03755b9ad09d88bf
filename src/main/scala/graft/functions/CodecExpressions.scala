package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/**
 * Native Catalyst codec expressions — SURVEY §7.4 custom-vs-built-in
 * contract, tier (b): where a primitive is missing (CompressContent's
 * per-row codec, CompressContent.cpp:68), a codegen'd `Expression`
 * beats a Scala UDF — `doGenCode` emits a direct static call into
 * [[Codecs]], so the value stays inside the whole-stage-generated loop
 * with no UDF closure dispatch or encoder round trip, and null handling
 * is the engine's own null-safe branch.
 */
abstract class CodecExpression extends UnaryExpression {
  override def dataType: DataType = BinaryType
  /** fully-qualified static method emitted into generated code */
  protected def kernel: String

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[Array[Byte]])
  protected def evalKernel(b: Array[Byte]): Array[Byte]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernel($c)")
}

case class GzipCompress(child: Expression) extends CodecExpression {
  override def prettyName: String = "graft_gzip"
  override protected val kernel = "graft.functions.Codecs.gzip"
  override protected def evalKernel(b: Array[Byte]): Array[Byte] = Codecs.gzip(b)
  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
}

case class GzipDecompress(child: Expression) extends CodecExpression {
  override def prettyName: String = "graft_gunzip"
  override protected val kernel = "graft.functions.Codecs.gunzip"
  override protected def evalKernel(b: Array[Byte]): Array[Byte] = Codecs.gunzip(b)
  override protected def withNewChildInternal(newChild: Expression): GzipDecompress =
    copy(child = newChild)
}

/** Total gunzip: corrupt input yields NULL instead of a task-killing
  * exception, so callers can route the reference's decompress `failure`
  * relationship (CompressContentTests.cpp:681 invalid-archive case).
  * Needs nullable codegen — the strict CodecExpression's defineCodeGen
  * assumes a non-null kernel result. */
case class GzipTryDecompress(child: Expression) extends CodecExpression {
  override def prettyName: String = "graft_try_gunzip"
  override protected val kernel = "graft.functions.Codecs.tryGunzip"
  override protected def evalKernel(b: Array[Byte]): Array[Byte] = Codecs.tryGunzip(b)
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $kernel($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): GzipTryDecompress =
    copy(child = newChild)
}
