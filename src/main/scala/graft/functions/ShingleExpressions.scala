package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word n-gram generators — SURVEY §7.4 tier (b). `Dedup.shingles` /
 * `Dedup.wordWindows` were `transform(sequence(...), i =>
 * array_join(slice(split(text, " "), ...), " "))`: four nested
 * CodegenFallback higher-order functions that tokenize the text into an
 * array, then re-join every shingle into a fresh string — O(tokens·n)
 * allocation per document, interpreted. Every operator of the dedup /
 * fingerprint / decontamination family funnels EVERY token of EVERY
 * document through that path, so at corpus scale it is the map-side hot
 * loop.
 *
 * Because the separator is a single space and `split` preserves empty
 * fields, each word n-gram is exactly a SUBSTRING of the original text
 * between two word boundaries. The kernels scan the UTF-8 bytes once for
 * space positions (0x20 never occurs inside a multi-byte UTF-8 sequence)
 * and emit zero-copy `UTF8String.fromBytes` slices over the shared byte
 * array — no tokenization array, no per-shingle string building, inside
 * whole-stage codegen via a static call.
 */
object ShingleKernels {
  /** Byte positions of the 0x20 separators in `b`. */
  private def spacePositions(b: Array[Byte]): Array[Int] = {
    var spaces = 0
    var i = 0
    while (i < b.length) { if (b(i) == ' ') spaces += 1; i += 1 }
    val pos = new Array[Int](spaces)
    var j = 0
    i = 0
    while (i < b.length) { if (b(i) == ' ') { pos(j) = i; j += 1 }; i += 1 }
    pos
  }

  /** Overlapping word n-grams (stride 1); texts shorter than `n` words
    * yield the whole text as the single shingle — identical to the
    * `when(size(words) >= n, ...).otherwise(array(text))` formulation. */
  def wordShingles(t: UTF8String, n: Int): ArrayData = {
    val b = t.getBytes
    val pos = spacePositions(b)
    val numWords = pos.length + 1
    if (numWords < n) return new GenericArrayData(Array[Any](t))
    val out = new Array[Any](numWords - n + 1)
    var k = 0
    while (k < out.length) {
      val start = if (k == 0) 0 else pos(k - 1) + 1
      val end = if (k + n == numWords) b.length else pos(k + n - 1)
      out(k) = UTF8String.fromBytes(b, start, end - start)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping word windows (stride n): ceil(words/n) chunks, the
    * last one short — identical to the transform/slice formulation. */
  def wordWindows(t: UTF8String, n: Int): ArrayData = {
    val b = t.getBytes
    val pos = spacePositions(b)
    val numWords = pos.length + 1
    val chunks = (numWords + n - 1) / n
    val out = new Array[Any](chunks)
    var c = 0
    while (c < chunks) {
      val firstWord = c * n
      val lastWord = math.min(firstWord + n - 1, numWords - 1)
      val start = if (firstWord == 0) 0 else pos(firstWord - 1) + 1
      val end = if (lastWord == numWords - 1) b.length else pos(lastWord)
      out(c) = UTF8String.fromBytes(b, start, end - start)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** NULL text maps to a single-null array in the SHINGLE formulation
    * (`when` on a null size falls to the otherwise branch, whose array_join
    * of a null words array is null, wrapped in array()); the WINDOW
    * formulation instead propagates NULL (transform over a null sequence). */
  val NullSingleton: ArrayData = new GenericArrayData(Array[Any](null))
}

private[functions] abstract class ShingleExpression extends UnaryExpression {
  protected def n: Int
  /** fully-qualified static kernel emitted into generated code */
  protected def kernel: String
  protected def evalKernel(t: UTF8String): ArrayData

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  // never NULL: a null text yields the HOF formulation's [null] singleton
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) ShingleKernels.NullSingleton
    else evalKernel(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
          graft.functions.ShingleKernels.NullSingleton() :
          $kernel(${c.value}, $n);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }
}

/** Overlapping word n-gram shingles of a text column (codegen'd). */
case class WordShingles(child: Expression, n: Int) extends ShingleExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String = "graft_shingles"
  override protected val kernel = "graft.functions.ShingleKernels.wordShingles"
  override protected def evalKernel(t: UTF8String): ArrayData =
    ShingleKernels.wordShingles(t, n)
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Non-overlapping fixed-size word windows of a text column (codegen'd).
  * Unlike [[WordShingles]], NULL text propagates to NULL — matching the
  * historical `transform(sequence(...))` formulation it replaces. */
case class WordWindows(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "window size must be >= 1")
  override def prettyName: String = "graft_word_windows"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(t: Any): Any =
    ShingleKernels.wordWindows(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.wordWindows($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordWindows =
    copy(child = newChild)
}
