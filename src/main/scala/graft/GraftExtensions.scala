package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotQ, GzipCompress, GzipDecompress, NormSqQ,
  WordShingles, WordWindows}

/**
 * SparkSessionExtensions injector — SURVEY §7.4 custom-operator tier (c)
 * registration point. Wire with
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `.withExtensions(new GraftExtensions)`): the native codec expressions
 * become SQL-addressable functions (`graft_gzip`, `graft_gunzip`)
 * resolved by Catalyst like any built-in — codegen'd, null-safe, no UDF
 * registry involvement.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_gzip"),
      new ExpressionInfo(classOf[GzipCompress].getName, "graft_gzip"),
      (args: Seq[Expression]) => GzipCompress(args.head)),
    (FunctionIdentifier("graft_gunzip"),
      new ExpressionInfo(classOf[GzipDecompress].getName, "graft_gunzip"),
      (args: Seq[Expression]) => GzipDecompress(args.head)),
    (FunctionIdentifier("graft_dotq"),
      new ExpressionInfo(classOf[DotQ].getName, "graft_dotq"),
      (args: Seq[Expression]) => DotQ(args(0), args(1))),
    (FunctionIdentifier("graft_normsq"),
      new ExpressionInfo(classOf[NormSqQ].getName, "graft_normsq"),
      (args: Seq[Expression]) => NormSqQ(args.head)),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), literalInt(args, 1, "graft_shingles"))),
    (FunctionIdentifier("graft_word_windows"),
      new ExpressionInfo(classOf[WordWindows].getName, "graft_word_windows"),
      (args: Seq[Expression]) =>
        WordWindows(args(0), literalInt(args, 1, "graft_word_windows"))))

  /** The n-gram width is a plan-build constant for the codegen'd shingle
    * generators — require a literal integer second argument. */
  private def literalInt(args: Seq[Expression], i: Int, fn: String): Int =
    args.lift(i) match {
      case Some(Literal(v: Int, _)) => v
      case other => throw new IllegalArgumentException(
        s"$fn requires a literal integer n as argument ${i + 1}, got $other")
    }
}
