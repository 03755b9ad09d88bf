package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotQ, GzipCompress, GzipDecompress, NormSqQ}

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
      (args: Seq[Expression]) => NormSqQ(args.head)))
}
