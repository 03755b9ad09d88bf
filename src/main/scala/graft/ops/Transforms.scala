package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.FlowFrame
import graft.el.ElCompiler

/**
 * Projection / scalar-transform operators — SURVEY §2.4.
 *
 * All pure Catalyst column expressions (whole-stage codegen); content-free
 * operators never reference the `content` column so Parquet column pruning
 * keeps them metadata-only at 100 TB (FlowFrame scale note).
 */
object Transforms {

  /**
   * UpdateAttribute (UpdateAttribute.cpp:37): dynamic properties
   * (name → EL template) always overwrite attributes.
   */
  def updateAttribute(df: DataFrame, props: Seq[(String, String)],
                      attrs: ElCompiler.AttrResolver = ElCompiler.flowAttrs): DataFrame =
    FlowFrame.withAttrs(df, props.map { case (k, el) => k -> ElCompiler.template(el, attrs) })

  /**
   * ExtractText (ExtractText.cpp:45): run regexes over content; capture
   * group g of pattern p → attribute `name` (convention `name`, `name.N`).
   */
  def extractText(df: DataFrame, contentCol: Column,
                  patterns: Seq[(String, String, Int)]): DataFrame =
    FlowFrame.withAttrs(df, patterns.map { case (name, pat, group) =>
      name -> regexp_extract(contentCol, pat, group)
    })

  /** ReplaceText strategies (ReplaceText.h:37-58). */
  sealed trait ReplaceStrategy
  case object LiteralReplace extends ReplaceStrategy
  case object RegexReplace extends ReplaceStrategy
  case object Prepend extends ReplaceStrategy
  case object Append extends ReplaceStrategy

  /**
   * ReplaceText (ReplaceText.cpp:49): entire-text mode. Line-by-line mode =
   * split → transform (higher-order fn, no shuffle) → array_join.
   */
  def replaceText(c: Column, strategy: ReplaceStrategy, search: String,
                  replacement: String): Column = strategy match {
    case LiteralReplace => replace(c, lit(search), lit(replacement))
    case RegexReplace   => regexp_replace(c, search, replacement)
    case Prepend        => concat(lit(replacement), c)
    case Append         => concat(c, lit(replacement))
  }

  /** Line-by-line ReplaceText (ReplaceText.h LineByLineEvaluationMode):
    * per-line regex replace without exploding — stays one row. */
  def replaceTextLineByLine(c: Column, delimiter: String, search: String,
                            replacement: String): Column =
    array_join(
      transform(split(c, java.util.regex.Pattern.quote(delimiter)),
        line => regexp_replace(line, search, replacement)),
      delimiter)

  /**
   * AttributesToJSON (AttributesToJSON.cpp:116): serialize the selected
   * attribute list to a JSON object string (into content or an attribute).
   * Selected names keep their given order, mirroring the attribute-list
   * property.
   */
  def attributesToJson(attrNames: Seq[String]): Column =
    to_json(struct(attrNames.map(n => FlowFrame.attr(n).as(n)): _*))

  /**
   * EvaluateJsonPath (EvaluateJsonPath.cpp:96): JSONPath over content —
   * dynamic properties (attr name → path) become attributes; path-not-found
   * yields null (caller routes by null-check, matching `unmatched`).
   */
  def evaluateJsonPath(df: DataFrame, contentCol: Column,
                       paths: Seq[(String, String)]): DataFrame =
    FlowFrame.withAttrs(df, paths.map { case (name, path) =>
      name -> get_json_object(contentCol, path)
    })

  /**
   * HashContent (HashContent.h:146-159, HashContent.cpp:57): hash the raw
   * content claim into an attribute. MD5/SHA1/SHA256 per the algorithm
   * property; hashes the content bytes, so BINARY is passed through uncast.
   */
  def hashContent(c: Column, algorithm: String): Column = algorithm.toUpperCase match {
    case "MD5"    => md5(c.cast("binary"))
    case "SHA1"   => sha1(c.cast("binary"))
    case "SHA256" => sha2(c.cast("binary"), 256)
    case other    => throw new IllegalArgumentException(s"unsupported hash $other")
  }

  /**
   * AppendHostInfo (AppendHostInfo.cpp): adds hostname/IP attributes —
   * resolved at plan-build time on the driver (lit), matching the
   * reference's onSchedule resolution.
   */
  def appendHostInfo(df: DataFrame, hostnameAttr: String = "source.hostname",
                     ipAttr: String = "source.ipv4"): DataFrame = {
    val host = java.net.InetAddress.getLocalHost
    FlowFrame.withAttrs(df, Seq(
      hostnameAttr -> lit(host.getHostName),
      ipAttr -> lit(host.getHostAddress)))
  }

  /**
   * LogAttribute (LogAttribute.cpp): debug sink — renders the attribute map
   * as the reference's log payload ("key:value" lines, sorted for
   * determinism). Returned as a column so callers can `.show()` or collect.
   */
  def logAttributePayload: Column =
    array_join(
      transform(
        array_sort(map_entries(col(FlowFrame.Attributes))),
        e => concat(lit("key:"), e.getField("key"), lit(" value:"), e.getField("value"))),
      "\n")
}
