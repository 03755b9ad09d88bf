package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.FlowFrame
import graft.el.ElCompiler

/**
 * Routing operators — SURVEY §2.3.
 *
 * A MiNiFi "relationship" is a named output edge; transferring to one is a
 * partitioned multi-output (ProcessSession::routeFlowFile,
 * libminifi/src/core/ProcessSession.cpp:804). Spark-first mapping: compute a
 * `relationship` column with one `CASE WHEN` chain (pure Catalyst — codegen'd,
 * pushdown-friendly), then `filter` per edge or `partitionBy("relationship")`
 * on write. No shuffle is introduced by routing itself.
 */
object Routing {

  /**
   * RouteOnAttribute (extensions/standard-processors/processors/
   * RouteOnAttribute.cpp:50): dynamic properties name→EL boolean; first
   * matching property wins its relationship, else `unmatched`.
   *
   * `rules` are (relationship, EL predicate source) evaluated in order —
   * compiled once at plan build to a single `when` chain.
   */
  def routeOnAttribute(df: DataFrame, rules: Seq[(String, String)],
                       attrs: ElCompiler.AttrResolver = ElCompiler.flowAttrs): DataFrame = {
    val chain = rules.foldLeft(Option.empty[Column]) {
      case (acc, (rel, elSrc)) =>
        val pred = ElCompiler.predicate(elSrc, attrs)
        Some(acc.map(_.when(pred, rel)).getOrElse(when(pred, rel)))
    }
    df.withColumn(FlowFrame.Relationship,
      chain.map(_.otherwise("unmatched")).getOrElse(lit("unmatched")))
  }

  /** RouteText matching strategies (RouteText.h:37-58). */
  sealed trait MatchStrategy
  case object StartsWith extends MatchStrategy
  case object EndsWith extends MatchStrategy
  case object ContainsStr extends MatchStrategy
  case object EqualsStr extends MatchStrategy
  case object MatchesRegex extends MatchStrategy
  case object ContainsRegex extends MatchStrategy

  /**
   * RouteText (RouteText.cpp:218): segment content into lines, route each
   * line by (relationship, strategy, match value); optional grouping regex
   * adds a `RouteText.Group` column (RouteText.h:227). Returns the exploded
   * per-line frame with `line`, `lineNo`, `relationship` (+ `group`).
   *
   * Line segmentation is `posexplode(split(...))` — a Generator, not a
   * shuffle; the per-line `when` chain stays in whole-stage codegen.
   */
  def routeText(df: DataFrame, contentCol: Column, delimiter: String,
                rules: Seq[(String, MatchStrategy, String)],
                groupingRegex: Option[String] = None): DataFrame = {
    val lines = df.select(df.columns.map(col) :+
      posexplode(split(contentCol, java.util.regex.Pattern.quote(delimiter)))
        .as(Seq("lineNo", "line")): _*)
    def matches(s: MatchStrategy, v: String): Column = s match {
      case StartsWith    => col("line").startsWith(v)
      case EndsWith      => col("line").endsWith(v)
      case ContainsStr   => col("line").contains(v)
      case EqualsStr     => col("line") === v
      case MatchesRegex  => col("line").rlike("^(?:" + v + ")$")
      case ContainsRegex => col("line").rlike(v)
    }
    val chain = rules.foldLeft(Option.empty[Column]) {
      case (acc, (rel, s, v)) =>
        val p = matches(s, v)
        Some(acc.map(_.when(p, rel)).getOrElse(when(p, rel)))
    }
    val routedDf = lines.withColumn(FlowFrame.Relationship,
      chain.map(_.otherwise("unmatched")).getOrElse(lit("unmatched")))
    groupingRegex match {
      case Some(re) => routedDf.withColumn("group", regexp_extract(col("line"), re, 1))
      case None => routedDf
    }
  }

  /**
   * RetryFlowFile (RetryFlowFile.cpp): read the retry count attribute,
   * increment; under `maxRetries` → `retry`, over → `retries_exceeded`.
   * Penalty delay is relaxed to re-queueing semantics (SURVEY §7.5.1).
   */
  def retryFlowFile(df: DataFrame, retriesAttr: String = "flowfile.retries",
                    maxRetries: Int = 3): DataFrame = {
    // cast via double: the attr may hold a stringified decimal ("2.0").
    // Materialize the count BEFORE overwriting the attribute — the column
    // expression would otherwise re-read the already-incremented value.
    val count = coalesce(FlowFrame.attr(retriesAttr).cast("double").cast("long"), lit(0L)) + 1L
    df.withColumn("__retryCount", count)
      .transform(d => FlowFrame.withAttrs(d, Seq(retriesAttr -> col("__retryCount"))))
      .withColumn(FlowFrame.Relationship,
        when(col("__retryCount") <= maxRetries, "retry").otherwise("retries_exceeded"))
      .drop("__retryCount")
  }

  /**
   * Funnel (libminifi/src/Funnel.cpp): N-to-1 pass-through merge —
   * UNION ALL by name. Spark keeps this shuffle-free (narrow union).
   */
  def funnel(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_ unionByName _)

  /**
   * Connection FlowFile expiration (libminifi/src/Connection.cpp:153-158):
   * drop rows older than TTL at poll time. Pure filter — pushed to scan.
   */
  def expireFlowFiles(df: DataFrame, ageCol: Column, cutoff: Column): DataFrame =
    df.filter(ageCol > cutoff)
}
