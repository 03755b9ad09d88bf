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
   * RouteOnAttribute.cpp onTrigger): dynamic properties name→EL boolean;
   * the FlowFile is CLONED to every matching property's relationship
   * (clone+transfer per match), else routed to `unmatched`.
   *
   * Spark shape: build the array of matching relationships and explode it
   * — one row per match, a Generate over a codegen'd when-array, no
   * shuffle. A row matching two rules lands on both edges, as upstream.
   */
  def routeOnAttribute(df: DataFrame, rules: Seq[(String, String)],
                       attrs: ElCompiler.AttrResolver = ElCompiler.flowAttrs): DataFrame = {
    val matched = filter(
      array(rules.map { case (rel, elSrc) =>
        when(coalesce(ElCompiler.predicate(elSrc, attrs), lit(false)), rel)
      }: _*), x => x.isNotNull)
    df.withColumn(FlowFrame.Relationship,
      explode(when(size(matched) === 0, array(lit("unmatched"))).otherwise(matched)))
  }

  /** RouteText matching strategies (RouteText.h:37-58, :98). */
  sealed trait MatchStrategy
  case object StartsWith extends MatchStrategy
  case object EndsWith extends MatchStrategy
  case object ContainsStr extends MatchStrategy
  case object EqualsStr extends MatchStrategy
  case object MatchesRegex extends MatchStrategy
  case object ContainsRegex extends MatchStrategy
  /** "Satisfies Expression": the rule value is an EL predicate evaluated
    * per segment with `line`/`lineNo` (and `segment`/`segmentNo`) bound to
    * the current segment (RouteText.cpp:336-341). */
  case object SatisfiesExpression extends MatchStrategy

  /**
   * RouteText (RouteText.cpp:218): segment content into lines, route each
   * line by (relationship, strategy, match value); a line is cloned to
   * EVERY matching rule's relationship (dynamic-property routing), else
   * `unmatched`. Optional grouping regex adds a `group` column
   * (RouteText.h:154-162). Returns the exploded per-line frame with
   * `line`, `lineNo`, `relationship` (+ `group`).
   *
   * Line segmentation and multi-match are Generators (posexplode + explode
   * of the match array), not shuffles; predicates stay in whole-stage
   * codegen. SatisfiesExpression predicates compile through ElCompiler
   * with `line`/`lineNo`/`segment`/`segmentNo` resolving to the segment
   * columns and everything else to `attrs`.
   *
   * Segmentation follows the reference byte-exactly
   * (RouteText.cpp:87-104 ReadCallback): each PER-LINE segment KEEPS its
   * trailing delimiter ("include newline character to be in-line with
   * nifi semantics"), content ending in the delimiter yields no trailing
   * empty segment, and empty content yields no segments at all. Matching
   * uses the PREPROCESSED value (RouteText.cpp:293-307: trailing \r/\n
   * run stripped, then whitespace trim when enabled) for every strategy
   * EXCEPT SatisfiesExpression, which sees the raw segment including its
   * line ending (RouteText.cpp:233-236 "an Expression has access to the
   * raw segment like in nifi"). EL-visible segment numbers are 1-based
   * (RouteTextTests.cpp:463); the output lineNo column stays 0-based like
   * the fragment index, and the output `line` column is the RAW segment —
   * reassembly concatenates raw segments (RouteText.cpp:247
   * `+= original_value`).
   */
  def routeText(df: DataFrame, contentCol: Column, delimiter: String,
                rules: Seq[(String, MatchStrategy, String)],
                groupingRegex: Option[String] = None,
                attrs: ElCompiler.AttrResolver = ElCompiler.flowAttrs,
                trimWhitespace: Boolean = false,
                ignoreCase: Boolean = false,
                groupingFallback: String = "",
                fullText: Boolean = false): DataFrame = {
    val lines = segmented(df, contentCol, delimiter, fullText)
    val matched = filter(
      array(rules.map { case (rel, s, v) =>
        when(coalesce(lineMatches(s, v, attrs, trimWhitespace, ignoreCase,
          delimiter, fullText), lit(false)), rel)
      }: _*), x => x.isNotNull)
    val routedDf = lines.withColumn(FlowFrame.Relationship,
      explode(when(size(matched) === 0, array(lit("unmatched"))).otherwise(matched)))
    withGroup(routedDf, groupingRegex, groupingFallback, trimWhitespace,
      delimiter, fullText)
  }

  /** Reference segmentation (RouteText.cpp:87-104): PER-LINE segments
    * keep their delimiter; no trailing empty segment; empty content → no
    * segments. FULL-TEXT is one segment of the whole content. */
  private def segmented(df: DataFrame, contentCol: Column, delimiter: String,
                        fullText: Boolean): DataFrame = {
    val segs =
      if (fullText) when(length(contentCol) > 0, array(contentCol))
        .otherwise(array().cast("array<string>"))
      else filter(
        split(contentCol, "(?<=" + java.util.regex.Pattern.quote(delimiter) + ")", -1),
        s => s =!= lit(""))
    df.select(df.columns.map(col) :+
      posexplode(segs).as(Seq("lineNo", "line")): _*)
  }

  /** The preprocess of the current `line` (RouteText.cpp:293-307): strip
    * the trailing delimiter/\r run (PER-LINE only), then whitespace-trim
    * when enabled. Case folding is matching-time, not preprocess. */
  private def preprocessed(trimWhitespace: Boolean, delimiter: String,
                           fullText: Boolean): Column = {
    val stripped =
      if (fullText) col("line")
      else regexp_replace(col("line"),
        "(?:" + java.util.regex.Pattern.quote(delimiter) + "|\r)+$", "")
    if (trimWhitespace)
      regexp_replace(regexp_replace(stripped, "^\\s+", ""), "\\s+$", "")
    else stripped
  }

  /** Group extraction (RouteText.cpp:373-388): FULL regex match on the
    * preprocessed segment; ALL capture groups joined with ", " (unused
    * groups as empty strings); no match → the fallback value. */
  private def withGroup(routedDf: DataFrame, groupingRegex: Option[String],
                        fallback: String, trimWhitespace: Boolean,
                        delimiter: String, fullText: Boolean): DataFrame =
    groupingRegex match {
      case Some(re) =>
        val pre = preprocessed(trimWhitespace, delimiter, fullText)
        val anchored = "^(?:" + re + ")$"
        val n = java.util.regex.Pattern.compile(re).matcher("").groupCount()
        val joined =
          if (n == 0) lit("")
          else concat_ws(", ", (1 to n).map(i =>
            regexp_extract(pre, anchored, i)): _*)
        routedDf.withColumn("group",
          when(pre.rlike(anchored), joined).otherwise(lit(fallback)))
      case None => routedDf
    }

  /** RouteText "Routing Strategy" (RouteText.h:37-41). */
  sealed trait RoutingStrategy
  /** one edge per matching dynamic property (the default; `routeText`). */
  case object DynamicRouting extends RoutingStrategy
  /** `matched` iff EVERY rule matches (RouteText.cpp:243-251). */
  case object RouteAll extends RoutingStrategy
  /** `matched` iff ANY rule matches (RouteText.cpp:253-261). */
  case object RouteAny extends RoutingStrategy

  /**
   * RouteText with the ALL/ANY routing strategies: rules keep their
   * matching semantics but collapse to a single matched/unmatched edge.
   * Same narrow shape as `routeText`, but the quantifier folds the rule
   * predicates into ONE boolean per line — no explode of the match set,
   * no aggregation, stays in whole-stage codegen.
   */
  def routeTextQuantified(df: DataFrame, contentCol: Column, delimiter: String,
                          rules: Seq[(String, MatchStrategy, String)],
                          strategy: RoutingStrategy,
                          groupingRegex: Option[String] = None,
                          attrs: ElCompiler.AttrResolver = ElCompiler.flowAttrs,
                          trimWhitespace: Boolean = false,
                          ignoreCase: Boolean = false,
                          groupingFallback: String = "",
                          fullText: Boolean = false): DataFrame = {
    require(strategy != DynamicRouting, "use routeText for dynamic routing")
    val lines = segmented(df, contentCol, delimiter, fullText)
    val preds = rules.map { case (_, s, v) =>
      coalesce(lineMatches(s, v, attrs, trimWhitespace, ignoreCase,
        delimiter, fullText), lit(false))
    }
    // vacuous quantifiers as in the reference's ranges::all_of/any_of
    val isMatched = strategy match {
      case RouteAll => preds.reduceOption(_ && _).getOrElse(lit(true))
      case _        => preds.reduceOption(_ || _).getOrElse(lit(false))
    }
    val out = lines.withColumn(FlowFrame.Relationship,
      when(isMatched, "matched").otherwise("unmatched"))
    withGroup(out, groupingRegex, groupingFallback, trimWhitespace,
      delimiter, fullText)
  }

  /** One rule's match predicate over the exploded `line`/`lineNo` columns. */
  private def lineMatches(s: MatchStrategy, v: String,
                          attrs: ElCompiler.AttrResolver,
                          trimWhitespace: Boolean, ignoreCase: Boolean,
                          delimiter: String, fullText: Boolean): Column = {
    val pre0 = preprocessed(trimWhitespace, delimiter, fullText)
    val pre = if (ignoreCase) lower(pre0) else pre0
    def v2: String = if (ignoreCase) v.toLowerCase else v
    val segmentAttrs: ElCompiler.AttrResolver = {
      // raw segment incl. line ending (RouteText.cpp:233-236), 1-based no
      case "line" | "segment"     => col("line")
      case "lineNo" | "segmentNo" => (col("lineNo") + 1).cast("string")
      case other                  => attrs(other)
    }
    s match {
      case StartsWith          => pre.startsWith(v2)
      case EndsWith            => pre.endsWith(v2)
      case ContainsStr         => pre.contains(v2)
      case EqualsStr           => pre === v2
      case MatchesRegex        => pre.rlike("^(?:" + v2 + ")$")
      case ContainsRegex       => pre.rlike(v2)
      case SatisfiesExpression => ElCompiler.predicate(v, segmentAttrs)
    }
  }

  /**
   * RouteText output assembly (RouteText.cpp:225,243-251
   * `flow_file_contents[{rel, group}] += segment`): the reference emits ONE
   * FlowFile per (relationship, group) holding that route's RAW segments
   * CONCATENATED in original order — segments carry their own line
   * endings, so no demarcator is inserted. One shuffle on the output key;
   * order restored from lineNo inside the group, not a global sort.
   */
  def routeTextMerged(routed: DataFrame,
                      perDocCol: Option[Column] = None): DataFrame = {
    val keys = Seq(col(FlowFrame.Relationship)) ++
      (if (routed.columns.contains("group")) Seq(col("group")) else Nil) ++
      perDocCol.toSeq.map(_.as("docKey"))
    routed.groupBy(keys: _*)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("lineNo").as("n"), col("line").as("l")))),
          e => e.getField("l")), "").as("merged"),
        count(lit(1)).as("lineCount"))
  }

  /** RetryFlowFile "Reuse Mode" (RetryFlowFile.h:48-51). */
  sealed trait ReuseMode
  case object FailOnReuse extends ReuseMode
  case object WarnOnReuse extends ReuseMode
  case object ResetReuse extends ReuseMode

  /**
   * RetryFlowFile (RetryFlowFile.cpp:40-110): read the retry count
   * attribute; under `maxRetries` → `retry` with the attribute set to
   * count+1, at/over → `retries_exceeded` with the `exceededAttrs` dynamic
   * properties (EL templates) applied. A non-numeric (or absent) count
   * resets to 0, or routes to `failure` when
   * `failOnNonNumericalOverwrite` (strict unsigned-integer parse, as the
   * reference's parseIntegral<uint64_t>). When `processorUuid` is given,
   * a `<retriesAttr>.uuid` attribute from a DIFFERENT processor instance
   * triggers the reuse policy: FailOnReuse → `failure`, Warn/ResetReuse →
   * count resets to 0 (RetryFlowFile.cpp:54-71). Penalty delay is relaxed
   * to re-queueing semantics (SURVEY §7.5.1).
   */
  def retryFlowFile(df: DataFrame, retriesAttr: String = "flowfile.retries",
                    maxRetries: Int = 3,
                    processorUuid: Option[String] = None,
                    reuseMode: ReuseMode = FailOnReuse,
                    failOnNonNumericalOverwrite: Boolean = false,
                    exceededAttrs: Seq[(String, String)] = Nil,
                    attrs: ElCompiler.AttrResolver = ElCompiler.flowAttrs): DataFrame = {
    val raw = FlowFrame.attr(retriesAttr)
    val numeric = raw.isNotNull && raw.rlike("^[0-9]+$")
    val parsed = when(numeric, raw.cast("long")).otherwise(lit(0L))
    val lastUuid = FlowFrame.attr(retriesAttr + ".uuid")
    val isReuse = processorUuid
      .map(u => lastUuid.isNotNull && lastUuid =!= u)
      .getOrElse(lit(false))
    val count =
      if (reuseMode == FailOnReuse) parsed
      else when(isReuse, lit(0L)).otherwise(parsed)
    val rel =
      when(!numeric && lit(failOnNonNumericalOverwrite), "failure")
        .when(isReuse && lit(reuseMode == FailOnReuse), "failure")
        .when(count < maxRetries, "retry")
        .otherwise("retries_exceeded")
    // evaluate every update against the INPUT attributes (the reference
    // writes count+1 only on the retry edge and the dynamic properties
    // only on retries_exceeded, both before transfer)
    val updates =
      Seq(retriesAttr -> when(rel === "retry", (count + 1).cast("string"))
        .otherwise(raw)) ++
      exceededAttrs.map { case (k, el) =>
        k -> when(rel === "retries_exceeded", ElCompiler.template(el, attrs))
          .otherwise(FlowFrame.attr(k))
      }
    FlowFrame.withAttrs(df.withColumn(FlowFrame.Relationship, rel), updates)
      // withAttrs writes null for keys that had no value on the untouched
      // edges; absent and null-valued read identically via element_at, but
      // drop them so the attribute map round-trips exactly
      .withColumn(FlowFrame.Attributes,
        map_filter(col(FlowFrame.Attributes), (_, v) => v.isNotNull))
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
