package graft

import org.apache.spark.sql.functions._
import graft.ops._

/**
 * Table-driven port of the reference RouteText battery
 * (extensions/standard-processors/tests/unit/RouteTextTests.cpp) — each
 * case cites its TEST_CASE/SECTION. The reference feeds FlowFiles through
 * a single processor and asserts per-(relationship, group) output
 * contents; here each content is a row and routeText/routeTextMerged
 * reproduce the routed per-segment frame and the reassembled outputs.
 */
class RouteTextSpec extends SparkSpec {

  private def contents(cs: String*) =
    spark.createDataFrame(cs.map(Tuple1(_))).toDF("content")

  /** relationship per single-segment content, Dynamic Routing. */
  private def routeOne(strategy: Routing.MatchStrategy, value: String,
                       ignoreCase: Boolean, cs: Seq[String]): Map[String, String] =
    Routing.routeText(contents(cs: _*), col("content"), "\n",
      Seq(("here", strategy, value)), ignoreCase = ignoreCase)
      .select("content", "relationship").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("Matching Strategies route case-sensitively and -insensitively " +
       "(RouteTextTests.cpp:134 'RouteText correctly handles Matching Strategies')") {
    // (strategy, value, contents→expected) per SECTION; "here" vs "unmatched"
    val cases: Seq[(Routing.MatchStrategy, String, Boolean, Map[String, String])] = Seq(
      // Starts With (:144-157)
      (Routing.StartsWith, "se", false,
        Map("seven" -> "here", "Seven" -> "unmatched", "even" -> "unmatched")),
      (Routing.StartsWith, "se", true,
        Map("seven" -> "here", "Seven" -> "here", "even" -> "unmatched")),
      // Ends With (:158-171)
      (Routing.EndsWith, "ven", false,
        Map("seven" -> "here", "SeveN" -> "unmatched", "seten" -> "unmatched")),
      (Routing.EndsWith, "ven", true,
        Map("seven" -> "here", "SeveN" -> "here", "seten" -> "unmatched")),
      // Contains (:172-185)
      (Routing.ContainsStr, "eve", false,
        Map("seven" -> "here", "SeVeN" -> "unmatched", "seren" -> "unmatched")),
      (Routing.ContainsStr, "eve", true,
        Map("seven" -> "here", "SeVeN" -> "here", "seren" -> "unmatched")),
      // Equals (:186-199)
      (Routing.EqualsStr, "seven", false,
        Map("seven" -> "here", "Seven" -> "unmatched", "seven1" -> "unmatched")),
      (Routing.EqualsStr, "seven", true,
        Map("seven" -> "here", "Seven" -> "here", "seven1" -> "unmatched")),
      // Matches Regex (:200-213)
      (Routing.MatchesRegex, "se.en", false,
        Map("seven" -> "here", "Seven" -> "unmatched", "sevena" -> "unmatched")),
      (Routing.MatchesRegex, "se.en", true,
        Map("seven" -> "here", "Seven" -> "here", "sevena" -> "unmatched")),
      // Contains Regex (:214-227)
      (Routing.ContainsRegex, ".ve", false,
        Map("seven" -> "here", "SeVeN" -> "unmatched", "ven" -> "unmatched")),
      (Routing.ContainsRegex, ".ve", true,
        Map("seven" -> "here", "SeVeN" -> "here", "ven" -> "unmatched")),
      // Satisfies Expression: case-insensitivity does NOT apply (:228-242)
      (Routing.SatisfiesExpression, "${segment:equals('seven')}", false,
        Map("seven" -> "here", "SeVeN" -> "unmatched", "ven" -> "unmatched")),
      (Routing.SatisfiesExpression, "${segment:equals('seven')}", true,
        Map("seven" -> "here", "SeVeN" -> "unmatched", "ven" -> "unmatched")))
    cases.foreach { case (strategy, value, noCase, expected) =>
      val got = routeOne(strategy, value, noCase, expected.keys.toSeq)
      assert(got === expected, s"$strategy value=$value ignoreCase=$noCase")
    }
  }

  test("Routing Strategies: Dynamic / Route On All / Route On Any " +
       "(RouteTextTests.cpp:249)") {
    val rules = Seq(("one", Routing.ContainsStr, "apple"),
      ("two", Routing.ContainsStr, "banana"))
    // Dynamic Routing (:265-271): a segment clones to EVERY matching rule
    val dyn = Routing.routeText(
      contents("apple", "banana", "other", "apple-banana"),
      col("content"), "\n", rules)
      .select("content", "relationship").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(dyn === Set(("apple", "one"), ("banana", "two"),
      ("other", "unmatched"),
      ("apple-banana", "one"), ("apple-banana", "two")))
    // Route On All (:272-277)
    val all = Routing.routeTextQuantified(
      contents("apple-banana", "apple", "none"),
      col("content"), "\n", rules, Routing.RouteAll)
      .select("content", "relationship").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(all === Set(("apple-banana", "matched"),
      ("apple", "unmatched"), ("none", "unmatched")))
    // Route On Any (:278-283)
    val any = Routing.routeTextQuantified(
      contents("apple", "banana", "apple-banana", "none"),
      col("content"), "\n", rules, Routing.RouteAny)
      .select("content", "relationship").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(any === Set(("apple", "matched"), ("banana", "matched"),
      ("apple-banana", "matched"), ("none", "unmatched")))
  }

  test("'Per Line' segmentation keeps line endings, strips them for " +
       "matching, trims whitespace when enabled (RouteTextTests.cpp:295)") {
    val content = "A\nB\r\n A \r\n\r\rA"
    val rules = Seq(("A", Routing.EqualsStr, "A"), ("B", Routing.EqualsStr, "B"))
    def merged(trim: Boolean): Map[String, String] =
      Routing.routeTextMerged(
        Routing.routeText(contents(content), col("content"), "\n", rules,
          trimWhitespace = trim))
        .select("relationship", "merged").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // Without trim (:315-320)
    assert(merged(trim = false) === Map(
      "A" -> "A\n", "B" -> "B\r\n", "unmatched" -> " A \r\n\r\rA"))
    // With trim (:322-326): " A \r\n" and "\r\rA" both trim to "A"
    assert(merged(trim = true) === Map(
      "A" -> "A\n A \r\n\r\rA", "B" -> "B\r\n"))
  }

  test("'Per Line' segmentation ignores the trailing empty line " +
       "(RouteTextTests.cpp:334)") {
    for (content <- Seq("A\r\n", "A\n")) {
      val out = Routing.routeTextQuantified(contents(content), col("content"),
        "\n", Seq(("A", Routing.EqualsStr, "A")), Routing.RouteAll)
      val rows = out.select("relationship", "line").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      // exactly ONE segment — the whole content — and it matches
      assert(rows === Seq(("matched", content)), s"content=$content")
    }
  }

  test("grouping: full regex match, fallback on no-match, per-group " +
       "reassembly (RouteTextTests.cpp:362)") {
    val content =
      "group1.toA(one)\ngroup1.toB(two)\ngroup1.toA(three)\ngroup2.toA(four)\n" +
        "no_group.toA(five)\nno_group.toA(six)\ntoNone1\ngroup1.toNone2\ngroup1.toNone3"
    val routed = Routing.routeText(contents(content), col("content"), "\n",
      Seq(("A", Routing.ContainsStr, "toA"), ("B", Routing.ContainsStr, "toB")),
      groupingRegex = Some("group(.).*"),
      groupingFallback = "GROUPING_FAILURE :(")
    val got = Routing.routeTextMerged(routed)
      .select("relationship", "group", "merged").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    assert(got === Map(
      ("A", "1") -> "group1.toA(one)\ngroup1.toA(three)\n",
      ("A", "2") -> "group2.toA(four)\n",
      ("A", "GROUPING_FAILURE :(") -> "no_group.toA(five)\nno_group.toA(six)\n",
      ("B", "1") -> "group1.toB(two)\n",
      ("unmatched", "1") -> "group1.toNone2\ngroup1.toNone3",
      ("unmatched", "GROUPING_FAILURE :(") -> "toNone1\n"))
  }

  test("grouping joins ALL capture groups with ', ', empty string for " +
       "unused groups (RouteTextTests.cpp:403)") {
    val content =
      "group1.1:toA(one)\ngroup1.1:toA(two)\ngroup1.2:toA(three)\ngroup2:toA(four)\ngroup2:toA(five)"
    val routed = Routing.routeText(contents(content), col("content"), "\n",
      Seq(("A", Routing.ContainsStr, "toA")),
      groupingRegex = Some("group(.)(\\..)?.*"))
    val got = Routing.routeTextMerged(routed)
      .select("relationship", "group", "merged").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    assert(got === Map(
      ("A", "1, .1") -> "group1.1:toA(one)\ngroup1.1:toA(two)\n",
      ("A", "1, .2") -> "group1.2:toA(three)\n",
      ("A", "2, ") -> "group2:toA(four)\ngroup2:toA(five)"))
  }

  test("Full Text segmentation matches the whole content as one segment " +
       "(RouteTextTests.cpp:434)") {
    val content = "toA\r\ntoA\ntoA\r"
    val routed = Routing.routeText(contents(content), col("content"), "\n",
      Seq(("A", Routing.ContainsStr, "toA")), fullText = true)
    val rows = routed.select("relationship", "line").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("A", content)))
  }

  test("expressions access injected segment/line variables with 1-based " +
       "numbering (RouteTextTests.cpp:458)") {
    val content = "toA one\ntoA two"
    for (v <- Seq("segment", "line")) {
      val routed = Routing.routeText(contents(content), col("content"), "\n",
        Seq(
          ("A1", Routing.SatisfiesExpression,
            s"$${$v:startsWith('toA'):and($${${v}No:equals('1')})}"),
          ("A2", Routing.SatisfiesExpression,
            s"$${$v:startsWith('toA'):and($${${v}No:equals('2')})}")))
      val got = Routing.routeTextMerged(routed)
        .select("relationship", "merged").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === Map("A1" -> "toA one\n", "A2" -> "toA two"), s"var=$v")
    }
  }
}
