package graft

import org.apache.spark.sql.functions._
import graft.ops.SplitMerge
import graft.ops.SplitMerge.TextFragment

/**
 * Table-driven port of the reference SplitText battery
 * (extensions/standard-processors/tests/unit/SplitTextTests.cpp) against
 * [[SplitMerge.computeTextSplits]] — each case cites its TEST_CASE. A
 * trailing DataFrame test exercises the explode wrapper's attribute set.
 */
class SplitTextSpec extends SparkSpec {

  private def frags(r: Either[String, Seq[TextFragment]]): Seq[(Int, String, Long)] =
    r.toOption.get.map(f => (f.index, f.content, f.lineCount))

  test("single line inputs each form one fragment (SplitTextTests.cpp:237)") {
    val big = "a" * 100000
    val cases = Seq(
      // (input, expected content, expected text.line.count)
      ("\n", "\n", 0L),
      ("this is a new line\n", "this is a new line\n", 1L),
      ("this is a new line\r\n", "this is a new line\r\n", 1L),
      (big + "\n", big + "\n", 1L),
      ("this is a new line", "this is a new line", 1L))
    for ((input, content, lines) <- cases) {
      assert(frags(SplitMerge.computeTextSplits(input, 1,
        trimTrailingNewlines = false)) === Seq((1, content, lines)), input.take(20))
    }
  }

  test("two lines in one fragment; trailing-newline trim variants " +
       "(cpp:271)") {
    val big = "a" * 100000
    val cases = Seq(
      ("\n\n", false, "\n\n", 0L),
      ("this is a new line\nand another line\n", false,
        "this is a new line\nand another line\n", 2L),
      ("this is a new line\nand another line\n\n", true,
        "this is a new line\nand another line", 2L),
      ("this is a new line\r\nand another line\r\n", false,
        "this is a new line\r\nand another line\r\n", 2L),
      ("this is a new line\r\nand another line\r\n\r\n", true,
        "this is a new line\r\nand another line", 2L),
      (big + "\n" + big + "\n", false, big + "\n" + big + "\n", 2L),
      (big + "\n" + big, false, big + "\n" + big, 2L))
    for ((input, trim, content, lines) <- cases) {
      assert(frags(SplitMerge.computeTextSplits(input, 2,
        trimTrailingNewlines = trim)) === Seq((1, content, lines)), input.take(20))
    }
  }

  test("two lines split into separate fragments (cpp:316)") {
    val big = "a" * 100000
    val cases = Seq(
      ("\n\n", Seq((1, "\n", 0L), (2, "\n", 0L))),
      ("this is a new line\nand another line\n",
        Seq((1, "this is a new line\n", 1L), (2, "and another line\n", 1L))),
      ("this is a new line\r\nand another line\r\n",
        Seq((1, "this is a new line\r\n", 1L), (2, "and another line\r\n", 1L))),
      (big + "\n" + big + "\n", Seq((1, big + "\n", 1L), (2, big + "\n", 1L))),
      (big + "\n" + big, Seq((1, big + "\n", 1L), (2, big, 1L))))
    for ((input, expected) <- cases) {
      assert(frags(SplitMerge.computeTextSplits(input, 1,
        trimTrailingNewlines = false)) === expected, input.take(20))
    }
  }

  test("endlines are trimmed when Remove Trailing Newlines is true; " +
       "empty fragments drop without consuming an index (cpp:363)") {
    // only newlines → nothing emitted
    assert(frags(SplitMerge.computeTextSplits("\n\n\n\n\n\n\n", 3)) === Nil)
    // starting newlines stay, trailing ones trim
    assert(frags(SplitMerge.computeTextSplits(
      "\n\n\n\nline1\nline2\nline3\n\n\n", 3)) ===
      Seq((1, "\nline1\nline2", 2L), (2, "line3", 1L)))
    // mixed endline flavors
    assert(frags(SplitMerge.computeTextSplits(
      "\n\r\n\n\r\nline1\nline2\r\nline3\r\n\n", 3)) ===
      Seq((1, "\r\nline1\nline2", 2L), (2, "line3", 1L)))
    // empty-after-trim input emits nothing at either split count (cpp:414)
    assert(frags(SplitMerge.computeTextSplits("\n\n", 1)) === Nil)
    assert(frags(SplitMerge.computeTextSplits("\n\n", 2)) === Nil)
  }

  test("Maximum Fragment Size without Line Split Count (cpp:426)") {
    val in3 = "this is a new line\nand another line\nthirdline\n"
    assert(frags(SplitMerge.computeTextSplits(in3, 0, Some(40),
      trimTrailingNewlines = false)) ===
      Seq((1, "this is a new line\nand another line\n", 2L),
        (2, "thirdline\n", 1L)))
    assert(frags(SplitMerge.computeTextSplits(in3, 0, Some(100),
      trimTrailingNewlines = false)) === Seq((1, in3, 3L)))
    // size-capped only-newline fragments drop when trimming
    assert(frags(SplitMerge.computeTextSplits(
      "\n\nthis is a new line\n\n\nand another line\n", 0, Some(2))) ===
      Seq((1, "this is a new line", 1L), (2, "and another line", 1L)))
    // ... and emit as-is when not trimming
    assert(frags(SplitMerge.computeTextSplits(
      "\n\nthis is a new line\n\nand another line\n", 0, Some(2),
      trimTrailingNewlines = false)) ===
      Seq((1, "\n\n", 0L), (2, "this is a new line\n", 1L),
        (3, "\n", 0L), (4, "and another line\n", 1L)))
    // fragment index is not incremented for dropped fragments
    assert(frags(SplitMerge.computeTextSplits(
      "trim\n\n\n\n\n\nand another line\n\n", 0, Some(5))) ===
      Seq((1, "trim", 1L), (2, "and another line", 1L)))
  }

  test("Maximum Fragment Size together with Line Split Count (cpp:529)") {
    val in3 = "this is a new line\nand another line\nthirdline\n"
    // max size reaches the limit first
    assert(frags(SplitMerge.computeTextSplits(in3, 3, Some(40),
      trimTrailingNewlines = false)) ===
      Seq((1, "this is a new line\nand another line\n", 2L),
        (2, "thirdline\n", 1L)))
    // max size reached before the first line: lone oversized lines pass
    assert(frags(SplitMerge.computeTextSplits(in3, 2, Some(13),
      trimTrailingNewlines = false)) ===
      Seq((1, "this is a new line\n", 1L), (2, "and another line\n", 1L),
        (3, "thirdline\n", 1L)))
    // line split count reaches the limit first
    assert(frags(SplitMerge.computeTextSplits(in3, 2, Some(50),
      trimTrailingNewlines = false)) ===
      Seq((1, "this is a new line\nand another line\n", 2L),
        (2, "thirdline\n", 1L)))
  }

  test("header errors route failure; header-consumes-all emits nothing " +
       "(cpp:598-660)") {
    // header line count exceeds the content line count
    assert(SplitMerge.computeTextSplits("", 1, headerLineCount = 4).isLeft)
    assert(SplitMerge.computeTextSplits(
      "header line 1\nheader line 2\nthis is a new line\n", 1,
      headerLineCount = 4).isLeft)
    // header alone exceeds the max fragment size
    assert(SplitMerge.computeTextSplits(
      "header line 1\nheader line 2\nthis is a new line\n", 0, Some(20),
      headerLineCount = 2).isLeft)
    // header == full content → no fragments
    assert(frags(SplitMerge.computeTextSplits(
      "header line 1\nheader line 2\nthis is a new line\n", 1,
      headerLineCount = 3)) === Nil)
  }

  test("header lines prepend to every fragment (cpp:662)") {
    val input = "header line 1\nheader line 2\nthis is a new line\nand another line\n"
    assert(frags(SplitMerge.computeTextSplits(input, 1, headerLineCount = 2,
      headerMarker = Some("ignored"), trimTrailingNewlines = false)) ===
      Seq((1, "header line 1\nheader line 2\nthis is a new line\n", 1L),
        (2, "header line 1\nheader line 2\nand another line\n", 1L)))
    assert(frags(SplitMerge.computeTextSplits(input, 2, headerLineCount = 2,
      headerMarker = Some("ignored"))) ===
      Seq((1, "header line 1\nheader line 2\nthis is a new line\nand another line", 2L)))
  }

  test("only-newline fragments emit just the trimmed header (cpp:707)") {
    assert(frags(SplitMerge.computeTextSplits(
      "header line 1\n\nline1\nline2\n\n\nline3\nline4\n\n\n\n", 2,
      headerLineCount = 2, headerMarker = Some("ignored"))) ===
      Seq((1, "header line 1\n\nline1\nline2", 2L),
        (2, "header line 1", 0L),
        (3, "header line 1\n\nline3\nline4", 2L),
        (4, "header line 1", 0L),
        (5, "header line 1", 0L)))
  }

  test("header marker characters select leading marker lines (cpp:728)") {
    val input = "header line 1\nheader line 2\nthis is a new line\nand another line\n"
    assert(frags(SplitMerge.computeTextSplits(input, 1,
      headerMarker = Some("hea"), trimTrailingNewlines = false)) ===
      Seq((1, "header line 1\nheader line 2\nthis is a new line\n", 1L),
        (2, "header line 1\nheader line 2\nand another line\n", 1L)))
    assert(frags(SplitMerge.computeTextSplits(input, 2,
      headerMarker = Some("hea"))) ===
      Seq((1, "header line 1\nheader line 2\nthis is a new line\nand another line", 2L)))
  }

  test("marker header + max size: oversized lone lines, header-only " +
       "fragments, indices (cpp:768)") {
    assert(frags(SplitMerge.computeTextSplits(
      "header line 1\nvery long line should be splitted before split line count\nline2\n\n\n\nline3\nline4\n\n",
      2, Some(30), headerMarker = Some("hea"))) ===
      Seq((1, "header line 1\nvery long line should be splitted before split line count", 1L),
        (2, "header line 1\nline2", 1L),
        (3, "header line 1", 0L),
        (4, "header line 1\nline3\nline4", 2L),
        (5, "header line 1", 0L)))
  }

  test("marker header failure and marker-only content (cpp:811-842)") {
    assert(SplitMerge.computeTextSplits(
      "header line 1\nheader line 2\nthis is a new line\n", 0, Some(20),
      headerMarker = Some("hea")).isLeft)
    assert(frags(SplitMerge.computeTextSplits(
      "header line 1\nheader line 2\n", 0, Some(40),
      headerMarker = Some("hea"))) === Nil)
  }

  test("header counts toward the fragment size cap (cpp:844)") {
    assert(frags(SplitMerge.computeTextSplits(
      "[header] hline 1\nline 2\nline 3\n", 2, Some(30),
      headerMarker = Some("[header]"))) ===
      Seq((1, "[header] hline 1\nline 2", 1L),
        (2, "[header] hline 1\nline 3", 1L)))
  }

  test("property validation (cpp:193-212)") {
    intercept[IllegalArgumentException] {
      SplitMerge.computeTextSplits("x", 0)
    }
    intercept[IllegalArgumentException] {
      SplitMerge.computeTextSplits("x", 0, Some(0))
    }
  }

  test("DataFrame wrapper: fragment attrs, failure routing, zero-fragment " +
       "input forwards as original") {
    import spark.implicits._
    val df = Seq(
      ("d1", "l1\nl2\nl3\n"),
      ("d2", ""),                      // zero fragments → original row
      ("d3", "a\nb\n")).toDF("id", "content")
    val out = SplitMerge.splitTextFull(df, col("id"), col("content"),
      lineSplitCount = 2, trimTrailingNewlines = true)
      .orderBy(col("`fragment.identifier`"), col("fragmentIndex"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getInt(2),
      r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq === Seq(
      ("d1", "splits", 1, "l1\nl2", 2L, 2L, 5L),
      ("d1", "splits", 2, "l3", 1L, 2L, 2L),
      ("d2", "original", 0, "", 0L, 0L, 0L),
      ("d3", "splits", 1, "a\nb", 2L, 1L, 3L)))
    // header failure → one failure row with the original content
    val fail = SplitMerge.splitTextFull(
      Seq(("f1", "only\n")).toDF("id", "content"), col("id"), col("content"),
      lineSplitCount = 1, headerLineCount = 3).collect()
    assert(fail.length === 1 && fail.head.getString(1) === "failure" &&
      fail.head.getString(3) === "only\n")
  }
}
