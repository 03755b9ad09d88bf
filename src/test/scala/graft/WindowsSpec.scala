package graft

import org.apache.spark.sql.functions._
import graft.core.FlowFrame
import graft.ops.Windows

/** Battery port of the reference rolling-window tests:
  * AttributeRollingWindowTests.cpp (stat attribute values per trigger) and
  * RollingWindowTests.cpp (eviction order / inclusive time cutoff), plus the
  * analysis-level contracts ADVICE r8 flagged (null-value counting, attribute
  * overwrite semantics).
  */
class WindowsSpec extends SparkSpec {

  private def arw(rows: Seq[(String, Map[String, String])], windowLength: Int) =
    Windows.attributeRollingWindow(
      flowFrame(rows).withColumn("seq", monotonically_increasing_id()),
      FlowFrame.attr("value"), Seq(col("seq")), Seq(), windowLength)

  test("AttributeRollingWindow stamps the full stat set per trigger " +
       "(AttributeRollingWindowTests.cpp:39-101, WindowLength=3, 1/3/6/9)") {
    val out = arw(Seq(
      ("content", Map("value" -> "1")),
      ("content", Map("value" -> "3")),
      ("content", Map("value" -> "6")),
      ("content", Map("value" -> "9"))), windowLength = 3)
    assert(out.filter(col("relationship") === "failure").count() === 0)
    val stats = Seq("count", "value", "mean", "variance", "stddev", "median",
      "min", "max")
    val got = out.orderBy("seq")
      .select(stats.map(s => FlowFrame.attr("rolling.window." + s)): _*)
      .collect().map(r => stats.indices.map(r.getString).toList).toList
    // expected strings are the reference's std::to_string renderings
    // (AttributeRollingWindowTests.cpp:53-100)
    assert(got === List(
      // [1]
      List("1.000000", "1.000000", "1.000000", "0.000000", "0.000000",
        "1.000000", "1.000000", "1.000000"),
      // [1, 3]
      List("2.000000", "4.000000", "2.000000", "1.000000", "1.000000",
        "2.000000", "1.000000", "3.000000"),
      // [1, 3, 6]
      List("3.000000", "10.000000", "3.333333", "4.222222", "2.054805",
        "3.000000", "1.000000", "6.000000"),
      // [3, 6, 9] — oldest evicted (RollingWindow.h shrinkToSize)
      List("3.000000", "18.000000", "6.000000", "6.000000", "2.449490",
        "6.000000", "3.000000", "9.000000")))
  }

  test("AttributeRollingWindow routes missing / non-numeric values to " +
       "failure WITHOUT adding them to the window state " +
       "(AttributeRollingWindow.cpp:52-68 transfer-before-add)") {
    val out = arw(Seq(
      ("a", Map("value" -> "2")),
      ("b", Map[String, String]()),          // missing -> failure
      ("c", Map("value" -> "oops")),         // stod failure -> failure
      ("d", Map("value" -> "4"))), windowLength = 3)
    val fails = out.filter(col("relationship") === "failure")
      .select("content").collect().map(_.getString(0)).toSet
    assert(fails === Set("b", "c"))
    // the window for "d" is [2, 4]: the failure rows never entered state
    val dRow = out.filter(col("content") === "d")
      .select(FlowFrame.attr("rolling.window.count"),
        FlowFrame.attr("rolling.window.value"),
        FlowFrame.attr("rolling.window.mean")).collect().head
    assert(dRow.getString(0) === "2.000000")
    assert(dRow.getString(1) === "6.000000")
    assert(dRow.getString(2) === "3.000000")
    // failure rows keep their attributes unstamped
    val bRow = out.filter(col("content") === "b")
      .select(FlowFrame.attr("rolling.window.count")).collect().head
    assert(bRow.isNullAt(0))
  }

  test("AttributeRollingWindow overwrites previously stamped attributes " +
       "(setAttribute overwrite semantics; no DUPLICATE_MAP_KEY)") {
    val out = arw(Seq(
      ("a", Map("value" -> "5", "rolling.window.count" -> "stale",
        "rolling.window.mean" -> "stale", "untouched" -> "kept"))),
      windowLength = 3)
    val row = out.select(FlowFrame.attr("rolling.window.count"),
      FlowFrame.attr("rolling.window.mean"), FlowFrame.attr("untouched"))
      .collect().head
    assert(row.getString(0) === "1.000000")
    assert(row.getString(1) === "5.000000")
    assert(row.getString(2) === "kept")
  }

  test("rollingWindowCount evicts oldest-by-order first regardless of " +
       "arrival (RollingWindowTests.cpp:82-106 shrinkToSize)") {
    import spark.implicits._
    // timestamps 1,3,2,4,42 — shrinkToSize(4) removes ts=1; shrinkToSize(1)
    // keeps only ts=42. Row-frame over the ORDER column reproduces both.
    val df = Seq((1, 1.0), (3, 3.0), (2, 2.0), (4, 4.0), (42, 42.0))
      .toDF("ts", "v")
    val out4 = Windows.rollingWindowCount(df, Seq(), Seq(col("ts")), col("v"), 4)
      .filter(col("ts") === 42).select("rollingCount", "rollingMin").collect().head
    assert(out4.getLong(0) === 4L && out4.getDouble(1) === 2.0) // 1 evicted
    val out1 = Windows.rollingWindowCount(df, Seq(), Seq(col("ts")), col("v"), 1)
      .filter(col("ts") === 42).select("rollingCount", "rollingMean").collect().head
    assert(out1.getLong(0) === 1L && out1.getDouble(1) === 42.0)
  }

  test("rollingWindowTimeSliding keeps the entry AT the cutoff " +
       "(RollingWindowTests.cpp:57-60 removeOlderThan(t) keeps timestamp==t)") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (3L, 3.0), (2L, 2.0), (4L, 4.0)).toDF("ts", "v")
    // at ts=4 with windowMs=3 the cutoff is 1 — inclusive, so all 4 remain
    val all = Windows.rollingWindowTimeSliding(df, col("ts"), col("v"), 3L, Seq())
      .filter(col("ts") === 4).select("rollingCount").collect().head
    assert(all.getLong(0) === 4L)
    // windowMs=2 -> cutoff 2: entry ts=1 evicted, 2/3/4 remain
    val three = Windows.rollingWindowTimeSliding(df, col("ts"), col("v"), 2L, Seq())
      .filter(col("ts") === 4).select("rollingCount", "rollingMin").collect().head
    assert(three.getLong(0) === 3L && three.getDouble(1) === 2.0)
  }

  test("withRollingStats counts values, not rows: null values neither " +
       "inflate n nor break the median element_at (ADVICE r8)") {
    import spark.implicits._
    val df = Seq((1, Some(2.0)), (2, None), (3, Some(4.0)), (4, None))
      .toDF("ts", "v")
    val out = Windows.rollingWindowCount(df, Seq(), Seq(col("ts")), col("v"), 4)
      .orderBy("ts")
      .select("rollingCount", "rollingMean", "rollingMedian").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L, 2L, 2L))
    assert(out(3).getDouble(1) === 3.0) // mean of {2,4}, nulls excluded
    assert(out(3).getDouble(2) === 3.0) // median midpoint of {2,4}
    // an all-null prefix frame yields n=0 and null stats, not an ANSI error
    val nullFirst = Seq((1, None: Option[Double]), (2, Some(5.0))).toDF("ts", "v")
    val first = Windows.rollingWindowCount(nullFirst, Seq(), Seq(col("ts")),
      col("v"), 2).orderBy("ts").collect()
    assert(first(0).getLong(first(0).fieldIndex("rollingCount")) === 0L)
    assert(first(0).isNullAt(first(0).fieldIndex("rollingMedian")))
  }
}
