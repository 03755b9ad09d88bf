package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Aggregation / window operators — SURVEY §2.6.
 *
 * Numeric policy for oracle-exact results: sums/averages aggregate over
 * DECIMAL(18,6)-cast values (exact, order-independent) and only cast back to
 * DOUBLE at the end — a double sum's low bits depend on partition order,
 * which breaks cross-engine hash comparison and breaks reproducibility at
 * 1000 executors. Variance/stddev derive from the exact decimal sums with a
 * fixed double formula, so they are deterministic too.
 */
object Windows {

  private def dec(c: Column): Column = c.cast("decimal(18,6)")

  /**
   * AttributeRollingWindow, time mode (AttributeRollingWindow.h:40-88,
   * AttributeRollingWindow.cpp:46): rolling stats over a numeric value —
   * count, sum, mean, variance, stddev, min, max, median. Time mode maps to
   * a tumbling event-time bucket: one shuffle on (keys, bucket); partial
   * aggregation is map-side.
   *
   * Variance is POPULATION variance (avg-of-squares minus squared mean,
   * AttributeRollingWindow.cpp:110-117) — defined (0) for a single value,
   * so no n>1 guard.
   */
  def rollingWindowTime(df: DataFrame, tsCol: Column, valueCol: Column,
                        bucket: String, keys: Seq[Column]): DataFrame = {
    val n = count(lit(1))
    val s = sum(dec(valueCol))
    // value*value is one deterministic IEEE double op, then exact decimal;
    // the squared term needs the wide decimal — (18,6) holds only ~1e12, so
    // any |value| >= ~1e6 would overflow the square at production magnitudes
    val sq = sum((valueCol * valueCol).cast("decimal(38,6)"))
    val grouped = df.groupBy(keys :+ date_trunc(bucket, tsCol).as("windowStart"): _*)
    val variance =
      (sq.cast("double") - s.cast("double") * s.cast("double") / n) / n
    grouped.agg(
      n.as("cnt"),
      s.cast("double").as("valueSum"),
      (s.cast("double") / n).as("mean"),
      variance.as("variance"),
      sqrt(greatest(variance, lit(0d))).as("stddev"),
      min(valueCol).as("minValue"),
      max(valueCol).as("maxValue"),
      // exact interpolated median (AttributeRollingWindow emits median;
      // percentile_approx would not be engine-portable)
      median(valueCol).as("median"))
  }

  /**
   * AttributeRollingWindow, time mode per-trigger view
   * (RollingWindow.h removeOlderThan, AttributeRollingWindow.cpp:72-80):
   * each row sees the stats of all entries within the trailing time window
   * INCLUSIVE of the cutoff (removeOlderThan(t) keeps timestamp == t,
   * RollingWindowTests.cpp:57-60). A range-frame analytic window over epoch
   * millis — one shuffle on the partition key, frame bounded by wall time
   * so state per row is windowMs-bounded regardless of corpus size.
   */
  def rollingWindowTimeSliding(df: DataFrame, tsMsCol: Column, valueCol: Column,
                               windowMs: Long, keys: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(tsMsCol)
      .rangeBetween(-windowMs, Window.currentRow)
    withRollingStats(df, valueCol, w)
  }

  /**
   * AttributeRollingWindow, count mode ("Window length" N,
   * RollingWindow.h shrinkToSize): stats over the last N rows per key,
   * oldest-by-timestamp evicted first (RollingWindowTests.cpp:83-108) — a
   * row-frame analytic window ordered by the timestamp
   * (rowsBetween(-N+1, 0)), one shuffle on the partition key.
   */
  def rollingWindowCount(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                         valueCol: Column, windowLength: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(windowLength - 1), Window.currentRow)
    withRollingStats(df, valueCol, w)
  }

  /** The full reference aggregate set over an analytic window frame
    * (AttributeRollingWindow::calculateAndSetAttributes,
    * AttributeRollingWindow.cpp:93-121): count, value (sum), mean,
    * median (midpoint of the two middles for even n), population
    * variance, stddev, min, max. Median comes from a sorted copy of the
    * frame (`collect_list` bounded by the frame length / time window, so
    * per-row state stays O(window) at any corpus size). */
  private def withRollingStats(df: DataFrame, valueCol: Column,
                               w: org.apache.spark.sql.expressions.WindowSpec): DataFrame = {
    // count the VALUE, not the row: collect_list/sum drop nulls, so a
    // count(lit(1)) n would index element_at past the sorted array's end
    // (ANSI runtime error) and inflate mean/variance whenever valueCol has
    // nulls — n must share the aggregates' null semantics
    val n = count(valueCol).over(w)
    val s = sum(dec(valueCol)).over(w).cast("double")
    val sq = sum((valueCol * valueCol).cast("decimal(38,6)")).over(w).cast("double")
    val mean = s / n
    val variance = (sq - s * s / n) / n
    val sorted = array_sort(collect_list(valueCol.cast("double")).over(w))
    val mid = (n / lit(2L)).cast("int")
    // n == 0 (an all-null frame) must come first: the even branch would
    // otherwise evaluate element_at(sorted, 0) — an error under ANSI
    val medianC = when(n === 0, lit(null).cast("double"))
      .when(n % 2 === 1, element_at(sorted, mid + 1))
      .otherwise((element_at(sorted, mid) + element_at(sorted, mid + 1)) / 2d)
    df.withColumn("rollingCount", n)
      .withColumn("rollingSum", s)
      .withColumn("rollingMean", mean)
      .withColumn("rollingVariance", variance)
      .withColumn("rollingStddev", sqrt(greatest(variance, lit(0d))))
      .withColumn("rollingMedian", medianC)
      .withColumn("rollingMin", min(valueCol).over(w))
      .withColumn("rollingMax", max(valueCol).over(w))
  }

  /**
   * Processor-level AttributeRollingWindow (AttributeRollingWindow.cpp:46-90)
   * over FlowFrame rows: evaluates the tracked value, routes rows whose
   * value is missing or non-numeric to `failure` WITHOUT adding them to the
   * window state (the reference transfers to Failure before state_.add),
   * and stamps the stat attributes (std::to_string's fixed 6-decimal
   * rendering) with the configured prefix on `success` rows.
   */
  def attributeRollingWindow(df: DataFrame, valueCol: Column,
                             order: Seq[Column], keys: Seq[Column],
                             windowLength: Int,
                             prefix: String = "rolling.window."): DataFrame = {
    val parsed = try_cast_double(valueCol)
    val tagged = df.withColumn("__rw_value", parsed)
    val failures = tagged.filter(col("__rw_value").isNull)
      .withColumn("relationship", lit("failure")).drop("__rw_value")
    val stats = withRollingStats(
      tagged.filter(col("__rw_value").isNotNull), col("__rw_value"),
      Window.partitionBy(keys: _*).orderBy(order: _*)
        .rowsBetween(-(windowLength - 1), Window.currentRow))
    val fmt = (c: Column) => format_string("%.6f", c)
    // setAttribute overwrites (ProcessSession semantics); map_concat under the
    // default mapKeyDedupPolicy=EXCEPTION would instead throw on a re-run, so
    // strip any previously-stamped prefixed keys before concatenating
    val cleaned = map_filter(col("attributes"),
      (k, _) => !k.startsWith(prefix))
    val successes = stats
      .withColumn("attributes", map_concat(cleaned, map(
        lit(prefix + "count"), fmt(col("rollingCount").cast("double")),
        lit(prefix + "value"), fmt(col("rollingSum")),
        lit(prefix + "mean"), fmt(col("rollingMean")),
        lit(prefix + "median"), fmt(col("rollingMedian")),
        lit(prefix + "variance"), fmt(col("rollingVariance")),
        lit(prefix + "stddev"), fmt(col("rollingStddev")),
        lit(prefix + "min"), fmt(col("rollingMin").cast("double")),
        lit(prefix + "max"), fmt(col("rollingMax").cast("double")))))
      .withColumn("relationship", lit("success"))
      .drop("__rw_value", "rollingCount", "rollingSum", "rollingMean",
        "rollingVariance", "rollingStddev", "rollingMedian", "rollingMin",
        "rollingMax")
    successes.unionByName(failures)
  }

  /** ANSI-safe string→double (std::stod analog minus partial-prefix
    * parses: "12abc" is a failure here, which is the stricter contract). */
  private def try_cast_double(c: Column): Column = c.try_cast("double")

  /**
   * MaxCollector (extensions/sql/data/MaxCollector.h:32): running max per
   * tracked column feeding QueryDatabaseTable's incremental state — plus
   * the row count the reference attaches as `querydbtable.row.count`.
   */
  def maxCollector(df: DataFrame, keyCols: Seq[Column],
                   maxCols: Seq[(String, Column)]): DataFrame =
    df.groupBy(keyCols: _*).agg(
      count(lit(1)).as("rowCount"),
      maxCols.map { case (name, c) => max(c).as(s"max_$name") }: _*)
}
