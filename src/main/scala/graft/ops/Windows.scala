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
   * count, sum, mean, variance, stddev, min, max (median via exact
   * percentile when requested). Time mode maps to a tumbling event-time
   * bucket: one shuffle on (keys, bucket); partial aggregation is map-side.
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
    grouped.agg(
      n.as("cnt"),
      s.cast("double").as("valueSum"),
      (s.cast("double") / n).as("mean"),
      // divisor clamped to ≥1: ANSI mode errors on 0-division even under a
      // conditional guard (subexpression elimination evaluates eagerly);
      // callers null out the n=1 case where variance is undefined
      ((sq.cast("double") - s.cast("double") * s.cast("double") / n) /
        greatest(n - lit(1), lit(1L))).as("variance"),
      min(valueCol).as("minValue"),
      max(valueCol).as("maxValue"),
      // exact interpolated median (AttributeRollingWindow emits median;
      // percentile_approx would not be engine-portable)
      median(valueCol).as("median"))
  }

  /**
   * AttributeRollingWindow, count mode ("Window length" N): stats over the
   * last N rows per key — a row-frame analytic window
   * (rowsBetween(-N+1, 0)), one shuffle on the partition key.
   */
  def rollingWindowCount(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                         valueCol: Column, windowLength: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(-(windowLength - 1), Window.currentRow)
    df.withColumn("rollingCount", count(lit(1)).over(w))
      .withColumn("rollingSum", sum(dec(valueCol)).over(w).cast("double"))
      .withColumn("rollingMean",
        (sum(dec(valueCol)).over(w).cast("double") / count(lit(1)).over(w)))
      .withColumn("rollingMin", min(valueCol).over(w))
      .withColumn("rollingMax", max(valueCol).over(w))
  }

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
