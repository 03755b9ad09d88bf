package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SQL extension operators — SURVEY §2.1/§3.3 (extensions/sql/).
 *
 * The reference runs SQL against *external* databases; Spark-first, the
 * engine itself is the database, so ExecuteSQL = `spark.sql` over registered
 * views and QueryDatabaseTable = an incremental predicate pull whose
 * max-value state lives in the caller's checkpoint (streaming) or return
 * value (batch).
 */
object SqlOps {

  /**
   * ExecuteSQL (extensions/sql/processors/ExecuteSQL.cpp): run a SQL query;
   * rowsets become FlowFiles. Catalyst plans/optimizes the statement —
   * pushdown and pruning come free where the reference streams whole
   * rowsets.
   */
  def executeSql(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /**
   * QueryDatabaseTable (extensions/sql/processors/QueryDatabaseTable.cpp:79,
   * buildSelectQuery :196): incremental pull `WHERE maxCol > lastMax`,
   * chunked into ≤ maxRowsPerFlowFile rowsets, with per-chunk row counts and
   * the new max-value state (MaxCollector.h:32).
   *
   * Returns the chunked frame: chunkId, rowCount, chunkMax — plus the
   * running overall max as `maxvalue` (the state the next trigger would
   * persist). The total order needed for stable chunking is the oracle-exact
   * batch shape; the streaming variant keys chunks per partition.
   */
  def queryDatabaseTable(df: DataFrame, maxValueCol: Column, lastMax: Column,
                         order: Seq[Column], maxRowsPerFlowFile: Int): DataFrame = {
    val incremental = df.filter(maxValueCol > lastMax)
    val rn = row_number().over(Window.orderBy(order: _*))
    incremental
      .withColumn("chunkId", floor((rn.cast("long") - 1) / maxRowsPerFlowFile))
      .groupBy(col("chunkId"))
      .agg(
        count(lit(1)).as("rowCount"),
        max(maxValueCol).as("chunkMax"))
  }
}
