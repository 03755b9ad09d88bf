package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
   * PutSQL (extensions/sql/processors/PutSQL.h:34-44): execute
   * INSERT/UPDATE statements against the database. Spark-first the
   * "database" is the session catalog: rows append into a saved table in
   * one distributed write (the reference executes per-FlowFile statements
   * — batch insert is the scale-correct equivalent).
   */
  def putSql(df: DataFrame, table: String): Unit =
    df.write.mode("append").saveAsTable(table)

  /** Low 33 bits of monotonically_increasing_id = row offset within its
    * partition (in physical row order). */
  private val MidOffsetMask = (1L << 33) - 1

  /**
   * QueryDatabaseTable (extensions/sql/processors/QueryDatabaseTable.cpp:79,
   * buildSelectQuery :196): incremental pull `WHERE maxCol > lastMax`,
   * chunked into ≤ maxRowsPerFlowFile rowsets, with per-chunk row counts,
   * per-chunk bounds, and the new max-value state (MaxCollector.h:32) as
   * `maxvalue` on every row — the state the next trigger persists.
   *
   * Scale shape: range-partition on the pull order, sort *within* partitions
   * only, then chunk each partition's contiguous run of rows — no global
   * row_number (a single-partition WindowExec at 100 TB). Chunks are
   * non-overlapping ranges of the total order because range partitioning
   * assigns disjoint key ranges to partitions; chunk identity
   * (chunkPart, chunkId) depends on the partition count, so callers assert
   * partition-independent facts (counts ≤ cap, disjoint ranges, totals).
   *
   * Returns: chunkPart, chunkId, rowCount, ordMin, ordMax (struct bounds in
   * the pull order), chunkMax (max of maxValueCol), maxvalue (overall max —
   * a tree-reduced scalar broadcast onto every chunk, not a global window).
   *
   * Scale note: project `df` down to the pull columns before calling —
   * Catalyst cannot push column pruning through the nondeterministic
   * chunk-id projection, so an unpruned input shuffles every column.
   */
  def queryDatabaseTable(df: DataFrame, maxValueCol: Column, lastMax: Column,
                         order: Seq[Column], maxRowsPerFlowFile: Int): DataFrame = {
    val incremental = df.filter(maxValueCol > lastMax)
    val ranged = incremental
      .repartitionByRange(order.map(_.asc): _*)
      .sortWithinPartitions(order: _*)
    val ordStruct = struct(order: _*)
    // monotonically_increasing_id counts rows in physical order — which is
    // the pull order after sortWithinPartitions — so floor(offset / cap)
    // yields contiguous ≤cap chunks with no extra shuffle.
    val offset = monotonically_increasing_id().bitwiseAND(lit(MidOffsetMask))
    val chunks = ranged
      .withColumn("chunkPart", spark_partition_id().cast("long"))
      .withColumn("chunkId", floor(offset / maxRowsPerFlowFile))
      .groupBy(col("chunkPart"), col("chunkId"))
      .agg(
        count(lit(1)).as("rowCount"),
        min(ordStruct).as("ordMin"),
        max(ordStruct).as("ordMax"),
        max(maxValueCol).as("chunkMax"))
    chunks.crossJoin(broadcast(incremental.agg(max(maxValueCol).as("maxvalue"))))
  }
}
