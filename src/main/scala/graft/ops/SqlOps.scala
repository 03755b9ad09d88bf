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
   * SQL column identifier with escape-agnostic value semantics
   * (extensions/sql/data/SQLColumnIdentifier.h;
   * SQLColumnIdentifierTests.cpp): `Abc`, `"Abc"` (standard), `[Abc]`
   * (MS SQL) and backticked (MySQL) forms all denote column Abc; a
   * single-character string never unescapes; `str` keeps the original
   * representation; equality and hashing compare the unescaped value
   * (case-sensitively).
   */
  final case class SqlColumnIdentifier(str: String) {
    val value: String =
      if (str.length < 2) str
      else (str.head, str.last) match {
        case ('"', '"') | ('`', '`') | ('[', ']') =>
          str.substring(1, str.length - 1)
        case _ => str
      }
    override def equals(o: Any): Boolean = o match {
      case other: SqlColumnIdentifier => value == other.value
      case _ => false
    }
    override def hashCode: Int = value.hashCode
  }

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
   * Substitute positional `?` parameters with literals — the reference
   * binds `sql.args.N.value` attributes positionally through soci
   * (SQLProcessor collectArguments) and lets SQLite's column affinity
   * coerce; under Spark's ANSI store assignment a quoted numeric cannot
   * INSERT into a numeric column, so an argument that lexes as a SQL
   * number binds as a bare numeric literal and anything else as an
   * escaped string. `?` inside single-quoted strings is not a parameter.
   * Throws when the statement has more parameters than arguments
   * (ExecuteSQLTests.cpp:210 / PutSQLTests.cpp:85 route that input to
   * failure).
   */
  private val SqlNumber = """[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?""".r
  private[graft] def bindPositionalArgs(statement: String,
                                        args: Seq[String]): String = {
    val sb = new StringBuilder
    var inStr = false
    var argI = 0
    statement.foreach { ch =>
      if (inStr) { sb.append(ch); if (ch == '\'') inStr = false }
      else if (ch == '\'') { inStr = true; sb.append(ch) }
      else if (ch == '?') {
        require(argI < args.length,
          s"statement has ${argI + 1}+ positional parameters but only " +
            s"${args.length} sql.args values")
        args(argI) match {
          case n if SqlNumber.matches(n) => sb.append(n)
          case s => sb.append('\'').append(s.replace("'", "''")).append('\'')
        }
        argI += 1
      } else sb.append(ch)
    }
    sb.toString
  }

  /**
   * ExecuteSQL's FlowFile output surface (ExecuteSQL.cpp:32,
   * FlowFileSource.h:58-64): the rowset renders as a JSON array of row
   * objects in result order, split into FlowFiles of at most
   * `maxRowsPerFlowFile` rows (0 = the whole rowset in one), each carrying
   * `executesql.row.count` and the fragment attribute trio. An empty
   * rowset still emits ONE FlowFile with `[]` and row count 0.
   *
   * Returns (content, rowCount, fragmentIndex, fragmentCount, fragmentId).
   *
   * Scale shape: the global row index = per-partition cumulative offset
   * (a metadata-scale collect of partition counts, the Sampling range-total
   * pattern) + the row's partition-local monotonic offset — no global
   * window. Chunks then group in ONE shuffle with at most `maxRows` rows
   * per group. With maxRows=0 the whole rowset lands in one group — the
   * reference's single-FlowFile semantic; set a cap for large results.
   */
  def executeSqlRowsets(spark: SparkSession, statement: String,
                        args: Seq[String], maxRowsPerFlowFile: Int,
                        fragmentId: String): DataFrame =
    rowsetChunks(spark.sql(bindPositionalArgs(statement, args)),
      maxRowsPerFlowFile, fragmentId, emptyRowset = true)

  /**
   * Chunk `rows` — whose partition-major physical order IS the output
   * order (a sorted frame's range partitions are pid-ascending) — into
   * JSON-array rowset FlowFiles of at most `maxRows` rows (0 = all in
   * one). Shared by ExecuteSQL and QueryDatabaseTable
   * (FlowFileSource.h:50-64). `emptyRowset` controls the zero-row case:
   * ExecuteSQL emits one `[]` FlowFile, QueryDatabaseTable emits nothing
   * (QueryDatabaseTableTests.cpp:54-92 requery with no new rows).
   *
   * Scale shape: the global row index is the per-partition cumulative
   * offset (a metadata-scale collect of partition counts, the Sampling
   * range-total pattern) + the row's partition-local monotonic offset —
   * no global window; chunks then group in ONE shuffle bounded by
   * `maxRows` rows per group.
   */
  def rowsetChunks(rows: DataFrame, maxRows: Int, fragmentId: String,
                   emptyRowset: Boolean = false): DataFrame = {
    val spark = rows.sparkSession
    val jsonOpts = new java.util.HashMap[String, String]()
    jsonOpts.put("ignoreNullFields", "false") // SELECT * keeps null columns
    val json = to_json(struct(rows.columns.map(c => col(s"`$c`")): _*),
      jsonOpts)
    val withMid = rows.select(json.as("__j"))
      .withColumn("__mid", monotonically_increasing_id())
    val parts = withMid
      .groupBy(shiftrightunsigned(col("__mid"), 33).as("__p"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = parts.map(_._2).sum
    if (total == 0) {
      val one = spark.range(1).select(
        lit("[]").as("content"), lit(0L).as("rowCount"),
        lit(0L).as("fragmentIndex"), lit(1L).as("fragmentCount"),
        lit(fragmentId).as("fragmentId"))
      return if (emptyRowset) one else one.limit(0)
    }
    val effMax = if (maxRows > 0) maxRows.toLong else total
    val fragCount = (total + effMax - 1) / effMax
    var acc = 0L
    val offsets = parts.map { case (p, n) => val o = acc; acc += n; (p, o) }
    val offCol = element_at(
      map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }.toSeq: _*),
      shiftrightunsigned(col("__mid"), 33))
    withMid
      .withColumn("__gidx", offCol + col("__mid").bitwiseAND(lit(MidOffsetMask)))
      .withColumn("__chunk", (col("__gidx") / effMax).cast("long"))
      .groupBy("__chunk")
      .agg(count(lit(1)).as("rowCount"),
        concat(lit("["),
          array_join(transform(
            sort_array(collect_list(struct(col("__gidx"), col("__j")))),
            _.getField("__j")), ","),
          lit("]")).as("content"))
      .select(col("content"), col("rowCount"),
        col("__chunk").as("fragmentIndex"),
        lit(fragCount).as("fragmentCount"),
        lit(fragmentId).as("fragmentId"))
  }

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
