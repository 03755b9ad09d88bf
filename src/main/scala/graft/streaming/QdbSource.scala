package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * QueryDatabaseTable as a Structured Streaming source — SURVEY §2.1/§3.3.
 *
 * The reference's core value is the *stateful* incremental pull: a
 * max-value vector persisted across triggers so each run emits only rows
 * whose tracked column exceeds the stored maximum
 * (extensions/sql/processors/QueryDatabaseTable.cpp:79,112-115; state
 * machinery StateManager.h:34-50, MaxCollector.h:32). Spark-first that
 * state IS the stream offset: a DataSource-v2 `MicroBatchStream` whose
 * offset is `{"max": N}`, checkpointed by Structured Streaming exactly
 * where the reference uses its StateManager — restart resumes from the
 * persisted max and never re-emits rows at or below it.
 *
 * The backing "table" is a directory of CSV-line files (`id,payload`
 * rows, `id` = the max-value column) standing in for the external
 * database of the reference; the contract under test is the offset loop,
 * not the wire protocol. `latestOffset` plays the role of the
 * reference's `SELECT MAX(...)` round trip to the source system.
 *
 * Usage: spark.readStream.format("graft.streaming.QdbSource")
 *          .option("path", dir).load()
 */
class QdbSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QdbSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new QdbTable(properties.get("path"))
}

object QdbSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Parse "id,payload" lines of one file. */
  def readRows(f: java.io.File): Seq[(Long, String)] =
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map { l =>
        val i = l.indexOf(',')
        (l.substring(0, i).toLong, l.substring(i + 1))
      }
}

private class QdbTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"qdb:$dir"
  override def schema(): StructType = QdbSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = QdbSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new QdbMicroBatchStream(dir)
    }
}

/** Offset = the max-value state ("maxvalue." attribute of the reference),
  * PLUS the source identity it was collected against. The reference resets
  * its stored state when the Table Name or Maximum-value Columns change
  * (QueryDatabaseTableTests.cpp:170-247); here the identity is the source
  * path, and a checkpoint replayed against a different source starts over
  * instead of silently filtering by a stale maximum. */
private case class QdbOffset(json: String) extends Offset {
  lazy val max: Long = {
    val m = """"max":(-?\d+)""".r.findFirstMatchIn(json)
    m.map(_.group(1).toLong).getOrElse(Long.MinValue)
  }
  /** None on legacy {"max":N} offsets — treated as matching any source. */
  lazy val src: Option[String] = {
    val m = """"src":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
    m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
  }
  def maxFor(currentSrc: String): Long =
    if (src.forall(_ == currentSrc)) max else Long.MinValue
}

private object QdbOffset {
  def of(max: Long, src: String): QdbOffset = {
    val esc = src.replace("\\", "\\\\").replace("\"", "\\\"")
    QdbOffset(s"""{"src":"$esc","max":$max}""")
  }
}

private class QdbMicroBatchStream(dir: String) extends MicroBatchStream {

  private def listFiles(): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".csv")).toSeq.sortBy(_.getPath)
  }

  override def initialOffset(): Offset = QdbOffset.of(Long.MinValue, dir)

  /** The reference's per-trigger MAX(...) probe against the source. */
  override def latestOffset(): Offset = {
    val ids = listFiles().iterator.flatMap(f => QdbSource.readRows(f)).map(_._1)
    QdbOffset.of(if (ids.isEmpty) Long.MinValue else ids.max, dir)
  }

  /** One partition per backing file; each emits rows in (startMax, endMax].
    * A start offset recorded against a DIFFERENT source resets to the
    * beginning (the reference's state-reset-on-config-change). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[QdbOffset].maxFor(dir)
    val e = end.asInstanceOf[QdbOffset].max
    if (e <= s) Array.empty
    else listFiles().map(f => QdbPartition(f.getPath, s, e)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new QdbReader(p.asInstanceOf[QdbPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = QdbOffset(json)
}

private case class QdbPartition(path: String, fromMax: Long, untilMax: Long)
  extends InputPartition

private class QdbReader(p: QdbPartition) extends PartitionReader[InternalRow] {
  private val rows = QdbSource.readRows(new java.io.File(p.path))
    .filter { case (id, _) => id > p.fromMax && id <= p.untilMax }
  private var idx = -1
  override def next(): Boolean = { idx += 1; idx < rows.length }
  override def get(): InternalRow =
    InternalRow(rows(idx)._1, UTF8String.fromString(rows(idx)._2))
  override def close(): Unit = ()
}
