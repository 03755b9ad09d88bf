package graft.streaming

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.util
import java.util.zip.CRC32

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * TailFile as a Structured Streaming source — SURVEY §2.1/§2.10.
 *
 * Re-expresses the reference's TailFile processor (extensions/
 * standard-processors/processors/TailFile.cpp:582; state struct
 * TailFile.h:90-113: per-file {position, checksum}; recovery
 * TailFile.h:243-245) as a Spark DataSource v2 `MicroBatchStream`:
 *
 *  - offset = JSON map path → {pos, crc} — persisted in the streaming
 *    checkpoint exactly where the reference uses its StateManager;
 *  - rotation detection: CRC32 of the first 64 bytes; a changed head CRC
 *    or a shrunk file means the path was rotated/truncated → restart at 0
 *    (TailFile "Initial Start Position" semantics);
 *  - only complete lines are emitted: the batch end position is capped at
 *    the last delimiter, like the reference's read-up-to-last-\n loop;
 *  - one InputPartition per tailed file → per-file parallelism on a
 *    cluster; readers seek directly (no full-file re-read per batch).
 *
 * Usage: spark.readStream.format("graft.streaming.TailFileSource")
 *          .option("path", dir).option("glob", ".*\\.log").load()
 */
class TailFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TailFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TailTable(properties.get("path"),
      Option(properties.get("glob")).getOrElse(".*"),
      Option(properties.get("initialStartPosition"))
        .exists(_.equalsIgnoreCase("Current Time")))
}

object TailFileSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("lineOffset", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** Tail state per file: read position + head checksum over the first
    * `crcLen` bytes (TailFile.h:90-113 position+checksum). The window
    * length is stored so a grown file re-verifies over the SAME prefix. */
  final case class FileState(pos: Long, crc: Long, crcLen: Long)

  /** Minimal JSON for the offset map — {"path":[pos,crc,crcLen],...}. */
  def stateToJson(m: Map[String, FileState]): String =
    m.toSeq.sortBy(_._1).map { case (p, s) =>
      "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") +
        s"""":[${s.pos},${s.crc},${s.crcLen}]"""
    }.mkString("{", ",", "}")

  def stateFromJson(j: String): Map[String, FileState] = {
    // hand-rolled parse of the fixed shape above
    val entry = """"((?:[^"\\]|\\.)*)":\[(\d+),(\d+),(\d+)\]""".r
    entry.findAllMatchIn(j).map { m =>
      val path = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
      path -> FileState(m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)
    }.toMap
  }

  /** CRC32 over the first min(n, len) bytes of the file. */
  def headCrc(f: java.io.File, n: Long = 64L): Long = {
    val raf = new RandomAccessFile(f, "r")
    try {
      val len = math.min(n, raf.length()).toInt
      val buf = new Array[Byte](len)
      raf.readFully(buf)
      val crc = new CRC32(); crc.update(buf); crc.getValue
    } finally raf.close()
  }

  /** Position just past the last '\n' at or before EOF (complete lines only). */
  def lastDelimiterEnd(f: java.io.File): Long = {
    val raf = new RandomAccessFile(f, "r")
    try {
      var p = raf.length() - 1
      while (p >= 0) {
        raf.seek(p)
        if (raf.readByte() == '\n') return p + 1
        p -= 1
      }
      0L
    } finally raf.close()
  }
}

private class TailTable(dir: String, glob: String,
                        startAtCurrent: Boolean) extends Table with SupportsRead {
  override def name(): String = s"tail:$dir"
  override def schema(): StructType = TailFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TailFileSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TailMicroBatchStream(dir, glob, startAtCurrent)
    }
}

private case class TailOffset(json: String) extends Offset {
  lazy val state: Map[String, TailFileSource.FileState] =
    TailFileSource.stateFromJson(json)
}

private class TailMicroBatchStream(dir: String, glob: String,
                                   startAtCurrent: Boolean = false)
  extends MicroBatchStream {
  import TailFileSource._

  private def listFiles(): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches(glob)).toSeq.sortBy(_.getPath)
  }

  /** Initial Start Position (TailFile.h InitialStartPositions,
    * TailFileTests.cpp:1469-1673): "Beginning of File" (default) starts
    * every file at byte 0; "Current Time" snapshots the files' CURRENT
    * end positions as the initial state, so only content appended after
    * the stream starts is emitted. Only consulted when no checkpoint
    * exists — a restart resumes from the checkpointed positions either
    * way, exactly like the reference's stored state taking precedence. */
  override def initialOffset(): Offset =
    if (!startAtCurrent) TailOffset("{}")
    else {
      val snapshot = listFiles().flatMap { f =>
        try {
          val crcLen = math.min(64L, f.length())
          // snapshot the file END (the reference starts at EOF in this
          // mode) — lastDelimiterEnd would rewind to before a pre-existing
          // unterminated tail line and emit it once completed
          Some(f.getPath -> FileState(f.length(), headCrc(f, crcLen), crcLen))
        } catch { case _: java.io.IOException => None }
      }.toMap
      knownState = snapshot
      TailOffset(stateToJson(snapshot))
    }

  /** Last successfully probed (or checkpoint-restored) per-file state —
    * carried forward when a probe fails transiently, so a momentary
    * IOException does not drop the stored position and force a re-read
    * from byte 0 (only a real head-CRC mismatch restarts a file). */
  @volatile private var knownState: Map[String, FileState] = Map.empty

  override def latestOffset(): Offset = {
    val next = listFiles().flatMap { f =>
      try {
        val crcLen = math.min(64L, f.length())
        val probed = FileState(lastDelimiterEnd(f), headCrc(f, crcLen), crcLen)
        // positions must be MONOTONIC per file: Structured Streaming
        // replaces the next batch's start with this END offset, so a
        // delimiter-aligned probe below an EOF snapshot (a pre-existing
        // partial tail line under Initial Start Position = Current Time)
        // would silently rewind the stream. Clamp to the known floor when
        // it is still the same file (head prefix verifies, length covers
        // the floor).
        val clamped = knownState.get(f.getPath) match {
          case Some(prev) if probed.pos < prev.pos &&
              f.length() >= prev.pos && f.length() >= prev.crcLen &&
              headCrc(f, prev.crcLen) == prev.crc =>
            probed.copy(pos = prev.pos)
          case _ => probed
        }
        Some(f.getPath -> clamped)
      } catch {
        // transient probe failure (mid-rotation, permission blip): keep the
        // previous trigger's state for this path; if it was a genuine
        // rotation the next successful probe's CRC check catches it
        case _: java.io.IOException => knownState.get(f.getPath).map(f.getPath -> _)
      }
    }.toMap
    knownState = next
    TailOffset(stateToJson(next))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].state
    val e = end.asInstanceOf[TailOffset].state
    e.flatMap { case (path, endState) =>
      val from = s.get(path) match {
        // rotation/truncation: the previous head prefix no longer matches
        // (re-hashed over the stored window) or the file shrank → restart 0
        case Some(prev) =>
          val f = new java.io.File(path)
          val sameHead = try {
            f.length() >= prev.crcLen &&
              TailFileSource.headCrc(f, prev.crcLen) == prev.crc
          } catch { case _: java.io.IOException => false }
          // truncation = the file shrank below the stored position (compare
          // against the FILE length, not endState.pos: a Current-Time
          // snapshot sits at EOF, legitimately past the delimiter-aligned
          // read ceiling of a trailing partial line)
          if (sameHead && prev.pos <= f.length()) prev.pos else 0L
        case _ => 0L
      }
      if (endState.pos > from) Some(TailPartition(path, from, endState.pos))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new TailReader(p.asInstanceOf[TailPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = {
    val o = TailOffset(json)
    // checkpoint-restart path: seed the carry-forward state from the
    // restored offset so the first trigger also survives a probe failure
    if (knownState.isEmpty) knownState = o.state
    o
  }
}

private case class TailPartition(path: String, from: Long, until: Long)
  extends InputPartition

/**
 * Seeks to `from`, reads [from, until), emits one row per line.
 *
 * Robust to the file rotating/truncating BETWEEN offset planning and the
 * read (the reference re-opens and re-checks per trigger): the read clamps
 * to the currently-available length and drops a trailing incomplete line;
 * a vanished or shrunk-below-`from` file yields zero rows. The next
 * batch's head-CRC check then detects the rotation and restarts at 0 —
 * a truncation mid-batch must not fail the task.
 */
private class TailReader(p: TailPartition) extends PartitionReader[InternalRow] {
  private val lines: Array[String] =
    try {
      val raf = new RandomAccessFile(p.path, "r")
      try {
        val avail = raf.length()
        if (avail <= p.from) Array.empty
        else {
          val until = math.min(p.until, avail)
          raf.seek(p.from)
          val buf = new Array[Byte]((until - p.from).toInt)
          raf.readFully(buf)
          val text = new String(buf, StandardCharsets.UTF_8)
          // `until == p.until` is just past a '\n' by construction; a
          // clamped read may end mid-line — drop the incomplete tail
          text.split("\n", -1).dropRight(1)
        }
      } finally raf.close()
    } catch { case _: java.io.IOException => Array.empty }
  private var idx = -1
  private var offset = p.from

  override def next(): Boolean = { idx += 1; idx < lines.length }
  override def get(): InternalRow = {
    val lineStart = offset
    offset += lines(idx).getBytes(StandardCharsets.UTF_8).length + 1
    InternalRow(UTF8String.fromString(p.path), lineStart,
      UTF8String.fromString(lines(idx)))
  }
  override def close(): Unit = ()
}
