package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming operators — SURVEY §2.5/§2.10.
 *
 * DefragmentText (DefragmentText.cpp:59, props DefragmentText.h:64-89) and
 * MergeContent/BinFiles bin ageing (BinFiles.cpp:284) are cross-FlowFile
 * buffering with a flush-on-timeout: the Spark-native shape is
 * `groupByKey(source).flatMapGroupsWithState` with a processing-time
 * timeout — the group state is the open buffer, the timeout is
 * MaxBufferAge / Max Bin Age, and timeout flushes route to `expired`
 * (matching the reference's failure/original routing for incomplete
 * buffers).
 *
 * State is per-key and checkpointed by Spark (RocksDB state store at
 * scale) — the 100 TB posture is one state entry per active source/bin,
 * not per row.
 */
object StatefulOps {

  case class Line(source: String, ord: Long, line: String)
  case class Message(source: String, message: String, lineCount: Int,
                     relationship: String)
  case class Buffer(lines: List[Line])

  /**
   * Streaming DefragmentText: buffer lines per source; a line matching
   * `startPattern` flushes the current buffer as a complete message;
   * `maxBufferAgeMs` without input flushes the remainder to `expired`.
   */
  def defragmentText(lines: Dataset[Line], startPattern: String,
                     maxBufferAgeMs: Long): Dataset[Message] = {
    val pattern = startPattern.r
    implicit val msgEnc = Encoders.product[Message]
    implicit val bufEnc = Encoders.product[Buffer]
    implicit val strEnc = Encoders.STRING
    // maxBufferAgeMs <= 0 disables the age flush (NoTimeout) — also keeps
    // the engine from running continuous timeout-evaluation batches where
    // the age semantics aren't wanted (e.g. AvailableNow drains)
    val timeoutConf =
      if (maxBufferAgeMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def flush(source: String, buf: List[Line], rel: String): Option[Message] =
      if (buf.isEmpty) None
      else Some(Message(source,
        buf.sortBy(_.ord).map(_.line).mkString("\n"), buf.size, rel))

    lines.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (source: String, rows: Iterator[Line], state: GroupState[Buffer]) =>
          if (state.hasTimedOut) {
            val out = flush(source, state.getOption.map(_.lines).getOrElse(Nil),
              "expired")
            state.remove()
            out.iterator
          } else {
            var buf = state.getOption.map(_.lines).getOrElse(Nil)
            val out = List.newBuilder[Message]
            rows.toSeq.sortBy(_.ord).foreach { l =>
              if (pattern.findFirstIn(l.line).isDefined) {
                flush(source, buf, "success").foreach(out += _)
                buf = List(l)
              } else buf = buf :+ l
            }
            state.update(Buffer(buf))
            if (maxBufferAgeMs > 0) state.setTimeoutDuration(maxBufferAgeMs)
            out.result().iterator
          }
      }
  }

  case class Entry(correlation: String, ord: Long, content: String)
  case class Bin(correlation: String, merged: String, count: Int,
                 relationship: String)
  case class BinBuffer(entries: List[Entry])

  /**
   * Streaming MergeContent (Bin-Pack): accumulate per correlation key until
   * `maxEntries` (flush full bin) or `maxBinAgeMs` (flush partial bin to
   * `expired` — Max Bin Age semantics, BinFiles.cpp:284).
   */
  def mergeContentBins(entries: Dataset[Entry], maxEntries: Int,
                       maxBinAgeMs: Long, demarcator: String): Dataset[Bin] = {
    implicit val binEnc = Encoders.product[Bin]
    implicit val bufEnc = Encoders.product[BinBuffer]
    implicit val strEnc = Encoders.STRING
    val timeoutConf =
      if (maxBinAgeMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def emit(key: String, es: List[Entry], rel: String): Bin =
      Bin(key, es.sortBy(_.ord).map(_.content).mkString(demarcator), es.size, rel)

    entries.groupByKey(_.correlation)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[Entry], state: GroupState[BinBuffer]) =>
          if (state.hasTimedOut) {
            val pending = state.getOption.map(_.entries).getOrElse(Nil)
            state.remove()
            if (pending.isEmpty) Iterator.empty
            else Iterator(emit(key, pending, "expired"))
          } else {
            var buf = state.getOption.map(_.entries).getOrElse(Nil)
            val out = List.newBuilder[Bin]
            rows.toSeq.sortBy(_.ord).foreach { e =>
              buf = buf :+ e
              if (buf.size >= maxEntries) { out += emit(key, buf, "merged"); buf = Nil }
            }
            if (buf.isEmpty) state.remove()
            else {
              state.update(BinBuffer(buf))
              if (maxBinAgeMs > 0) state.setTimeoutDuration(maxBinAgeMs)
            }
            out.result().iterator
          }
      }
  }
}
