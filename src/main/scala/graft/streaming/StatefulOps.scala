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
  /** Open buffer: lines in REVERSE arrival order (O(1) prepend; flush
    * sorts by ord anyway) + running byte size for the MaxBufferSize cap. */
  case class Buffer(lines: List[Line], bytes: Long)

  /**
   * Streaming DefragmentText (DefragmentText.h:64-89): buffer lines per
   * source; pattern location decides the message boundary —
   * START_OF_MESSAGE flushes the open buffer when a match arrives,
   * END_OF_MESSAGE flushes buffer+match when a match arrives. MaxBufferAge
   * without input flushes the remainder (success for start patterns,
   * failure for end patterns — DefragmentText.h:78-80); MaxBufferSize
   * overflow flushes the buffer to `failure` (:85-87). Age/size caps of 0
   * disable the respective flush.
   */
  def defragmentText(lines: Dataset[Line], startPattern: String,
                     maxBufferAgeMs: Long,
                     maxBufferBytes: Long = 0,
                     patternAtStart: Boolean = true): Dataset[Message] = {
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
    val ageFlushRel = if (patternAtStart) "success" else "failure"

    def flush(source: String, buf: Buffer, rel: String): Option[Message] =
      if (buf.lines.isEmpty) None
      else Some(Message(source,
        buf.lines.sortBy(_.ord).map(_.line).mkString("\n"), buf.lines.size, rel))

    val empty = Buffer(Nil, 0L)

    lines.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (source: String, rows: Iterator[Line], state: GroupState[Buffer]) =>
          if (state.hasTimedOut) {
            val out = flush(source, state.getOption.getOrElse(empty), ageFlushRel)
            state.remove()
            out.iterator
          } else {
            var buf = state.getOption.getOrElse(empty)
            val out = List.newBuilder[Message]
            def add(l: Line): Unit = {
              // byte-based cap like the reference (DefragmentText.h:85-87):
              // encoded UTF-8 size + the joining newline, not char count
              val sz = l.line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length +
                (if (buf.lines.isEmpty) 0 else 1)
              buf = Buffer(l :: buf.lines, buf.bytes + sz)
              if (maxBufferBytes > 0 && buf.bytes > maxBufferBytes) {
                flush(source, buf, "failure").foreach(out += _)
                buf = empty
              }
            }
            rows.toSeq.sortBy(_.ord).foreach { l =>
              val isBoundary = pattern.findFirstIn(l.line).isDefined
              if (patternAtStart) {
                if (isBoundary) { flush(source, buf, "success").foreach(out += _); buf = empty }
                add(l)
              } else {
                add(l)
                if (isBoundary) { flush(source, buf, "success").foreach(out += _); buf = empty }
              }
            }
            if (buf.lines.isEmpty) state.remove()
            else {
              state.update(buf)
              if (maxBufferAgeMs > 0) state.setTimeoutDuration(maxBufferAgeMs)
            }
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
   * the bin is FULL — `maxEntries` entries or `maxBinBytes` content bytes
   * (Bin::isFull, BinFiles.h:60-62; like the batch sized variant the
   * straddling entry is admitted, so a bin may exceed `maxBinBytes` by
   * less than one entry) — or `maxBinAgeMs` elapses with the bin open
   * (BinFiles.cpp:284 removeOldestBin → closed → ready).
   *
   * Every flush routes through the same min check as the batch
   * `mergeContentBinPackSized`: `merged` when the bin holds ≥ `minEntries`
   * entries and ≥ `minBinBytes` content (Bin::isReadyForMerge,
   * BinFiles.h:64-66), `undersized` otherwise — an aged-out bin below the
   * mins is the undersized route, a full or aged bin meeting them merges.
   * Size counts content length like the batch variant's `length(content)`
   * (demarcators excluded). `maxBinBytes`/`minBinBytes` of 0 disable the
   * respective size rule.
   */
  def mergeContentBins(entries: Dataset[Entry], maxEntries: Int,
                       maxBinAgeMs: Long, demarcator: String,
                       maxBinBytes: Long = 0, minEntries: Int = 1,
                       minBinBytes: Long = 0): Dataset[Bin] = {
    implicit val binEnc = Encoders.product[Bin]
    implicit val bufEnc = Encoders.product[BinBuffer]
    implicit val strEnc = Encoders.STRING
    val timeoutConf =
      if (maxBinAgeMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def binBytes(es: List[Entry]): Long = es.map(_.content.length.toLong).sum
    def emit(key: String, es: List[Entry]): Bin = {
      val rel =
        if (es.size >= minEntries && binBytes(es) >= minBinBytes) "merged"
        else "undersized"
      Bin(key, es.sortBy(_.ord).map(_.content).mkString(demarcator), es.size, rel)
    }

    entries.groupByKey(_.correlation)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[Entry], state: GroupState[BinBuffer]) =>
          if (state.hasTimedOut) {
            val pending = state.getOption.map(_.entries).getOrElse(Nil)
            state.remove()
            if (pending.isEmpty) Iterator.empty
            else Iterator(emit(key, pending))
          } else {
            // reverse arrival order (O(1) prepend); emit sorts by ord
            var buf = state.getOption.map(_.entries).getOrElse(Nil)
            var bytes = binBytes(buf)
            val out = List.newBuilder[Bin]
            rows.toSeq.sortBy(_.ord).foreach { e =>
              buf = e :: buf
              bytes += e.content.length
              if (buf.size >= maxEntries ||
                  (maxBinBytes > 0 && bytes >= maxBinBytes)) {
                out += emit(key, buf); buf = Nil; bytes = 0L
              }
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
