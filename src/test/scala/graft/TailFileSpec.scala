package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

/**
 * TailFile battery port — extensions/standard-processors/tests/unit/
 * TailFileTests.cpp, the rotation/delimiter/lookup corner cases (VERDICT
 * round-6 ask #2). Each test cites the TEST_CASE it re-expresses.
 *
 * Mapping note: the reference emits one FlowFile per piece INCLUDING the
 * trailing delimiter ("one,"); the Spark row model emits the piece text
 * without it, with (path, lineOffset) carrying the byte provenance the
 * reference encodes in the `filename.<start>-<end>` attribute. Assertions
 * below compare delimiter-stripped pieces.
 */
class TailFileSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def setMtime(p: Path, epochMs: Long): Unit =
    Files.setLastModifiedTime(p, FileTime.fromMillis(epochMs))

  /** Start a parquet-sink tail query over `dir`. */
  private case class Tail(dir: Path, glob: String,
                          opts: Map[String, String] = Map.empty) {
    val ckpt: Path = tmp("tail_ckpt"); val out: Path = tmp("tail_out")
    private var q: org.apache.spark.sql.streaming.StreamingQuery = _
    def start(): this.type = {
      var r = spark.readStream.format("graft.streaming.TailFileSource")
        .option("path", dir.toString).option("glob", glob)
      opts.foreach { case (k, v) => r = r.option(k, v) }
      q = r.load().writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      this
    }
    def trigger(): Unit = q.processAllAvailable()
    def stop(): Unit = q.stop()
    /** (fileName, lineOffset, piece) sorted by (fileName, lineOffset). */
    def rows(): Seq[(String, Long, String)] =
      spark.read.parquet(out.toString).collect()
        .map(r => (new java.io.File(r.getAs[String]("path")).getName,
          r.getAs[Long]("lineOffset"), r.getAs[String]("line")))
        .toSeq.sortBy(t => (t._1, t._2))
    def pieces(): Seq[String] = rows().map(_._3)
  }

  test("custom delimiter: reads up to the last delimiter, the unfinished " +
       "piece is held back until its delimiter arrives " +
       "(TailFileTests.cpp:79-124,1278-1315)") {
    val dir = tmp("tail_delim")
    val log = dir.resolve("fruits.log")
    Files.writeString(log, "Apple:Orange:")
    val t = Tail(dir, "fruits\\.log", Map("delimiter" -> ":")).start()
    t.trigger()
    assert(t.pieces() === Seq("Apple", "Orange"))

    // an append without a trailing delimiter stays held back (append, not
    // rewrite: the query free-runs between triggers, and a truncate-rewrite
    // window would legitimately read as a rotation)
    Files.writeString(log, "Pear", java.nio.file.StandardOpenOption.APPEND)
    t.trigger()
    assert(t.pieces() === Seq("Apple", "Orange"))

    // the delimiter arriving "between runs" completes the piece
    Files.writeString(log, ":", java.nio.file.StandardOpenOption.APPEND)
    t.trigger()
    assert(t.pieces() === Seq("Apple", "Orange", "Pear"))
    t.stop()
  }

  test("rotation: finds and finishes the renamed file — including its " +
       "UNTERMINATED tail piece — and continues with the new log file " +
       "(TailFileTests.cpp:748-813; TailFile.cpp:688 is_rotated_)") {
    val dir = tmp("tail_rot")
    val log = dir.resolve("testfifo.txt")
    // NEWLINE_FILE (TailFileTests.cpp:48): delimiter ','; the last piece
    // " seven" has no trailing delimiter
    Files.writeString(log, "one,two,three\nfour,five,six, seven")
    val t = Tail(dir, "testfifo\\.txt", Map("delimiter" -> ",")).start()
    t.trigger()
    assert(t.pieces() === Seq("one", "two", "three\nfour", "five", "six"))

    // logrotate between runs: the reference mutates between discrete
    // triggers; a free-running query could observe the half-rotated state,
    // so stop the stream around the mutation window (restart-safe rotation
    // recovery is itself under test in the restart spec)
    t.stop()
    Files.move(log, dir.resolve("testfifo.txt.1"))
    setMtime(dir.resolve("testfifo.txt.1"), System.currentTimeMillis())
    Files.writeString(log, "five,six,")
    t.start()
    t.trigger()
    val rows = t.rows()
    // the rotated file's pending " seven" IS emitted (read to EOF), from
    // byte offset 28 of the renamed file
    assert(rows.contains(("testfifo.txt.1", 28L, " seven")))
    // the new file restarts at 0 — "five"/"six" re-appear as NEW pieces of
    // the new file (offsets 0 and 5), alongside the first trigger's five
    // cumulative rows for the original file
    assert(rows.contains(("testfifo.txt", 0L, "five")))
    assert(rows.contains(("testfifo.txt", 5L, "six")))
    assert(rows.size === 8)
    t.stop()
  }

  test("rotation: finds and finishes MULTIPLE rotated files in order and " +
       "continues with the new log file (TailFileTests.cpp:815-872)") {
    val dir = tmp("tail_rot2")
    val log = dir.resolve("fruits.log")
    Files.writeString(log, "Apple:Orange:")
    val t = Tail(dir, "fruits\\.log", Map("delimiter" -> ":")).start()
    t.trigger()
    assert(t.pieces() === Seq("Apple", "Orange"))

    // two rotations between triggers: the tracked file (with pending
    // "Pear:") becomes fruits.0.log; an intermediate never-tracked file
    // becomes fruits.1.log; a fresh main file appears. Stop the stream
    // for the mutation window (see the single-rotation test).
    t.stop()
    Files.writeString(log, "Pear:", java.nio.file.StandardOpenOption.APPEND)
    Files.move(log, dir.resolve("fruits.0.log"))
    setMtime(dir.resolve("fruits.0.log"), System.currentTimeMillis())
    Files.writeString(log, "Pineapple:Kiwi:")
    Files.move(log, dir.resolve("fruits.1.log"))
    setMtime(dir.resolve("fruits.1.log"), System.currentTimeMillis())
    Files.writeString(log, "Apricot:")
    t.start()
    t.trigger()

    val rows = t.rows()
    // fruits.0.log CONTINUES from the stored position 13 (prefix checksum
    // match) — only "Pear" is new; fruits.1.log is read in full
    assert(rows.contains(("fruits.0.log", 13L, "Pear")))
    assert(!rows.exists(r => r._1 == "fruits.0.log" && r._2 < 13L))
    assert(rows.filter(_._1 == "fruits.1.log").map(_._3) ===
      Seq("Pineapple", "Kiwi"))
    assert(rows.filter(r => r._1 == "fruits.log" && r._2 == 0L).map(_._3)
      .contains("Apricot"))
    t.stop()
  }

  test("rotation: ignores rotated files with mtime older than the last " +
       "read time (TailFileTests.cpp:874-914; TailFile.cpp:545-549)") {
    val dir = tmp("tail_old")
    val now = System.currentTimeMillis()
    val oldRoll = dir.resolve("test.2019-08-20")
    Files.writeString(oldRoll, "line1\nline2\nline3\nline4\n")
    setMtime(oldRoll, now - 3600 * 1000L) // very old rotated file
    val log = dir.resolve("test.log")
    Files.writeString(log, "line5\nline6\nline7\n")

    val t = Tail(dir, "test\\.log").start()
    t.trigger()
    assert(t.pieces() === Seq("line5", "line6", "line7"))

    t.stop()
    Files.move(log, dir.resolve("test.2020-05-18"))
    setMtime(dir.resolve("test.2020-05-18"), System.currentTimeMillis())
    Files.writeString(log, "line8\nline9\n")
    t.start()
    t.trigger()
    val rows = t.rows()
    // the fresh rotated file was already fully read (continuation finds no
    // pending bytes); the OLD rotated file is never touched
    assert(!rows.exists(_._1 == "test.2019-08-20"))
    assert(rows.map(_._3).sorted === Seq("line5", "line6", "line7",
      "line8", "line9").sorted)
    t.stop()
  }

  test("Rolling Filename Pattern: default ${filename}.* picks up an " +
       "unrelated checksum-mismatched sibling in full; a tighter pattern " +
       "excludes it; a pattern without ${filename} works too " +
       "(TailFileTests.cpp:977-1036)") {
    def run(pattern: Option[String]): Seq[(String, Long, String)] = {
      val dir = tmp("tail_pat")
      val log = dir.resolve("test.log")
      Files.writeString(log, "some stuff\n")
      val opts = pattern.map(p => Map("rollingPattern" -> p)).getOrElse(Map())
      val t = Tail(dir, "test\\.log", opts).start()
      t.trigger()
      assert(t.pieces() === Seq("some stuff"))

      t.stop() // mutation window — see the single-rotation test
      Files.writeString(log, "some stuff\none more line\n")
      Files.move(log, dir.resolve("test.rolled.log"))
      setMtime(dir.resolve("test.rolled.log"), System.currentTimeMillis())
      Files.writeString(dir.resolve("test.txt"), "unrelated stuff\n")
      setMtime(dir.resolve("test.txt"), System.currentTimeMillis())
      // same contents as test.rolled.log (TailFileTests.cpp:1026)
      Files.writeString(dir.resolve("other_rolled.log"),
        "some stuff\none more line\n")
      setMtime(dir.resolve("other_rolled.log"), System.currentTimeMillis())
      Files.writeString(log, "")
      t.start()
      t.trigger()
      val rows = t.rows(); t.stop(); rows
    }

    // default ${filename}.* → "test.*": the rolled file continues from 11
    // ("one more line") AND the unrelated test.txt is read in full
    val defRows = run(None)
    assert(defRows.contains(("test.rolled.log", 11L, "one more line")))
    assert(defRows.contains(("test.txt", 0L, "unrelated stuff")))
    assert(!defRows.exists(_._1 == "other_rolled.log"))

    // ${filename}.*.log excludes the .txt sibling
    val logRows = run(Some("${filename}.*.log"))
    assert(logRows.contains(("test.rolled.log", 11L, "one more line")))
    assert(!logRows.exists(_._1 == "test.txt"))

    // a pattern not based on the tailed name: only other_rolled.log —
    // whose prefix checksum MATCHES the stored state → continuation
    val otherRows = run(Some("other_roll??.log"))
    assert(otherRows.contains(("other_rolled.log", 11L, "one more line")))
    assert(!otherRows.exists(r => r._1 == "test.rolled.log" || r._1 == "test.txt"))
  }

  test("rotation after a checkpoint restart: the renamed file is finished " +
       "and the new file started, using only persisted state " +
       "(TailFileTests.cpp:1038-1092)") {
    val dir = tmp("tail_restart")
    val now = System.currentTimeMillis()
    Files.writeString(dir.resolve("test.1"), "line one\nline two\nline three\n")
    setMtime(dir.resolve("test.1"), now - 3600 * 1000L) // old rotated file
    val log = dir.resolve("test.log")
    Files.writeString(log, "line four\nline five\nline six\n")

    val t = Tail(dir, "test\\.log").start()
    t.trigger()
    assert(t.pieces() === Seq("line four", "line five", "line six"))
    t.stop()

    // between runs: append, double rotation, fresh main file
    Files.writeString(log, "line four\nline five\nline six\nline seven\n")
    Files.move(dir.resolve("test.1"), dir.resolve("test.2"))
    setMtime(dir.resolve("test.2"), now - 3600 * 1000L)
    Files.move(log, dir.resolve("test.1"))
    setMtime(dir.resolve("test.1"), System.currentTimeMillis())
    Files.writeString(log, "line eight is the last line\n")

    t.start() // same checkpoint
    t.trigger()
    val rows = t.rows()
    // exactly two new pieces: the renamed file's pending "line seven" from
    // byte 29, and the new file's single line — the OLD rotated test.2 is
    // ignored, and nothing re-emits
    assert(rows.contains(("test.1", 29L, "line seven")))
    assert(rows.contains(("test.log", 0L, "line eight is the last line")))
    assert(rows.size === 5)
    assert(!rows.exists(_._1 == "test.2"))
    t.stop()
  }

  test("a very long line and a long line followed by multiple newlines are " +
       "processed correctly (TailFileTests.cpp:549-677)") {
    val dir = tmp("tail_long")
    val log = dir.resolve("test.log")
    val longLine = (0 until 8049).map(i => ('A' + i % 26).toChar).mkString
    Files.writeString(log, s"012\n$longLine\n345\n6789")
    val t = Tail(dir, "test\\.log").start()
    t.trigger()
    assert(t.pieces() === Seq("012", longLine, "345")) // "6789" held back
    // multiple empty lines after a long line are each their own piece
    Files.writeString(log, "\n\n\n", java.nio.file.StandardOpenOption.APPEND)
    t.trigger()
    assert(t.pieces() === Seq("012", longLine, "345", "6789", "", ""))
    t.stop()
  }

  test("multiple-file mode: picks up files created between runs and " +
       "handles removed files (TailFileTests.cpp:475-548)") {
    val dir = tmp("tail_multi")
    Files.writeString(dir.resolve("a.log"), "a1\n")
    val t = Tail(dir, ".*\\.log").start()
    t.trigger()
    assert(t.pieces() === Seq("a1"))

    Files.writeString(dir.resolve("b.log"), "b1\nb2\n")
    t.trigger()
    assert(t.rows().map(r => (r._1, r._3)).sorted ===
      Seq(("a.log", "a1"), ("b.log", "b1"), ("b.log", "b2")))

    Files.delete(dir.resolve("a.log"))
    Files.writeString(dir.resolve("b.log"), "b3\n",
      java.nio.file.StandardOpenOption.APPEND)
    t.trigger() // removal must not fail the stream; b keeps flowing
    assert(t.rows().count(_._1 == "b.log") === 3)
    t.stop()
  }

  test("recursive lookup tails files in subdirectories only when enabled " +
       "(TailFileTests.cpp:1347-1396)") {
    val dir = tmp("tail_rec")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("top.log"), "top\n")
    Files.writeString(dir.resolve("sub").resolve("nested.log"), "nested\n")

    val flat = Tail(dir, ".*\\.log").start()
    flat.trigger()
    assert(flat.pieces() === Seq("top"))
    flat.stop()

    val rec = Tail(dir, ".*\\.log", Map("recursive" -> "true")).start()
    rec.trigger()
    assert(rec.rows().map(r => (r._1, r._3)).sorted ===
      Seq(("nested.log", "nested"), ("top.log", "top")))
    rec.stop()
  }

  test("Initial Start Position = Beginning of Time also reads " +
       "already-rotated files on the first look (TailFile.cpp:621-624 " +
       "processAllRotatedFiles; TailFileTests.cpp:1586-1673)") {
    val dir = tmp("tail_bot")
    val now = System.currentTimeMillis()
    Files.writeString(dir.resolve("test.1"), "old rotated\n")
    setMtime(dir.resolve("test.1"), now - 3600 * 1000L)
    Files.writeString(dir.resolve("test.log"), "current\n")

    // default (Beginning of File): the pre-existing rotated file is ignored
    val plain = Tail(dir, "test\\.log").start()
    plain.trigger()
    assert(plain.pieces() === Seq("current"))
    plain.stop()

    // Beginning of Time: the rotated sibling is swept in regardless of age
    val bot = Tail(dir, "test\\.log",
      Map("initialStartPosition" -> "Beginning of Time")).start()
    bot.trigger()
    assert(bot.rows().map(r => (r._1, r._3)).sorted ===
      Seq(("test.1", "old rotated"), ("test.log", "current")))
    bot.stop()
  }
}
