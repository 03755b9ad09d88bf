package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StatefulOps, TailFileSource}

/** Streaming-state tests (SURVEY §5: tail resume, defragment flush) —
  * mirrors the reference's persistence-tests with checkpoint restarts. */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  test("TailFileSource: emits complete lines, resumes, detects rotation") {
    val dir = tmp("tail"); val ckpt = tmp("ckpt"); val out = tmp("out")
    val log = dir.resolve("app.log")
    Files.writeString(log, "l1\nl2\npartial")

    def startQuery() = spark.readStream
      .format("graft.streaming.TailFileSource")
      .option("path", dir.toString).option("glob", ".*\\.log")
      .load()
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()

    def emitted(): Seq[String] =
      spark.read.parquet(out.toString).orderBy("lineOffset", "line")
        .collect().map(_.getAs[String]("line")).toSeq

    val q1 = startQuery()
    q1.processAllAvailable()
    // only complete lines — "partial" has no trailing delimiter yet
    assert(emitted() === Seq("l1", "l2"))

    // append: partial completes + one more line; offsets resume mid-file
    Files.writeString(log, "l1\nl2\npartial3\nl4\n")
    q1.processAllAvailable()
    assert(emitted().sorted === Seq("l1", "l2", "l4", "partial3"))
    q1.stop()

    // restart from checkpoint: no re-emission, then rotation resets to 0
    val q2 = startQuery()
    q2.processAllAvailable()
    assert(emitted().size === 4)
    Files.writeString(log, "fresh1\n") // rotated: new head, shorter file
    q2.processAllAvailable()
    assert(emitted().sorted === Seq("fresh1", "l1", "l2", "l4", "partial3"))
    q2.stop()
  }

  test("streaming DefragmentText: boundary flush across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulOps.Line]
    val out = StatefulOps.defragmentText(input.toDS(), "^START", 0)
    val q = out.writeStream.format("memory").queryName("defrag")
      .outputMode("append").start()

    input.addData(
      StatefulOps.Line("s1", 1, "START a"),
      StatefulOps.Line("s1", 2, "cont b"))
    q.processAllAvailable()
    // message still buffered — no boundary seen yet
    assert(spark.table("defrag").count() === 0)

    input.addData(StatefulOps.Line("s1", 3, "START c"))
    q.processAllAvailable()
    val msgs = spark.table("defrag").as[StatefulOps.Message].collect()
    assert(msgs.length === 1)
    assert(msgs.head.message === "START a\ncont b")
    assert(msgs.head.relationship === "success")
    q.stop()
  }

  test("streaming MergeContent bins: full bins flush, remainder buffers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulOps.Entry]
    val out = StatefulOps.mergeContentBins(input.toDS(), 2, 0, ",")
    val q = out.writeStream.format("memory").queryName("bins")
      .outputMode("append").start()

    input.addData(
      StatefulOps.Entry("k1", 1, "a"), StatefulOps.Entry("k1", 2, "b"),
      StatefulOps.Entry("k1", 3, "c"), StatefulOps.Entry("k2", 1, "x"))
    q.processAllAvailable()
    val bins = spark.table("bins").as[StatefulOps.Bin].collect()
    assert(bins.toSeq.map(b => (b.correlation, b.merged, b.relationship)) ===
      Seq(("k1", "a,b", "merged"))) // c and x still below maxEntries
    q.stop()
  }
}
