package graft
// temporary probe - deleted after measurement
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeTail {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = "/tmp/graft-bench-tail-10x"
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def base = s"${System.getProperty("java.io.tmpdir")}/graft-probe-" +
      java.util.UUID.randomUUID
    def tailed = spark.readStream.format("graft.streaming.TailFileSource")
      .option("path", corpus).option("glob", ".*\\.txt").load()
    // 1: read + sink only
    timed("read+sink") {
      val b = base
      val q = tailed.writeStream.format("parquet")
        .option("path", s"$b/out").option("checkpointLocation", s"$b/ckpt")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    // 2: read + route + sink (no state)
    timed("read+route+sink") {
      val b = base
      val routed = tailed.withColumn("relationship",
        when(col("line").rlike("^<[0-9]+>"), "header").otherwise("body"))
      val q = graft.streaming.FlowRuntime.runAvailable(
        graft.streaming.FlowRuntime.relationshipSink(routed, s"$b/out"), s"$b/ckpt")
      q.stop()
    }
    // 3: full (read + route + defragment + sink) — the bench shape, with
    // row-count validation and repeated reps to expose accumulation
    (0 until 2).foreach { i =>
      val b = base
      timed(s"full defrag drain #$i") {
        val routed = tailed.withColumn("relationship",
          when(col("line").rlike("^<[0-9]+>"), "header").otherwise("body"))
        val frags = routed.select(col("path").as("source"),
          col("lineOffset").as("ord"), col("line").as("content"),
          lit(-1L).as("offset"), lit("").as("uuid"))
          .as[graft.streaming.StatefulOps.Fragment]
        val msgs = graft.streaming.StatefulOps.defragmentText(frags, "<[0-9]+>", 0)
        val q = graft.streaming.FlowRuntime.runAvailable(
          graft.streaming.FlowRuntime.relationshipSink(msgs.toDF(), s"$b/out"), s"$b/ckpt")
        println("[probe]   numInputRows/batch: " +
          q.recentProgress.toSeq.map(_.numInputRows).mkString(","))
        q.stop()
      }
      val outDir = new java.io.File(s"$b/out")
      println("[probe]   out entries: " +
        Option(outDir.list()).map(_.mkString(",")).getOrElse("NONE"))
      try println("[probe]   rows written: " + spark.read.parquet(s"$b/out").count())
      catch { case e: Exception => println("[probe]   read failed: " + e.getMessage.take(80)) }
    }
    spark.stop()
  }
}
