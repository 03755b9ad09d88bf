package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev probe (r21, verdict #2): stage-by-stage timing of the dclm_e2e
 * composition — attributes the row's wall time to the RefinedWeb line
 * pass / paragraph-bloom dedup / classifier training epochs / scoring /
 * threshold+join, at the core count given by SPARK_GRAFT_CPUS (the r20
 * scaling block read dclm_e2e 3.4× FASTER on 8 cores than 32 — this
 * probe answers which stage inverts).
 *
 * `runMain graft.DclmProbe <sfDir> [reps]`
 */
object DclmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    import graft.pipeline.{Classifier, Dedup, TextAnalysis}
    import graft.pipeline.Staging.StagingOps

    def timed[T](tag: String)(f: => T): T = {
      var out: Option[T] = None
      (0 until reps).foreach { i =>
        val t0 = System.nanoTime()
        out = Some(f)
        println(f"[dclm] cpus=$cpus $tag rep=$i t=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      out.get
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val words = split(col("text"), " ")
    val nLines = greatest(ceil(size(words) / lit(10.0)).cast("int"), lit(1))
    val baseLines = transform(sequence(lit(0), nLines - 1), i => {
      val li = array_join(slice(words, i * lit(10) + 1, lit(10)), " ")
      when(col("doc_id") % 9 === 0 && i % 4 === 0, upper(li))
        .when(col("doc_id") % 7 === 0 && i === 0, upper(li))
        .otherwise(li)
    })
    val page = concat(array_join(baseLines, "\n"),
      when(col("doc_id") % 5 === 0, lit("\n12345")).otherwise(lit("")),
      when(col("doc_id") % 6 === 0,
        concat(lit("\n"), (col("doc_id") % 90 + 1).cast("string"),
          lit(" likes"))).otherwise(lit("")),
      when(col("doc_id") % 4 === 0, lit("\nsubscribe")).otherwise(lit("")))
    val fmap = TextAnalysis.refinedWebLineCorrections(page).toMap

    val corrected = timed("stage1-refinedweb+stage") {
      docs.select(col("doc_id"), col("source"),
          fmap("cleaned").as("cleanedText"), fmap("keep").as("rwKeep"))
        .filter(col("rwKeep"))
        .select(col("doc_id"), col("source"),
          col("cleanedText").as("text"))
        .staged
    }
    val dd = timed("stage2-bloomdedup+stage") {
      Dedup.dedupSegmentsBloom(
        corrected.filter(col("source") =!= "src0"), col("doc_id"),
        Dedup.wordWindows(col("text"), 20),
        corrected.filter(col("source") === "src0"),
        Dedup.wordWindows(col("text"), 20),
        expectedItems = 100000L, fpp = 1e-9)
        .staged
    }
    val (w, bias) = timed("stage3-logistic-train") {
      Classifier.logisticModel(docs, col("doc_id"),
        col("text"), col("source").isin("src0", "src1"), steps = 2)
    }
    val scored = timed("stage4-score+stage") {
      Classifier.logisticApply(dd, col("docId"), col("text"), w, bias).staged
    }
    val t = timed("stage5-threshold") {
      val wCum = Window.orderBy(col("probMicro").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(col("probMicro").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cutRow = scored.groupBy("probMicro").agg(count(lit(1)).as("c"))
        .select(col("probMicro"), sum(col("c")).over(wCum).as("cum"),
          sum(col("c")).over(wAll).as("nn"))
        .agg(max(when(lit(10) * col("cum") >= col("nn"), col("probMicro")))
          .as("t"))
        .collect()(0)
      if (cutRow.isNullAt(0)) Long.MaxValue else cutRow.getAs[Long]("t")
    }
    timed("stage6-join+sink") {
      dd.join(scored.select(col("docId"), col("probMicro")), "docId")
        .select(col("docId").as("doc_id"),
          col("nSegments").cast("long").as("n_segments"),
          col("nDropped").cast("long").as("n_dropped"),
          col("probMicro").as("prob_micro"),
          (col("probMicro") >= t).as("kept"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    timed("full-query") {
      SparkEntry.queries("dclm_e2e")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
