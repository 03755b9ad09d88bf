package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Iteration probe for the mass-duplication EXACTSUBSTR pair: stages the
  * single-hot-key corpus from an sf dir and times dedupSubstrings with a
  * list of hotKeyThreshold values (0 = the unsalted funnel).
  * `runMain graft.MassDupProbe <sfDir> <reps> <thr...>` */
object MassDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val thrs = args.drop(2).map(_.toLong)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Bench.stageMassDup(spark, sfDir)
    thrs.foreach { thr =>
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.pipeline.Dedup.dedupSubstrings(
          spark.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), col("text"), k = 8, hotKeyThreshold = thr)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MASSDUP thr=$thr min=${ts.min}%.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
