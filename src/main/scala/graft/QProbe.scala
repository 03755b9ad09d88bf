package graft

import org.apache.spark.sql.SparkSession

/**
 * One-query timing probe: `runMain graft.QProbe <sfDir> <reps> <query...>`
 * runs each named registered query against `sfDir` through the noop sink
 * (full output materialization — the Bench r14 discipline) and prints
 * per-rep wall seconds plus the min. For iterating on a single row's plan
 * without paying a full Bench run; NOT a published number (no staged
 * corpora, no warm-up discipline beyond rep 0).
 */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QPROBE $name min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
