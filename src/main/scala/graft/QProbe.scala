package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, when}

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
    val dirArg = args(0)
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
    // virtual dirs: "LONG1X" = Bench's long-doc corpus of sf0.1,
    // "SUBSTRSKEW" = its mass-duplicated variant (staged on demand)
    val dir = dirArg match {
      case "LONG1X" => Bench.stageLongDocs(spark, "/root/testdata/sf0.1", "1x")
      case "SUBSTRSKEW" => Bench.stageSubstrSkew(spark,
        Bench.stageLongDocs(spark, "/root/testdata/sf0.1", "1x"),
        "/root/testdata/sf0.1")
      case "SUBSTRHOT" =>
        // dev-only funnel corpus: 30% of long docs REPLACED by a periodic
        // 8-token span filling the whole doc — every window in those docs
        // is one of just 8 distinct keys, each with ~600k copies
        val out = s"${System.getProperty("java.io.tmpdir")}/graft-substrhot"
        val longDir = Bench.stageLongDocs(spark, "/root/testdata/sf0.1", "1x")
        val period = (1 to 8).map(i => s"dupspan$i").mkString(" ")
        val fill = (Seq.fill(400)(period)).mkString(" ")
        spark.read.parquet(s"$longDir/documents.parquet")
          .withColumn("text", when(col("doc_id") % 10 < 3, lit(fill))
            .otherwise(col("text")))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$out/documents.parquet")
        out
      case "EMBSKEW" => Bench.stageEmbSkew(spark, "/root/testdata/sf0.1")
      case d => d
    }
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
