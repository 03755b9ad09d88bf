package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r20 optimization round): dump `.explain("formatted")` for the
  * named registered queries to `<outDir>/<query>.txt` — the evidence files
  * the optimization rounds commit under plans/r20/. Runs each query's own
  * execution first so AQE's final plan is what gets captured.
  * `runMain graft.PlanDump <sfDir> <outDir> <query...>` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS frame so the captured plan is AQE-final
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        (s"== $name @ $sfDir ==\n" + plan).getBytes("UTF-8"))
      val exchanges = plan.linesIterator.count(l =>
        l.contains(") Exchange") || l.contains("Exchange ("))
      println(s"[plandump] $name exchanges=$exchanges -> $outDir/$name.txt")
    }
    spark.stop()
  }
}
