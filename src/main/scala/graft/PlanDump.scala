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
      // r21 (r20 verdict #5): record every eager staging barrier's
      // segment plan too, so composition dumps show the pre-barrier
      // stages a localCheckpoint otherwise truncates
      val stagedDir = java.nio.file.Files
        .createTempDirectory(s"plandump-$name-").toString
      spark.conf.set(graft.pipeline.Staging.DumpDirKey, stagedDir)
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS frame so the captured plan is AQE-final
      df.queryExecution.toRdd.foreach(_ => ())
      spark.conf.unset(graft.pipeline.Staging.DumpDirKey)
      val segs = Option(new java.io.File(stagedDir).listFiles())
        .getOrElse(Array.empty).sortBy(_.getName)
        .map(f => new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
        segs.mkString("\n", "\n", "")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        (s"== $name @ $sfDir ==\n" + plan).getBytes("UTF-8"))
      val exchanges = plan.linesIterator.count(l =>
        l.contains(") Exchange") || l.contains("Exchange ("))
      println(s"[plandump] $name exchanges=$exchanges (incl. " +
        s"${segs.length} staged segments) -> $outDir/$name.txt")
    }
    spark.stop()
  }
}
