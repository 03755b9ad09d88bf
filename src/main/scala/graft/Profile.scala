package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev profiling harness: `runMain graft.Profile <query> [reps] [sfDir]` —
 * times a single SparkEntry query in a fresh JVM, cold + warm reps, and
 * prints the formatted physical plan once. Not part of the driver contract;
 * exists so bench regressions can be attributed to a stage rather than
 * guessed at (Bench.scala measures only end-to-end per query).
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash_lsh")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    // PROFILE_FULL=1: force EVERY output column to materialize (count()
    // lets Catalyst prune projections the row count doesn't need)
    val full = sys.env.get("PROFILE_FULL").contains("1")
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      val n = if (full) df.queryExecution.toRdd.count() else df.count()
      println(f"[profile] $name rep=$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.3f s full=$full")
    }
    if (sys.env.get("PROFILE_EXPLAIN").contains("1"))
      q(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
