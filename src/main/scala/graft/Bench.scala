package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"queries":{...}}. The headline set
 * covers one representative per operator family (agg, route/explode,
 * split+merge round trip, incremental pull, dedup LSH, ANN, text analysis)
 * rather than all registered queries, so the number tracks engine throughput
 * instead of oracle-surface size.
 */
object Bench {
  val headline: Seq[String] = Seq(
    "execute_sql", "rolling_window_time", "route_text", "merge_content",
    "query_database_table", "dedup_minhash_lsh", "embed_topk", "token_count")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once on the smallest scale so the measured pass
    // reflects steady-state throughput, not first-query classloading
    SparkEntry.queries("execute_sql")(spark, sfDir).count()
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
