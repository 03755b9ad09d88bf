package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev audit: for each benched query, what does the `count()`-mode
 * optimized plan retain? r14 finding that motivated Bench's noop-sink
 * measurement: Catalyst's column pruning + unique-key outer-join
 * elimination gutted several count plans to a bare parquet scan —
 * dedup_substrings became literally `count(1) over Relation` (0.4 s
 * counted vs 40+ s materialized), token_count and curate_filters_map
 * lost all per-doc computation, shuffle_export shuffled only its key.
 * Run after adding a bench row to confirm what a row would measure if it
 * were count-based, and as a reminder of why it must not be.
 */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = (Bench.headline ++ Bench.skewed ++ Bench.x10 ++ Bench.extra).distinct
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        val plan = df.groupBy().count().queryExecution.optimizedPlan.toString
        val lines = plan.linesIterator.size
        val gutted = lines <= 3
        println(f"[countplan] $n%-28s lines=$lines%3d gutted=$gutted")
        if (lines <= 6) plan.linesIterator.foreach(l => println(s"[plan:$n] $l"))
      } catch { case e: Exception => println(s"[countplan] $n ERROR $e") }
    }
    spark.stop()
  }
}
