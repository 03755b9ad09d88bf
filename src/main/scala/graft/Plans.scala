package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def show(name: String, q: String): Unit = {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(s"===== $q =====")
      // scan lines show pushdown + pruning; exchanges show shuffles
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Exchange") || l.contains("Broadcast") ||
        l.contains("WholeStageCodegen")).take(12).foreach(l => println(l.trim.take(220)))
    }
    show("qdt", "query_database_table")
    show("esql", "execute_sql")
    show("topk", "embed_topk")
    show("minhash", "dedup_minhash_lsh")
    show("rwt", "rolling_window_time")
    show("hash", "hash_content")
    show("srec", "split_record")
    show("rtm", "route_text_merged")
    show("bps", "merge_bin_pack_sized")
    show("ndp", "embed_neardup")
    spark.stop()
  }
}
