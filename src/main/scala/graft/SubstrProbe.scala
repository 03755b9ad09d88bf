package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the dedupSubstrings pipeline on a
  * given corpus — attributes longdoc bench time to explode / dup-agg /
  * span-merge / coverage. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-bench-long-1x")
    val k = 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[substr] $tag rep=$i n=$n t=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val base = df.select(col("doc_id").as("docId"), col("text"),
      split(col("text"), " ").as("toks"))
    def wins = base.select(col("docId"),
      posexplode(when(size(col("toks")) >= k,
        graft.pipeline.Dedup.shingles(col("text"), k))
        .otherwise(array().cast("array<string>"))).as(Seq("pos", "win")))
      .select(col("docId"), col("pos"),
        xxhash64(col("win")).as("h1"),
        xxhash64(lit(0x9E3779B97F4A7C15L), col("win")).as("h2"))
    time("explode+hash")(wins.write.format("noop").mode("overwrite").save().asInstanceOf[Unit].hashCode().toLong)
    val dup = wins.groupBy("h1", "h2").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h1", "h2")
    time("dup-agg")(dup.count())
    time("span-join")(wins.join(dup, Seq("h1", "h2")).count())
    time("full")(
      graft.pipeline.Dedup.dedupSubstrings(df, col("doc_id"), col("text"), k)
        .write.format("noop").mode("overwrite").save().asInstanceOf[Unit].hashCode().toLong)
    spark.stop()
  }
}
