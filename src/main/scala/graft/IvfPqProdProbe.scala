package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Production-parameter IVFADC probe (r15 verdict done-criterion for the
 * plan-literal purge): run ivfPqTopK at nCells=256, m=16, k=256 — the
 * parameter CLASS where the r15 `typedlit` cross-dot map (nCells·m·k
 * string-keyed plan entries) exploded codegen/plan serialization — and
 * print wall seconds through the noop sink. The r16 broadcast-joined
 * cross-dot table makes this a data-size question (256·16·256 longs ≈
 * 8 MB broadcast), not a plan-size one.
 *
 * `runMain graft.IvfPqProdProbe <embeddingsDir> [reps]`
 */
object IvfPqProdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.pipeline.Similarity.ivfPqTopK(emb,
        emb.filter(col("vec_id") % 100 === 0),
        topK = 5, nCells = 256, m = 16, k = 256, iters = 1, nProbe = 3)
        .write.format("noop").mode("overwrite").save()
      println(f"IVFPQ_PROD rep$i ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
