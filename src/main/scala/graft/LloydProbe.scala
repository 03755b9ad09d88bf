package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev probe (r21, verdict #3): stage attribution of the
 * prod_embed_topk_ivfpq_deep row — coarse Lloyd rounds vs residual
 * staging vs residual-PQ Lloyd rounds vs encode+score. Runs at the
 * bench's production parameters (nCells=256, m=16, k=256, iters=4) on
 * the x10 embeddings dir the bench stages.
 *
 * `runMain graft.pipeline.LloydProbe <embDir> [iters] [reps]`
 */
object LloydProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-bench-x10")
    val iters = if (args.length > 1) args(1).toInt else 4
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Staging.StagingOps
    val (nCells, m, k) = (256, 16, 256)

    def timed[T](tag: String)(f: => T): T = {
      var out: Option[T] = None
      (0 until reps).foreach { i =>
        val t0 = System.nanoTime()
        out = Some(f)
        println(f"[lloyd] cpus=$cpus $tag rep=$i t=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      out.get
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cid"),
        Similarity.quantize(col("embedding")).as("cq"))
      .withColumn("cn", Similarity.normSqQ(col("cq")))
    val dim = c.select(size(col("cq")).as("d")).head().getInt(0)
    val sub = dim / m
    val cents = timed(s"coarse-lloyd-iters$iters") {
      Similarity.trainCentroids(c, nCells, iters)
    }
    val centsFlat = timed("centsflat-agg") { Similarity.centsFlatRow(cents) }
    val dCol = size(col("cq"))
    val resid = timed("resid-assign+stage") {
      c.crossJoin(broadcast(centsFlat))
        .withColumn("ci",
          Similarity.argMaxCos6Q(col("cq"), col("cqflat"), col("cns")))
        .select(col("cid"), col("cq"),
          element_at(col("cids"), col("ci") + 1).as("cent"),
          element_at(col("cns"), col("ci") + 1).as("centn"),
          zip_with(col("cq"),
            slice(col("cqflat"), col("ci") * dCol + lit(1), dCol),
            (a, b) => a - b).as("rq"))
        .staged
    }
    timed(s"pq-lloyd-iters$iters") {
      Similarity.pqLloydAll(resid.select(col("cid"), col("rq").as("cq")),
        m, sub, k, iters)
    }
    timed("full-ivfpq-deep") {
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") % 100 === 0),
        topK = 5, nCells = nCells, m = m, k = k, iters = iters, nProbe = 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
