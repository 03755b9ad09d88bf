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
      val df = SparkEntry.queries(q)(spark, dir)
      // run THIS DataFrame's own execution (df.count() would plan a separate
      // query and leave this one's AQE plan non-final)
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $q =====")
      // formatted mode tags each codegen'd operator with [codegen id : n]
      val codegenOps = plan.linesIterator.count(_.contains("codegen id"))
      val exchanges = plan.linesIterator.count(l =>
        l.contains(") Exchange") || l.contains("Exchange ("))
      println(s"codegen-operators=$codegenOps exchanges=$exchanges")
      // scan lines show pushdown + pruning; exchanges show shuffles
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Exchange") || l.contains("Broadcast")).take(12)
        .foreach(l => println(l.trim.take(220)))
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
    show("lshv", "dedup_lsh_verified")
    show("rep", "text_repetition")
    show("shuf", "shuffle_export")
    show("ivf", "embed_topk_ivf")
    show("pack", "pack_sequences")
    show("decon", "decontaminate")
    show("dsg", "dedup_segments")
    show("e2e", "pipeline_e2e")
    show("lshs", "embed_topk_lsh")
    show("goph", "quality_gopher")
    show("c4", "c4_clean")
    show("tfidf", "tfidf_topk")
    show("salted", "dedup_minhash_lsh_salted")
    show("cfe2e", "curate_filters_e2e")
    show("dsub", "dedup_substrings")
    show("dsirw", "dsir_weights")
    show("dsirr", "dsir_resample")
    show("semd", "dedup_semantic")
    show("proto", "dedup_prototypes")
    show("ltcp", "listen_tcp_frames")
    show("cms", "sketch_cms")
    show("hll", "sketch_hll")
    show("drm", "doremi_weights")
    show("unx", "unimax_budget")
    show("dpb", "dedup_paragraphs_bloom")
    show("dolma", "dolma_e2e")
    show("kmpp", "kmeans_parallel_init")
    show("fwf", "fineweb_filters")
    show("fwe", "fineweb_e2e")
    show("ivfk", "embed_topk_ivf_kmpp")
    show("slim", "slimpajama_e2e")
    show("rpv2", "rpv2_signals")
    show("dcs", "data_constrained")
    show("bft", "bpe_fertility")
    show("ds", "datasheet")
    show("ut", "unigram_train")
    show("so", "source_overlap")
    show("wpt", "wordpiece_train")
    show("bm", "bm25_topk")
    show("wn", "wimbd_ngrams")
    show("kn", "perplexity_kn")
    show("ql", "quality_logistic")
    show("dclm", "dclm_e2e")
    spark.stop()
  }
}
