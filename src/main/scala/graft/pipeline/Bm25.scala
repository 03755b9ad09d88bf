package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

/**
 * Okapi BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
 * relevance framework; the BM25 form of Robertson et al., TREC-3 1994)
 * over the corpus — the retrieval read a curation pipeline takes when
 * decontaminating BY SEARCH (rank corpus documents against benchmark
 * queries and inspect/drop the top hits) or when auditing what a crawl
 * contains for a topic. IDF uses the Lucene-standard non-negative
 * variant `ln(1 + (N − df + ½)/(df + ½))`, which simplifies to
 * `ln(2N+2) − ln(2df+1)` — two INTEGER-argument logarithms, so the
 * established micro-nat parity device (`round(ln(int)·1e6)` per
 * argument) makes scores integer-exact and externally replayable.
 *
 * The tf saturation term `tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))`
 * clears its denominators exactly: with k1, b in centi-units (K1 = 120,
 * B = 75 default — the canonical 1.2/0.75), avgdl = T/N (T = corpus
 * tokens, N = docs, both driver scalars from ONE bounded agg), the
 * contribution of a term is
 *
 *   score_micro += idf_micro · (100+K1)·100·T·tf
 *                  div (10000·T·tf + K1·(100−B)·T + K1·B·N·len)
 *
 * computed in DECIMAL(38,0) — exact through 10¹³-token corpora (the
 * 100 TB design point) with the numerator peaking near 10²⁷ ≪ 10³⁸.
 * Ties rank (score desc, doc_id asc).
 *
 * 100 TB shape: the corpus is scanned ONCE (r15 verdict: the (N, T)
 * aggregate used to be a second full pass over the heaviest column,
 * re-tokenizing everything for two scalars) — one projection tokenizes
 * each document and keeps (doc_id, len, query-matching tokens), the
 * term membership test an InSet against the benchmark-bounded query
 * vocabulary, and that materialized sliver (localCheckpoint; the
 * cluster equivalent is a staging write) feeds BOTH the 1-row (N, T)
 * aggregate and the postings explode, so tf postings, document
 * frequencies, and scoring all run on the query-matching sliver with
 * document length carried (no corpus-wide length join). A deployment
 * that already knows its corpus stats passes them via `corpusStats`
 * and skips the aggregate (and the checkpoint) entirely. The
 * per-query rank window partitions on qid over candidate postings
 * only.
 *
 * Normalization matches the tokenizer family ([[Bpe]]): lowercase,
 * strip outside [a-z ], split on spaces.
 */
object Bm25 {

  private def toks(c: Column): Column =
    filter(split(regexp_replace(lower(c), "[^a-z ]", ""), " "),
      w => w =!= "")

  private[pipeline] def lnMicro(x: Long): Long =
    math.round(math.log(x.toDouble) * 1e6)

  /**
   * Top-k BM25 hits per query: (qid, rnk, doc_id, score_micro).
   * `docs` carries (doc_id, text); `queries` carries (qid, qtext) and
   * must be broadcast-sized (benchmark-scale — the decontamination
   * contract; beyond broadcast width, shard the query set and union).
   *
   * `dfCapMicro` bounds the query-matching sliver under stop-word-like
   * query terms (the adversarial shape for the pre-shuffle semi-join:
   * ONE term carried by most of the corpus drags the whole corpus into
   * the postings shuffle): a term whose document frequency exceeds
   * `dfCapMicro`·N/10⁶ is dropped from scoring entirely — the standard
   * IR stop-word-pruning trade (such terms carry near-zero IDF anyway;
   * Lucene deployments routinize the same cut). The default 10⁶ keeps
   * every term. The capped variant is exactly reproducible: the cut is
   * an integer comparison on exact df.
   */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
           k1Centi: Int = 120, bCenti: Int = 75,
           dfCapMicro: Long = 1000000L,
           corpusStats: Option[(Long, Long)] = None): DataFrame = {
    val qterms = queries
      .select(col("qid"), explode(array_distinct(toks(col("qtext"))))
        .as("term"))
    // the query-term vocabulary is benchmark-bounded by contract (same
    // bound the broadcast relies on) — collected once, tested as an
    // InSet inside the single corpus projection
    val termSet = qterms.select("term").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val matched: Column => Column =
      if (termSet.isEmpty) _ => array().cast("array<string>")
      else tk => filter(tk, t => t.isin(termSet: _*))
    val perDoc0 = docs.select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("len"),
        matched(col("tk")).as("mt"))
    // ONE corpus scan: with no precomputed stats the sliver materializes
    // (checkpoint) so the (N, T) aggregate and the postings explode both
    // read doc_id + len + matching tokens, never the corpus again
    val perDoc =
      if (corpusStats.isEmpty) perDoc0.staged else perDoc0
    val (n, t) = corpusStats.getOrElse {
      val nt = perDoc.agg(count(lit(1)).as("n"),
        coalesce(sum(col("len")), lit(0L)).as("t")).collect()(0)
      (nt.getAs[Long]("n"), nt.getAs[Long]("t"))
    }
    require(n > 0 && t > 0, "BM25 needs a non-empty corpus")
    val postings = perDoc
      .select(col("doc_id"), col("len"), explode(col("mt")).as("term"))
      .groupBy("doc_id", "term", "len").agg(count(lit(1)).as("tf"))
    val lnN = lnMicro(2L * n + 2L)
    val dfs = postings.groupBy("term")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") * 1000000L <= lit(dfCapMicro) * n)
      .withColumn("idf_micro",
        lit(lnN) - expr("CAST(round(ln(CAST(2*df+1 AS DOUBLE))*1000000) AS BIGINT)"))
    val contrib = postings
      .join(broadcast(dfs.select("term", "idf_micro")), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("c", expr(
        s"(CAST(idf_micro AS DECIMAL(38,0)) * ${100L * (100L + k1Centi)} * CAST($t AS DECIMAL(38,0)) * tf) div " +
          s"(CAST(10000 AS DECIMAL(38,0)) * $t * tf + CAST(${k1Centi.toLong * (100L - bCenti)} AS DECIMAL(38,0)) * $t + " +
          s"CAST(${k1Centi.toLong * bCenti} AS DECIMAL(38,0)) * $n * len)"))
    contrib.groupBy("qid", "doc_id")
      .agg(sum("c").as("score_micro"))
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("doc_id"), col("score_micro"))
  }
}
