package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Learned document-quality classification — the GPT-3 curation stage
 * (Brown et al. 2020, "Language Models are Few-Shot Learners",
 * arXiv:2005.14165, Appendix A): train a linear classifier to separate a
 * high-quality reference corpus (the paper used WebText/Wikipedia/Books
 * as positives against raw Common Crawl), score every crawl document,
 * and keep a document iff `pareto(α=9) > 1 − score` — the paper's
 * stochastic acceptance rule that mostly keeps high-scoring documents
 * but lets through a long tail of low-scoring ones so the filtered
 * corpus stays diverse.
 *
 * The classifier here is closed-form: multinomial Naive Bayes log-odds
 * over hashed unigram features (the hashing trick the paper's
 * HashingVectorizer applies, with NB's count-derived weights standing in
 * for logistic-regression training — same feature space, same linear
 * scoring form `w·x + b`, but with a deterministic, one-pass,
 * engine-replayable fit instead of SGD). Every piece rides the
 * engine-portable fixed-point devices this module family established:
 *
 *  - features: whitespace unigrams hashed to `buckets` md5-prefix
 *    buckets (the [[Sampling.dsirWeights]] feature space, minus bigrams);
 *  - per-bucket log-odds and the class prior are rounded to integer
 *    MICRO-nats half-away (the dsir log-table exposure, carried green
 *    since r13), so each document's raw score is an order-independent
 *    long sum;
 *  - the document probability is a logistic over the LENGTH-NORMALIZED
 *    log-odds (one IEEE double division by the token count — correctly
 *    rounded, so bit-identical in any IEEE engine, unlike integer `div`
 *    whose negative-operand truncation direction differs between Spark
 *    and DuckDB — then one micro-rounded sigmoid) — without the
 *    normalization a 100-token document saturates the sigmoid and the
 *    Pareto rule degenerates to a hard threshold;
 *  - the Pareto variate inverts an exact md5-uniform:
 *    u = (h60 + 0.5)/2^60, x = u^(−1/α) − 1 (the numpy.random.pareto
 *    Lomax form the paper's `np.random.pareto(9)` draws), micro-rounded
 *    before the comparison so keep/drop is a long comparison in any
 *    engine.
 *
 * Scale shape: training is ONE corpus-scale token aggregation collapsing
 * map-side into ≤ `buckets` rows (config-bounded aggregate state — the
 * DSIR bounded-model device) collected and re-embedded as a map literal;
 * scoring is a map-side lookup per token + one groupBy(doc) sum; the
 * Pareto rule is a pure projection. Nothing shuffles but the doc-keyed
 * sum, and the 100 TB corpus text is read exactly once per pass.
 */
object Classifier {

  /** Per-bucket micro-nat log-odds table + micro-nat prior, trained from
    * the labeled corpus in one bounded aggregation. Add-one smoothing on
    * both classes; buckets never seen in training fall back to 0 (even
    * odds) at scoring time via the map-miss coalesce. */
  private def trainLogOdds(toks: DataFrame, buckets: Int): (Map[Long, Long], Long) = {
    val counts = toks.groupBy("b").agg(
      sum(when(col("isHq"), 1L).otherwise(0L)).as("cp"),
      count(lit(1)).as("ca")).collect()
    val tp = counts.map(_.getAs[Long]("cp")).sum.toDouble + buckets
    val tn = counts.map(r => r.getAs[Long]("ca") - r.getAs[Long]("cp")).sum
      .toDouble + buckets
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val lo: Map[Long, Long] = counts.map { r =>
      val cp = r.getAs[Long]("cp"); val cn = r.getAs[Long]("ca") - cp
      r.getAs[Long]("b") ->
        micro(math.log(cp + 1.0) - math.log(tp) -
          math.log(cn + 1.0) + math.log(tn))
    }.toMap
    (lo, micro(math.log(tp) - math.log(tn)))
  }

  private def hashedTokens(df: DataFrame, idCol: Column, textCol: Column,
                           isHq: Column, buckets: Int): DataFrame =
    df.select(idCol.as("docId"), isHq.as("isHq"),
        explode(split(textCol, " ")).as("g"))
      .select(col("docId"), col("isHq"),
        (conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long") % buckets)
          .as("b"))

  /**
   * Score every document: (docId, nTokens, lorMicro, probMicro) where
   * `lorMicro` is the summed per-token log-odds in micro-nats and
   * `probMicro` = round(σ(prior + lorMicro/nTokens in nats)·1e6) — the
   * classifier probability the Pareto rule consumes, in micro-units.
   */
  def qualityScores(df: DataFrame, idCol: Column, textCol: Column,
                    isHq: Column, buckets: Int = 1024): DataFrame = {
    val toks = hashedTokens(df, idCol, textCol, isHq, buckets)
    val (lo, priorMicro) = trainLogOdds(toks, buckets)
    val scored = toks.groupBy("docId")
      .agg(count(lit(1)).as("nTokens"),
        sum(coalesce(element_at(typedlit(lo), col("b")), lit(0L)))
          .as("lorMicro"))
    scored.withColumn("probMicro",
      round(lit(1e6) / (lit(1.0) +
        exp(-(lit(priorMicro.toDouble) +
          col("lorMicro").cast("double") / col("nTokens").cast("double"))
          / 1e6))).cast("long"))
  }

  /**
   * The full GPT-3 Appendix-A filter: score, draw the document's Pareto
   * variate from its id hash, keep iff `pareto > 1 − prob` — compared in
   * micro-units so the decision is a long comparison. Returns every
   * document with its probability, the variate, and the `kept` flag
   * (filtering is the caller's one-line projection, keeping the row
   * for audit the way semDedup/prototypePrune do).
   */
  def qualityFilterPareto(df: DataFrame, idCol: Column, textCol: Column,
                          isHq: Column, alpha: Double = 9.0,
                          seed: String = "quality", buckets: Int = 1024): DataFrame = {
    val scores = qualityScores(df, idCol, textCol, isHq, buckets)
    val h60 = conv(substring(md5(concat(lit(seed + "|"),
      col("docId").cast("string"))), 1, 15), 16, 10).cast("long")
    val u = (h60.cast("double") + lit(0.5)) / lit(math.pow(2.0, 60))
    val paretoMicro = round((pow(u, lit(-1.0 / alpha)) - lit(1.0)) * 1e6)
      .cast("long")
    scores
      .withColumn("paretoMicro", paretoMicro)
      .withColumn("kept",
        col("paretoMicro") > lit(1000000L) - col("probMicro"))
  }
}
