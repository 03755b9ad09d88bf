package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting
 * High Quality Monolingual Datasets from Web Crawl Data", arXiv:1911.00359
 * §4.3): score every document by its cross-entropy under a language model
 * trained on a high-quality reference corpus, then split the crawl into
 * `head` / `middle` / `tail` tertiles — the published recipe keeps `head`
 * (lowest perplexity = closest to the reference distribution) for LM
 * training data.
 *
 * The LM here is the hashed-bucket bigram model the DSIR implementation
 * established ([[Sampling.dsirWeights]]): n-grams hash into a fixed bucket
 * count via md5-prefix (engine-portable), so the WHOLE model is a
 * config-bounded table (≤ 2·`buckets` rows) collected as driver metadata
 * and embedded as map literals — the scoring pass is a narrow map-side
 * lookup, no joins. Add-one smoothing over the bucketed vocabulary:
 *
 *   -log P(w | prev) = log(c(bucket(prev)) + B) − log(c(bucket(prev,w)) + 1)
 *
 * Determinism (the DSIR recipe): both log components round HALF_UP to
 * integer micro-units BEFORE combining, each per-gram term clamps at 0
 * (bucket collisions can make the bigram bucket more frequent than the
 * context bucket — "probability one" is the floor), and the per-doc
 * cross-entropy is an integer division `sum div n` — every corpus-scale
 * sum is over longs, order-independent, bit-equal in any engine.
 *
 * Scale shape: one corpus-scale bigram explode (narrow, codegen'd), a
 * map-side partial count into ≤ 2·`buckets` rows, one groupBy(doc)
 * shuffle for the scores, and a TakeOrderedAndProject per tertile
 * threshold over the REFERENCE corpus's scores only. CCNet's reference
 * corpus (Wikipedia) is bounded — it does not grow with the crawl — so
 * the threshold heaps are reference-sized, never crawl-sized; at 100 TB
 * the thresholds are computed once and shipped as two scalars, exactly
 * like the paper's precomputed per-language cutoffs.
 */
object Perplexity {

  /** (ctx, bigram) stream: tokens are raw space-splits (the DSIR
    * tokenization), with a BOS marker so every document scores. */
  private def gramStream(df: DataFrame, idCol: Column, textCol: Column,
                         isRef: Column): DataFrame = {
    val toks = split(textCol, " ")
    val arr = concat(array(lit("<s>")), toks)
    df.select(idCol.as("docId"), isRef.as("isRef"),
        explode(transform(sequence(lit(1), size(toks)), j =>
          struct(element_at(arr, j).as("ctx"),
            concat_ws(" ", element_at(arr, j), element_at(arr, j + 1))
              .as("g")))).as("p"))
      .select(col("docId"), col("isRef"), col("p.ctx"), col("p.g"))
  }

  private def bucket(c: Column, buckets: Int): Column =
    (conv(substring(md5(c), 1, 6), 16, 10).cast("long") % buckets).as("b")

  private def microLog(x: Double): Long =
    BigDecimal(math.log(x) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /**
   * Per-document cross-entropy under the reference-trained bucketed
   * bigram LM, with head/middle/tail tertile buckets. Returns
   * (docId, n_bigrams, ce_micro, ppl_bucket); `ce_micro` is the mean
   * negative log-probability in integer micro-nats. Tertile cutpoints are
   * the ceil(n/3)-th and ceil(2n/3)-th smallest reference-document scores
   * (multiset k-th smallest — well-defined under ties with no ordering
   * ambiguity).
   */
  def perplexityBuckets(df: DataFrame, idCol: Column, textCol: Column,
                        isRef: Column, buckets: Int = 1024): DataFrame = {
    val grams = gramStream(df, idCol, textCol, isRef)
      .select(col("docId"), col("isRef"),
        bucket(col("g"), buckets).as("bg"),
        bucket(col("ctx"), buckets).as("bc"))

    // the LM: bigram-bucket and context-bucket histograms over the
    // REFERENCE grams only — ≤ 2·buckets rows of aggregate state no
    // matter the corpus size, collected like DSIR's bucket table
    val ref = grams.filter(col("isRef"))
    val cb = ref.groupBy("bg").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Long]("bg") -> microLog(r.getAs[Long]("c") + 1.0))
      .toMap
    val cc = ref.groupBy("bc").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Long]("bc") ->
        microLog(r.getAs[Long]("c") + buckets.toDouble))
      .toMap
    val lpbDefault = 0L                           // log(0 + 1)
    val lpcDefault = microLog(buckets.toDouble)   // log(0 + B)

    // per-gram negative log-prob in micro-nats, collision-clamped at 0;
    // one map-side lookup + one groupBy(doc) shuffle
    val lpb =
      if (cb.isEmpty) lit(lpbDefault)
      else coalesce(element_at(typedlit(cb), col("bg")), lit(lpbDefault))
    val lpc =
      if (cc.isEmpty) lit(lpcDefault)
      else coalesce(element_at(typedlit(cc), col("bc")), lit(lpcDefault))
    val scores = grams
      .select(col("docId"), col("isRef"), greatest(lpc - lpb, lit(0L)).as("t"))
      .groupBy("docId")
      .agg(first(col("isRef")).as("isRef"), count(lit(1)).as("n_bigrams"),
        expr("sum(t) div count(1)").as("ce_micro"))

    // tertile cutpoints over the reference documents' scores: the k-th
    // smallest is max-of-the-k-smallest — TakeOrderedAndProject (size-k
    // heap per partition + bounded merge), never a global sort
    val refScores = scores.filter(col("isRef")).select(col("ce_micro"))
      .localCheckpoint()
    val n = refScores.count()
    def kth(k: Long): Long =
      refScores.orderBy(col("ce_micro")).limit(k.toInt)
        .agg(max(col("ce_micro"))).collect()(0).getLong(0)
    val t1 = kth((n + 2) / 3)
    val t2 = kth((2 * n + 2) / 3)

    scores.select(col("docId"), col("n_bigrams"), col("ce_micro"),
      when(col("ce_micro") <= t1, "head")
        .when(col("ce_micro") <= t2, "middle")
        .otherwise("tail").as("ppl_bucket"))
  }
}
