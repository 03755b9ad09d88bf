package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
 * Scale shape: ONE reference-scale bigram explode feeding BOTH histograms
 * (each gram emits a tagged (bigram-bucket, context-bucket) pair and a
 * single map-side partial count collapses them to ≤ 2·`buckets` rows in
 * one job), then ONE corpus-scale explode for the scoring pass, whose
 * per-document output is localCheckpoint'd so the returned frame never
 * re-runs the explode. Tertile cutpoints come from a single
 * rank-condition job over the score HISTOGRAM of the REFERENCE
 * documents (k-th smallest = min value whose cumulative count reaches
 * k; no data-derived `limit(k)`, so no Int ceiling and no k-sized
 * per-partition heaps, and the cumulative window sorts per-value
 * counts, never rows). CCNet's reference corpus (Wikipedia) is
 * bounded — it does not grow with the crawl — so the histogram is
 * reference-bounded metadata; at 100 TB the thresholds are computed
 * once and shipped as two scalars, exactly like the paper's
 * precomputed per-language cutoffs.
 */
object Perplexity {

  /** (ctx, bigram) stream: tokens are raw space-splits (the DSIR
    * tokenization), with a BOS marker so every document scores. */
  private def gramStream(df: DataFrame, idCol: Column, textCol: Column,
                         isRef: Column,
                         carry: Seq[(String, Column)] = Nil): DataFrame = {
    val toks = split(textCol, " ")
    val arr = concat(array(lit("<s>")), toks)
    df.select(Seq(idCol.as("docId"), isRef.as("isRef"),
        explode(transform(sequence(lit(1), size(toks)), j =>
          struct(element_at(arr, j).as("ctx"),
            concat_ws(" ", element_at(arr, j), element_at(arr, j + 1))
              .as("g")))).as("p")) ++
        carry.map { case (n, c) => c.as(n) }: _*)
      .select(Seq(col("docId"), col("isRef"), col("p.ctx"), col("p.g")) ++
        carry.map { case (n, _) => col(n) }: _*)
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
                        isRef: Column, buckets: Int = 1024): DataFrame =
    bucketize(crossEntropy(df, idCol, textCol, isRef, buckets))

  /**
   * The per-document scoring stage alone: (docId, isRef, n_bigrams,
   * ce_micro) under the reference-trained bucketed bigram LM, checkpointed
   * (the corpus explode runs once however many consumers follow). `carry`
   * names constant-per-document columns to thread through the gram
   * explode (e.g. the mixture domain for [[Mixing.doremiWeights]]) so
   * downstream stages need no corpus-scale join back to the source table.
   */
  def crossEntropy(df: DataFrame, idCol: Column, textCol: Column,
                   isRef: Column, buckets: Int = 1024,
                   carry: Seq[(String, Column)] = Nil): DataFrame = {
    val grams = gramStream(df, idCol, textCol, isRef, carry)
      .select(Seq(col("docId"), col("isRef"),
        bucket(col("g"), buckets).as("bg"),
        bucket(col("ctx"), buckets).as("bc")) ++
        carry.map { case (n, _) => col(n) }: _*)

    // the LM: bigram-bucket and context-bucket histograms over the
    // REFERENCE grams only — ≤ 2·buckets rows of aggregate state no
    // matter the corpus size, collected like DSIR's bucket table.
    // ONE pass: each reference gram emits a tagged pair and a single
    // map-side partial count collapses both histograms in one job.
    val hist = grams.filter(col("isRef"))
      .select(explode(array(
        struct(lit(true).as("isG"), col("bg").as("b")),
        struct(lit(false).as("isG"), col("bc").as("b")))).as("p"))
      .groupBy(col("p.isG").as("isG"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c")).collect()
    val cb = hist.iterator.filter(_.getAs[Boolean]("isG"))
      .map(r => r.getAs[Long]("b") -> microLog(r.getAs[Long]("c") + 1.0))
      .toMap
    val cc = hist.iterator.filterNot(_.getAs[Boolean]("isG"))
      .map(r => r.getAs[Long]("b") ->
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
    // doc-level output is checkpointed so the corpus explode runs ONCE —
    // both the tertile job and the returned frame read the checkpoint
    grams
      .select(Seq(col("docId"), col("isRef"),
        greatest(lpc - lpb, lit(0L)).as("t")) ++
        carry.map { case (n, _) => col(n) }: _*)
      .groupBy("docId")
      .agg(first(col("isRef")).as("isRef"),
        (Seq(count(lit(1)).as("n_bigrams"),
          expr("sum(t) div count(1)").as("ce_micro")) ++
          carry.map { case (n, _) => first(col(n)).as(n) }): _*)
      .localCheckpoint()
  }

  /** Head/middle/tail tertile assignment over a [[crossEntropy]] frame. */
  private def bucketize(scores: DataFrame): DataFrame = {
    // tertile cutpoints in ONE rank-condition job (k-th smallest = min
    // value whose cumulative count reaches k; with k1 = ceil(n/3) and
    // k2 = ceil(2n/3) the integer conditions are 3·cum ≥ n and
    // 3·cum ≥ 2n — the oracle's rank formulation on the value axis).
    // The cumulative window runs over the groupBy(ce_micro) HISTOGRAM,
    // not the row stream: per-value counts are aggregate-state metadata
    // (≤ |distinct scores| rows of the bounded reference corpus, the
    // same class as packSequences' range totals), so the unpartitioned
    // window sorts metadata, never row data. All counts are longs — no
    // Int ceiling, no data-derived limit(k) heaps.
    val wCum = Window.orderBy(col("ce_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("ce_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cuts = scores.filter(col("isRef"))
      .groupBy("ce_micro").agg(count(lit(1)).as("cnt"))
      .select(col("ce_micro"), sum(col("cnt")).over(wCum).as("cum"),
        sum(col("cnt")).over(wAll).as("nn"))
      .agg(coalesce(max(col("nn")), lit(0L)).as("n"),
        min(when(lit(3) * col("cum") >= col("nn"), col("ce_micro"))).as("t1"),
        min(when(lit(3) * col("cum") >= lit(2) * col("nn"), col("ce_micro"))).as("t2"))
      .collect()(0)
    require(cuts.getAs[Long]("n") > 0,
      "perplexity bucketing needs a non-empty reference corpus")
    val t1 = cuts.getAs[Long]("t1")
    val t2 = cuts.getAs[Long]("t2")

    scores.select(col("docId"), col("n_bigrams"), col("ce_micro"),
      when(col("ce_micro") <= t1, "head")
        .when(col("ce_micro") <= t2, "middle")
        .otherwise("tail").as("ppl_bucket"))
  }
}
