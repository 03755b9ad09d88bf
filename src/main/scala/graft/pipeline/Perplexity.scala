package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

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
              .as("g"),
            element_at(arr, j + 1).as("w")))).as("p")) ++
        carry.map { case (n, c) => c.as(n) }: _*)
      .select(Seq(col("docId"), col("isRef"), col("p.ctx"), col("p.g"),
        col("p.w")) ++
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
      .staged
  }

  /**
   * RHO-loss-style excess-loss selection (Mindermann et al. 2022,
   * "Prioritized Training on Points that are Learnable, Worth Learning,
   * and Not Yet Learnt", ICML — the reducible-holdout-loss criterion;
   * RHO-1, Lin et al. 2024, arXiv:2404.07965, applies the same
   * two-model loss difference token-level for LLM data selection):
   * score every document under TWO reference-trained bucketed bigram
   * LMs — the target-domain reference (`isRefTarget`) and a
   * generic/contrast reference (`isRefAlt`) — and rank by
   * excess = ce_alt − ce_target. Documents the target-domain model
   * explains much better than the generic one carry the learnable,
   * worth-learning mass; excess ≤ 0 marks noise or off-domain text the
   * target model has nothing to gain from. Integer micro-nat arithmetic
   * end to end (the [[crossEntropy]] device twice over), so selection
   * replays exactly in any engine.
   *
   * Returns (docId, n_bigrams, ce_target_micro, ce_alt_micro,
   * excess_micro, selected); selected = excess_micro > 0.
   *
   * Scale shape: training two models costs the same data movement as
   * one — a single corpus gram explode feeds ONE four-way tagged
   * map-side-partial histogram agg (≤ 4·buckets rows of aggregate
   * state, each gram's tags gated by its membership flags), and one
   * scoring explode computes both per-gram terms side by side before
   * the one groupBy(doc).
   */
  def excessLoss(df: DataFrame, idCol: Column, textCol: Column,
                 isRefTarget: Column, isRefAlt: Column,
                 buckets: Int = 1024): DataFrame = {
    val grams = gramStream(df, idCol, textCol, isRefTarget,
        Seq("isRefAlt" -> isRefAlt))
      .select(col("docId"), col("isRef"), col("isRefAlt"),
        bucket(col("g"), buckets).as("bg"),
        bucket(col("ctx"), buckets).as("bc"))
    val hist = grams
      .select(explode(array(
        struct(lit(false).as("alt"), lit(true).as("isG"),
          col("bg").as("b"), col("isRef").as("keep")),
        struct(lit(false).as("alt"), lit(false).as("isG"),
          col("bc").as("b"), col("isRef").as("keep")),
        struct(lit(true).as("alt"), lit(true).as("isG"),
          col("bg").as("b"), col("isRefAlt").as("keep")),
        struct(lit(true).as("alt"), lit(false).as("isG"),
          col("bc").as("b"), col("isRefAlt").as("keep")))).as("p"))
      .filter(col("p.keep"))
      .groupBy(col("p.alt").as("alt"), col("p.isG").as("isG"),
        col("p.b").as("b"))
      .agg(count(lit(1)).as("c")).collect()
    def model(alt: Boolean): (Map[Long, Long], Map[Long, Long]) = {
      val rows = hist.filter(_.getAs[Boolean]("alt") == alt)
      (rows.iterator.filter(_.getAs[Boolean]("isG"))
        .map(r => r.getAs[Long]("b") -> microLog(r.getAs[Long]("c") + 1.0))
        .toMap,
       rows.iterator.filterNot(_.getAs[Boolean]("isG"))
        .map(r => r.getAs[Long]("b") ->
          microLog(r.getAs[Long]("c") + buckets.toDouble))
        .toMap)
    }
    val (cbT, ccT) = model(alt = false)
    val (cbA, ccA) = model(alt = true)
    def term(cb: Map[Long, Long], cc: Map[Long, Long]): Column = {
      val lpb =
        if (cb.isEmpty) lit(0L)
        else coalesce(element_at(typedlit(cb), col("bg")), lit(0L))
      val lpc =
        if (cc.isEmpty) lit(microLog(buckets.toDouble))
        else coalesce(element_at(typedlit(cc), col("bc")),
          lit(microLog(buckets.toDouble)))
      greatest(lpc - lpb, lit(0L))
    }
    grams
      .select(col("docId"), term(cbT, ccT).as("tt"), term(cbA, ccA).as("ta"))
      .groupBy("docId")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(tt) div count(1)").as("ce_target_micro"),
        expr("sum(ta) div count(1)").as("ce_alt_micro"))
      .withColumn("excess_micro",
        col("ce_alt_micro") - col("ce_target_micro"))
      .withColumn("selected", col("excess_micro") > 0)
  }

  /**
   * Per-document cross-entropy under a reference-trained bucketed
   * INTERPOLATED KNESER-NEY bigram LM (Kneser & Ney 1995, ICASSP; the
   * interpolated form of Chen & Goodman 1999 §2.7 — the smoothing
   * family CCNet's KenLM actually implements, here at bigram order),
   * with the same head/middle/tail tertile assignment as
   * [[perplexityBuckets]]:
   *
   *   P(w|prev) = max(c(prev,w) − D, 0)/c(prev)
   *             + D·N1+(prev,·)/c(prev) · P_cont(w)
   *   P_cont(w) = (N1+(·,w) + 1) / (N1+(·,·) + B)     (add-one floored)
   *
   * with the canonical absolute discount D = `dNum`/`dDen` (¾ default)
   * and backoff to P_cont alone when the context is unseen. In the
   * bucketed-hash model space ([[crossEntropy]]'s device) the
   * occurrence counts come from the hashed-bigram/context buckets and
   * the TYPE counts N1+ from the (context-bucket, word-bucket) pair
   * space — so the whole model stays config-bounded: three ≤B-row maps
   * + one scalar, collected as driver metadata.
   *
   * Determinism: the interpolated probability is computed as ONE exact
   * integer rational — clearing D's denominator,
   *
   *   num = max(dDen·c(prev,w) − dNum, 0)·(N1+(·,·)+B)
   *         + dNum·N1+(prev,·)·(N1+(·,w)+1)
   *   den = dDen·c(prev)·(N1+(·,·)+B)
   *
   * and −log P = lnMicro(den) − lnMicro(num), both logs taking exact
   * INTEGER arguments (the ln-parity device). Exactness envelope: the
   * binding term is den = dDen·c(prev)·(N1+(·,·)+B), whose c(prev) is a
   * SINGLE context bucket's count — NOT grams/B, because buckets are
   * not uniform: the '<s>' context funnels one gram per document into
   * one bucket. With B = 1024 and dDen = 4, den stays under 2⁵³ while
   * max-bucket-count < 2⁵³/(4·(B²+B)) ≈ 2.1·10⁹ — i.e. reference
   * corpora up to ~2 billion DOCUMENTS (and 2.1·10⁹ grams in any other
   * single bucket); past that the long→double cast may round and the
   * final micro-nat can drift by one between engines. Reference sets
   * are sampled far below that in practice (r15 advice documents the
   * bound honestly). Per-gram −log P is clamped at 0
   * (hash collisions can push p past 1). A seen context guarantees
   * N1+(prev,·) ≥ 1, so num ≥ dNum — no log of zero on any path.
   *
   * Scale shape: ONE reference-scale pass builds all model tables (each
   * ref gram emits three tagged rows; a single map-side-partial count
   * collapses them — the tag-2 (bc, bw) plane is ≤B² rows of aggregate
   * state, reduced to the ≤B-row N1+ maps by vocab-bounded follow-up
   * aggs before collection), then ONE corpus-scale scoring explode.
   */
  def perplexityBucketsKN(df: DataFrame, idCol: Column, textCol: Column,
                          isRef: Column, buckets: Int = 1024,
                          dNum: Int = 3, dDen: Int = 4): DataFrame =
    bucketize(crossEntropyKN(df, idCol, textCol, isRef, buckets, dNum, dDen))

  /** The KN scoring stage alone: (docId, isRef, n_bigrams, ce_micro),
    * checkpointed — see [[perplexityBucketsKN]]. */
  def crossEntropyKN(df: DataFrame, idCol: Column, textCol: Column,
                     isRef: Column, buckets: Int = 1024,
                     dNum: Int = 3, dDen: Int = 4): DataFrame = {
    require(dNum > 0 && dDen > dNum, "discount must satisfy 0 < D < 1")
    val grams = gramStream(df, idCol, textCol, isRef)
      .select(col("docId"), col("isRef"),
        bucket(col("g"), buckets).as("bg"),
        bucket(col("ctx"), buckets).as("bc"),
        bucket(col("w"), buckets).as("bw"))

    // ONE reference pass: tag 0 = bigram-bucket counts, tag 1 =
    // context-bucket counts, tag 2 = distinct (context, word) bucket
    // pairs; ≤ 2B + B² rows of aggregate state at any corpus size
    val tagged = grams.filter(col("isRef"))
      .select(explode(array(
        struct(lit(0).as("tag"), col("bg").as("k1"), lit(0L).as("k2")),
        struct(lit(1).as("tag"), col("bc").as("k1"), lit(0L).as("k2")),
        struct(lit(2).as("tag"), col("bc").as("k1"), col("bw").as("k2"))))
        .as("p"))
      .groupBy(col("p.tag").as("tag"), col("p.k1").as("k1"),
        col("p.k2").as("k2"))
      .agg(count(lit(1)).as("c"))
      .staged // consumed by 4 bounded follow-ups
    def toMap(f: DataFrame): Map[Long, Long] = f.collect().iterator
      .map(r => r.getAs[Long]("k")  -> r.getAs[Long]("c")).toMap
    val cbMap = toMap(tagged.filter(col("tag") === 0)
      .select(col("k1").as("k"), col("c")))
    val ccMap = toMap(tagged.filter(col("tag") === 1)
      .select(col("k1").as("k"), col("c")))
    val pairs = tagged.filter(col("tag") === 2)
    val n1pMap = toMap(pairs.groupBy(col("k1").as("k"))
      .agg(count(lit(1)).as("c")))
    val n1wMap = toMap(pairs.groupBy(col("k2").as("k"))
      .agg(count(lit(1)).as("c")))
    val nccB = pairs.count() + buckets

    def look(m: Map[Long, Long], k: Column): Column =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), k), lit(0L))
    def lnMicroCol(x: Column): Column =
      round(log(x.cast("double")) * 1e6, 0).cast("long")
    val cg = look(cbMap, col("bg"))
    val cp = look(ccMap, col("bc"))
    val n1p = look(n1pMap, col("bc"))
    val n1w = look(n1wMap, col("bw"))
    val num = greatest(lit(dDen.toLong) * cg - dNum, lit(0L)) * nccB +
      lit(dNum.toLong) * n1p * (n1w + 1L)
    val den = lit(dDen.toLong) * cp * nccB
    val t = greatest(
      when(cp === 0L, lit(microLog(nccB.toDouble)) - lnMicroCol(n1w + 1L))
        .otherwise(lnMicroCol(den) - lnMicroCol(num)),
      lit(0L))

    grams
      .select(col("docId"), col("isRef"), t.as("t"))
      .groupBy("docId")
      .agg(first(col("isRef")).as("isRef"),
        count(lit(1)).as("n_bigrams"),
        expr("sum(t) div count(1)").as("ce_micro"))
      .staged
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
