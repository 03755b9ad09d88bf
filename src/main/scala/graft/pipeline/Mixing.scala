package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Domain-mixture optimization for training-data pipelines — the stage that
 * decides HOW MUCH of each source/language the final training set draws:
 *
 *  - DoReMi (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up
 *    Language Model Pretraining", arXiv:2305.10429, Algorithm 1): Group-DRO
 *    multiplicative-weights ascent on per-domain EXCESS loss.
 *  - UniMax (Chung et al. 2023, "UniMax: Fairer and More Effective Language
 *    Sampling for Large-Scale Multilingual Pretraining", ICLR 2023,
 *    arXiv:2304.09151): budget-constrained uniform allocation with a
 *    per-language epoch cap — waterfilling over ascending language sizes.
 *
 * Both reduce the corpus to ONE bounded aggregation (a row per domain —
 * a handful at any corpus size) and run the published update/allocation
 * arithmetic on that metadata, so the 100 TB cost is a single map-side-
 * partial groupBy regardless of T steps or language count.
 */
object Mixing {

  /**
   * DoReMi domain weights from a per-document proxy-loss frame. The
   * published Algorithm 1 interleaves proxy-model training with the
   * weight updates; this engine-side formulation runs the SAME
   * multiplicative-weights loop over a STATIC excess-loss vector (the
   * per-domain mean cross-entropy above the corpus mean, e.g. from
   * [[Perplexity.crossEntropy]] — proxy losses from any scorer plug in),
   * which is Algorithm 1 with the per-step loss re-estimation pinned to
   * its first measurement:
   *
   *   λ_k   = max(0, mean_k(loss) − mean(loss))          (excess loss)
   *   α⁰    = uniform
   *   α'    = α^{t−1} · exp(η·λ)        (mirror ascent, t = 1..steps)
   *   α^t   = (1−c) · α'/‖α'‖₁ + c·u    (smoothing toward uniform u)
   *
   * Determinism: domain means are integer micro-nat divisions
   * (`sum div count`); each step's α is re-fixed-pointed to integer
   * 1e-12 units and the normalizer is an EXACT integer sum, so the only
   * float exposure per step is one exp/multiply/divide chain in
   * oracle-matched expression order (the established microLog class).
   *
   * Input: one row per document with (domain, lossMicro). Output: one row
   * per domain — (domain, n_docs, excess_micro, alpha_micro), α scaled
   * 1e12.
   */
  def doremiWeights(df: DataFrame, domainCol: Column, lossMicroCol: Column,
                    steps: Int = 5, eta: Double = 1.0,
                    smoothing: Double = 0.001): DataFrame = {
    val spark = df.sparkSession
    // ONE corpus-scale agg: per-domain loss sums AND the global sum ride
    // the same frame (the global mean derives from the collected rows —
    // no second job)
    val dom = df.select(domainCol.as("domain"),
        lossMicroCol.cast("long").as("lm"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n"), sum(col("lm")).as("s"))
      .collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n"),
        r.getAs[Long]("s")))
      .sortBy(_._1)
    require(dom.nonEmpty, "doremi needs a non-empty corpus")
    val totalN = dom.map(_._2).sum
    val totalS = dom.map(_._3).sum
    val mu = totalS / totalN                       // integer micro mean
    val lam = dom.map { case (_, n, s) => math.max(0L, s / n - mu) }
    val L = dom.length
    val S = 1e12
    def half(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // α in integer 1e-12 units; each step: exponentiate, exact-integer
    // normalize, smooth, re-fix — the oracle replays the identical chain
    var a: Array[Long] = Array.fill(L)(half(S / L))
    for (_ <- 1 to steps) {
      val r = a.indices.map(k =>
        half(a(k).toDouble * math.exp(eta * (lam(k).toDouble / 1e6)))).toArray
      val d = r.sum
      a = r.map(rk =>
        half((1.0 - smoothing) * (rk.toDouble / d.toDouble) * S +
          smoothing * S / L))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(dom.indices.map(k =>
        Row(dom(k)._1, dom(k)._2, lam(k), a(k))): _*),
      StructType(Seq(
        StructField("domain", StringType, nullable = true),
        StructField("n_docs", LongType, nullable = false),
        StructField("excess_micro", LongType, nullable = false),
        StructField("alpha_micro", LongType, nullable = false))))
  }

  /**
   * Temperature-scaled language sampling — the standard multilingual
   * mixing baseline (Conneau & Lample et al. 2020, XLM-R,
   * arXiv:1911.02116 §3.1; Raffel et al. 2020, T5, arXiv:1910.10683
   * §3.4.1 "examples-proportional with temperature"): sampling
   * probability q_l ∝ p_l^α where p_l is the natural share — α = 1 is
   * proportional, α → 0 uniform; XLM-R's published α = 0.3 upweights
   * tail languages. Returns one row per language:
   * (source, n_docs, natural_micro, q_micro, boost_micro) with every
   * share fixed-pointed to integer micro-units. Each p^α term is
   * fixed-pointed to 1e-12 units BEFORE the normalizer sums them, so the
   * sum is an exact integer — order-independent, no float accumulation
   * (the DoReMi normalizer discipline).
   *
   * Scale shape: one map-side-partial groupBy(language); the temperature
   * arithmetic runs on the collected bounded table (the mixtureRates
   * discipline). Compose with [[Sampling.stratifiedSample]] downstream:
   * rate_l = q_l·M/n_l for the chosen corpus size M.
   */
  def temperatureShares(df: DataFrame, sourceCol: Column,
                        alpha: Double = 0.3): DataFrame = {
    require(alpha > 0, "temperature exponent must be positive")
    val spark = df.sparkSession
    val counts = df.select(sourceCol.as("source"))
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n")))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperature sampling needs a non-empty corpus")
    val total = counts.map(_._2).sum
    def half(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // p^α fixed-pointed to 1e-12 units per language; the normalizer is
    // their EXACT integer sum
    val tMicro = counts.map { case (_, n) =>
      half(math.pow(n.toDouble / total.toDouble, alpha) * 1e12)
    }
    val z = tMicro.sum
    val rows = counts.zipWithIndex.map { case ((s, n), i) =>
      val p = n.toDouble / total.toDouble
      val q = tMicro(i).toDouble / z.toDouble
      Row(s, n, half(p * 1e6), half(q * 1e6), half(q / p * 1e6))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("source", StringType, nullable = true),
        StructField("n_docs", LongType, nullable = false),
        StructField("natural_micro", LongType, nullable = false),
        StructField("q_micro", LongType, nullable = false),
        StructField("boost_micro", LongType, nullable = false))))
  }

  /**
   * UniMax budget allocation: given per-language sizes n_l (characters),
   * a total training budget B and an epoch cap N, allocate ascending by
   * size — a language small enough that N full epochs fit under an equal
   * split of the remaining budget is CAPPED at N·n_l; every larger
   * language splits what remains equally (Chung et al. 2023 §3,
   * Algorithm 1 — the closed-form waterfilling):
   *
   *   capped prefix k = max prefix (sizes ascending, ties by name) with
   *     N·n_r·(L−r+1) ≤ B − N·cum_{r−1}   for all r ≤ k
   *   alloc_r = N·n_r                      (r ≤ k)
   *   alloc_r = (B − N·cum_k) div (L − k)  (r > k)
   *
   * PURE integer arithmetic end to end (comparisons, sums, truncating
   * divisions) — bit-equal in any engine, no float anywhere. Returns one
   * row per language: (source, n_chars, alloc_chars, epochs_micro).
   *
   * Scale shape: one map-side-partial groupBy(language) over the corpus;
   * the waterfilling runs on the collected ≤|languages|-row table
   * (bounded metadata, the mixtureRates discipline).
   */
  def unimaxAllocation(df: DataFrame, sourceCol: Column, sizeCol: Column,
                       budget: Long, maxEpochs: Long): DataFrame = {
    require(budget > 0 && maxEpochs > 0, "unimax needs positive budget/cap")
    val spark = df.sparkSession
    val sizes = df.select(sourceCol.as("source"),
        sizeCol.cast("long").as("sz"))
      .groupBy("source").agg(sum(col("sz")).as("n"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n")))
      .sortBy { case (s, n) => (n, s) }            // ascending, name ties
    val L = sizes.length
    require(L > 0, "unimax needs a non-empty corpus")
    var cum = 0L
    var k = 0
    var broken = false
    sizes.zipWithIndex.foreach { case ((_, n), i) =>
      val r = i + 1
      if (!broken && maxEpochs * n * (L - r + 1) <= budget - maxEpochs * cum) {
        k = r; cum += n
      } else broken = true
    }
    val share = if (k == L) 0L else (budget - maxEpochs * cum) / (L - k)
    val rows = sizes.zipWithIndex.map { case ((s, n), i) =>
      val alloc = if (i + 1 <= k) maxEpochs * n else share
      Row(s, n, alloc, if (n == 0) 0L else alloc * 1000000L / n)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("source", StringType, nullable = true),
        StructField("n_chars", LongType, nullable = false),
        StructField("alloc_chars", LongType, nullable = false),
        StructField("epochs_micro", LongType, nullable = false))))
  }

  /**
   * Data-constrained scaling allocation (Muennighoff et al. 2023,
   * "Scaling Data-Constrained Language Models", arXiv:2305.16264 §4):
   * repeating data decays in value — the effective data of seen tokens
   * D = ep·U over U unique tokens is
   *
   *   D′ = U + U·R*·(1 − e^(−(ep−1)/R*)),   ep > 1   (Eq. 6 shape)
   *   D′ = D                                 ep ≤ 1
   *
   * with the paper's fitted decay R*_D ≈ 15.39 (their Table 2 fit: ~15
   * epochs to reach e⁻¹ of the marginal value; fresh data is worth its
   * face value, the ep→∞ asymptote is U·(1+R*)). The budget splits
   * EQUALLY across sources, so small sources repeat into the decay
   * regime while large ones stay under one epoch — the paper's
   * repeated-vs-fresh contrast in one frame.
   *
   * Determinism: ep and the decay run in doubles, but every
   * transcendental is immediately fixed-pointed — e^x rounds HALF_UP to
   * integer NANO-units before the effective-token arithmetic (engine
   * parity of `round(exp(x)·1e9)` verified Java vs DuckDB over
   * x ∈ [−45, 0], 0 mismatches on a 41k-point sweep), and all outputs
   * are integer tokens / micro-units.
   *
   * Scale shape: ONE map-side-partial groupBy(source) over the corpus;
   * the scaling law runs on the collected ≤|sources|-row table (bounded
   * metadata, the mixtureRates discipline). Returns one row per source:
   * (source, unique_tokens, seen_tokens, epochs_micro, effective_tokens,
   * utility_micro) — utility = D′/D, the fraction of the spent budget
   * that still buys learning.
   */
  /** Hoffmann 2022 ("Training Compute-Optimal Large Language Models",
    * arXiv:2203.15556) Approach-3 fitted constants: L(N, D) = E + A/N^α
    * + B/D^β with A = 406.4, B = 410.7, α = 0.34, β = 0.28. Under the
    * C = 6·N·D budget the optimum is N* = G·(C/6)^{β/(α+β)},
    * D* = (C/6)^{α/(α+β)}/G with G = (αA/βB)^{1/(α+β)}. The exponents
    * and ln G are fixed to integer micro-nats ONCE here; the oracle SQL
    * embeds the same literals, so the allocation arithmetic is pure
    * integer and engine-exact. */
  private[graft] val ChinchillaNExpMicro: Long = 451613  // β/(α+β)
  private[graft] val ChinchillaDExpMicro: Long = 548387  // α/(α+β)
  private[graft] val ChinchillaLnGMicro: Long = 296179   // ln G

  /** ln(10^e / 6) in micro-nats for a compute-budget decade ladder —
    * shared literal source for the Spark plan and the SQL oracle. */
  private[graft] def chinchillaLadder(minExp: Int, maxExp: Int): Seq[(Int, Long)] =
    (minExp to maxExp).map(e =>
      e -> math.round((e * math.log(10) - math.log(6)) * 1e6))

  /**
   * Compute-optimal training plan for THIS corpus (Hoffmann 2022): for
   * each compute budget C = 10^e FLOPs on the ladder, the optimal model
   * size N*, token count D*, and whether the corpus covers D* — the
   * feasibility read a data team takes before committing a budget
   * ([[dataConstrainedEffective]] is the follow-on when it doesn't).
   *
   * All outputs are LOG-SPACE integer micro-nats: ln N*, ln D*, the
   * tokens-per-param ratio, and the data deficit ln(D* over T). Deliberate —
   * exponentiating back to raw counts would put a double `exp`/`pow` on
   * positive arguments in the replay path, outside the range where
   * Java↔DuckDB parity is verified; in log space the law is literal
   * constants + integer multiply/divide, exact in any engine. The only
   * corpus-dependent input is T (one map-side-partial aggregation);
   * everything else is bounded metadata at any scale.
   */
  def chinchillaPlan(df: DataFrame, tokensCol: Column, minExp: Int = 18,
                     maxExp: Int = 26): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.agg(sum(tokensCol.cast("long")).as("corpus_tokens"))
    val ladder = chinchillaLadder(minExp, maxExp)
      .toDF("c_exp", "lnc6_micro")
    ladder.crossJoin(broadcast(total))
      .select(col("c_exp").cast("long").as("c_exp"),
        (lit(ChinchillaLnGMicro) +
          expr(s"($ChinchillaNExpMicro * lnc6_micro) div 1000000"))
          .as("ln_n_opt_micro"),
        (lit(-ChinchillaLnGMicro) +
          expr(s"($ChinchillaDExpMicro * lnc6_micro) div 1000000"))
          .as("ln_d_opt_micro"),
        col("corpus_tokens"))
      .withColumn("ln_tokens_per_param_micro",
        col("ln_d_opt_micro") - col("ln_n_opt_micro"))
      .withColumn("data_deficit_ln_micro",
        col("ln_d_opt_micro") -
          round(log(col("corpus_tokens").cast("double")) * 1e6, 0).cast("long"))
      .withColumn("data_constrained", col("data_deficit_ln_micro") > 0)
      .orderBy("c_exp")
  }

  def dataConstrainedEffective(df: DataFrame, sourceCol: Column,
                               tokensCol: Column, budget: Long,
                               rdStar: Double = 15.39): DataFrame = {
    require(budget > 0, "data-constrained allocation needs a positive budget")
    val spark = df.sparkSession
    val sizes = df.select(sourceCol.as("source"),
        tokensCol.cast("long").as("t"))
      .groupBy("source").agg(sum(col("t")).as("u"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("u")))
      .sortBy(_._1)
    val L = sizes.length
    require(L > 0, "data-constrained allocation needs a non-empty corpus")
    // budget < L makes the integer per-source slice 0 and the utility
    // division 0/0 — surface the configuration error instead of an opaque
    // BigDecimal(NaN) NumberFormatException downstream
    require(budget >= L,
      s"budget $budget below one token per source ($L sources)")
    def half(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = sizes.map { case (s, u) =>
      require(u > 0, s"source '$s' has zero tokens")
      val bs = budget / L
      val ep = bs.toDouble / u.toDouble
      val eff =
        if (ep <= 1.0) bs
        else {
          val en = half(math.exp(-(ep - 1.0) / rdStar) * 1e9)
          u + half(u.toDouble * rdStar * (1.0 - en.toDouble / 1e9))
        }
      Row(s, u, bs, half(ep * 1e6), eff,
        half(eff.toDouble / bs.toDouble * 1e6))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("source", StringType, nullable = true),
        StructField("unique_tokens", LongType, nullable = false),
        StructField("seen_tokens", LongType, nullable = false),
        StructField("epochs_micro", LongType, nullable = false),
        StructField("effective_tokens", LongType, nullable = false),
        StructField("utility_micro", LongType, nullable = false))))
  }
}
