package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

/**
 * WIMBD corpus analysis (Elazar et al. 2023, "What's In My Big Data?",
 * arXiv:2310.20707) — the paper's COUNT primitive family, the
 * look-before-you-train reads it runs over C4/Pile/RedPajama-scale
 * corpora: most-common n-grams, duplicate n-gram mass, duplicate
 * document mass, and the document-length distribution. (The paper's
 * other primitive, SEARCH, is [[Bm25]]; its contamination analysis is
 * the [[Decontaminate]] family; the approximate heavy-hitter path when
 * even one n-gram shuffle is too much is [[Sketches.countMin]].)
 *
 * Scale shape — each read is ONE corpus pass into bounded output:
 *  - [[topNgrams]]: n-gram explode → count (map-side partial) → top-k
 *    as TakeOrderedAndProject (size-k heap per partition, never a
 *    global sort). The gram count state is vocabulary-bounded (Zipf),
 *    the output k rows.
 *  - [[summary]]: ONE n-gram-keyed agg for type/token counts, one
 *    content-hash agg for duplicate-doc mass, and a rank-condition
 *    median over the doc-length HISTOGRAM (the perplexity-tertile
 *    device: the cumulative window sorts per-value counts, never rows —
 *    no data-derived limit(k), no Int ceiling). Output: one row.
 *
 * Determinism: counts are longs; fractions are reported in integer
 * micro units via `x * 1000000 div y`; top-k ties break on the gram
 * string ascending. Tokenization is raw whitespace splitting (the
 * paper counts surface n-grams; empty tokens filtered).
 */
object Wimbd {

  private def toks(c: Column): Column =
    filter(split(c, " "), w => w =!= "")

  private[pipeline] def ngrams(c: Column, n: Int): Column =
    if (n == 1) toks(c)
    else {
      val t = toks(c)
      // sequence(1, 0) DESCENDS in Spark — guard the short-doc case
      when(size(t) >= n, transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }

  /** The k most frequent n-grams: (rank, gram, cnt), ties on the gram
    * string. One shuffle (map-side-partial count), top-k per-partition
    * heaps. */
  def topNgrams(df: DataFrame, textCol: Column, n: Int, k: Int): DataFrame =
    df.select(explode(ngrams(textCol, n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("gram"))).cast("long"))
      .select(col("rank"), col("gram"), col("cnt"))

  /**
   * Heaps'-law vocabulary-growth curve (Heaps 1978, "Information
   * Retrieval: Computational and Theoretical Aspects" §5.7; Herdan's
   * law) — V(n) ≈ K·nᵝ, the read that sizes tokenizer vocabularies and
   * predicts how many new types the next 10× of crawl will bring. The
   * "growing prefix" is the deterministic md5 256-range document order
   * ([[Sampling.packSequences]]' device), so the curve is a pure
   * function of (corpus, seed): per range, cumulative token count and
   * cumulative NEW-word count, where a word's range of first appearance
   * is `min(range)` over the docs containing it — an order-free
   * aggregate, not a scan.
   *
   * Scale shape: token mass per range needs NO explode (a map-side
   * size() sum); the type side is one word-keyed min-range agg
   * (vocabulary-bounded state — Zipf) collapsed to a 256-row
   * first-appearance histogram; both cumulative windows run over 256
   * rows of metadata. Output: (range, tokens_cum, vocab_cum), 256 rows
   * — the log-log β fit happens downstream on this bounded frame.
   */
  def heapsCurve(df: DataFrame, idCol: Column, textCol: Column,
                 seed: String): DataFrame = {
    val spark = df.sparkSession
    val rng = conv(substring(md5(concat(lit(seed), lit("|"),
      idCol.cast("string"))), 1, 2), 16, 10).cast("int").as("rng")
    val perRange = df.select(rng, size(toks(textCol)).as("n"))
      .groupBy("rng").agg(sum("n").as("t"))
    val newWords = df.select(rng, explode(toks(textCol)).as("w"))
      .groupBy("w").agg(min("rng").as("fr"))
      .groupBy(col("fr").as("rng")).agg(count(lit(1)).as("v"))
    val ranges = spark.range(256).select(col("id").cast("int").as("rng"))
    val w = Window.orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranges
      .join(perRange, Seq("rng"), "left")
      .join(newWords, Seq("rng"), "left")
      .select(col("rng"), coalesce(col("t"), lit(0L)).as("t"),
        coalesce(col("v"), lit(0L)).as("v"))
      .select(col("rng").cast("long").as("range"),
        sum(col("t")).over(w).as("tokens_cum"),
        sum(col("v")).over(w).as("vocab_cum"))
      .orderBy("range")
  }

  /**
   * Good–Turing frequency-of-frequencies telemetry (Good 1953,
   * Biometrika 40 — the Turing estimator; presentation follows Gale &
   * Sampson 1995 §1-2): the count-of-counts table n_r with the
   * Turing-smoothed counts r* = (r+1)·n_{r+1}/n_r and the probability
   * mass GT assigns to each frequency class, mass_r = (r+1)·n_{r+1}/N —
   * whose r = 0 row IS the unseen-species mass n_1/N, the standard
   * answer to "how much vocabulary has this corpus not seen yet"
   * (complementing [[heapsCurve]]'s growth trajectory).
   *
   * Scale shape: ONE corpus token pass into the vocabulary-bounded
   * word-count table; the count-of-counts agg collapses that to
   * O(√tokens) rows, of which the r ≤ maxR+1 slice (driver metadata)
   * feeds exact BigInt arithmetic — micro-rounded by truncating
   * division, replayable in HUGEINT. Rows r = 0..maxR:
   * (r, n_r, rstar_micro, mass_micro); rstar_micro is 0 where
   * undefined (r = 0 or n_r = 0).
   */
  def goodTuring(df: DataFrame, textCol: Column, maxR: Int = 20): DataFrame = {
    val spark = df.sparkSession
    val words = df.select(explode(toks(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .staged // feeds the total and the count-of-counts
    val n = words.agg(coalesce(sum("c"), lit(0L)).as("n"))
      .collect()(0).getAs[Long]("n")
    require(n > 0, "Good-Turing needs a non-empty corpus")
    val nr = words.groupBy(col("c").as("r")).agg(count(lit(1)).as("nr"))
      .filter(col("r") <= maxR + 1)
      .collect().map(x => x.getAs[Long]("r") -> x.getAs[Long]("nr")).toMap
    import spark.implicits._
    (0 to maxR).map { r =>
      val nrR = nr.getOrElse(r.toLong, 0L)
      val nrR1 = nr.getOrElse(r + 1L, 0L)
      val rstar =
        if (r == 0 || nrR == 0L) 0L
        else ((BigInt(r + 1) * nrR1 * 1000000) / nrR).toLong
      val mass = ((BigInt(r + 1) * nrR1 * 1000000) / n).toLong
      (r.toLong, nrR, rstar, mass)
    }.toDF("r", "n_r", "rstar_micro", "mass_micro")
  }

  /**
   * The corpus summary card: one row of
   * (n_docs, n_tokens, n_gram_tokens, n_gram_types, dup_gram_micro,
   * dup_doc_micro, median_len) for n-grams of order `n` —
   * `dup_gram_micro` = 1 − types/tokens (the paper's duplicate n-gram
   * mass, §3.2), `dup_doc_micro` = fraction of docs whose exact text
   * repeats an earlier doc (content-hash keeper), `median_len` = the
   * multiset median token count via the rank-condition histogram.
   */
  def summary(df: DataFrame, textCol: Column, n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(size(toks(textCol)).as("len"),
      md5(textCol).as("h"))
      .staged // feeds three bounded aggs, one projection pass
    val grams = df.select(explode(ngrams(textCol, n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum("c"), lit(0L)).as("gtok"),
        count(lit(1)).as("gtyp")).collect()(0)
    val (gtok, gtyp) = (grams.getAs[Long]("gtok"), grams.getAs[Long]("gtyp"))
    val dupDocs = base.groupBy("h").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("dups"),
        coalesce(sum("c"), lit(0L)).as("docs")).collect()(0)
    val (dups, docs) = (dupDocs.getAs[Long]("dups"), dupDocs.getAs[Long]("docs"))
    require(docs > 0, "WIMBD summary needs a non-empty corpus")
    val ntok = base.agg(coalesce(sum("len"), lit(0L)).as("t"))
      .collect()(0).getAs[Long]("t")
    // multiset median over the length histogram: min len with 2·cum ≥ n
    val wCum = Window.orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = base.groupBy("len").agg(count(lit(1)).as("c"))
      .select(col("len"), sum(col("c")).over(wCum).as("cum"))
      .agg(min(when(lit(2) * col("cum") >= docs, col("len"))).as("m"))
      .collect()(0).getAs[Int]("m").toLong
    // micro fractions through BigInt: gram counts at the 100 TB design
    // point (~1e13) overflow a long when scaled by 1e6
    def micro(a: Long, b: Long): Long =
      if (b == 0) 0L else ((BigInt(a) * 1000000) / BigInt(b)).toLong
    import spark.implicits._
    Seq((docs, ntok, gtok, gtyp, micro(gtok - gtyp, gtok),
      micro(dups, docs), med))
      .toDF("n_docs", "n_tokens", "n_gram_tokens", "n_gram_types",
        "dup_gram_micro", "dup_doc_micro", "median_len")
  }

  /**
   * Per-document n-gram novelty — the fraction of a document's distinct
   * n-grams whose corpus-wide FIRST occurrence (minimum doc id, the
   * dedupSegments attribution rule) is the document itself. The
   * memorization-literature read of "how much of this doc is new text"
   * (cf. WIMBD's duplicate-mass counts, which aggregate the same
   * first-occurrence structure corpus-wide): boilerplate-heavy docs
   * score near 0, fresh text near 1e6.
   *
   * Shape: one shingle explode → distinct → a gram-keyed min-agg
   * (map-side partial) joined back on the gram — the dedupSegments data
   * movement — then one doc-keyed agg. Hot boilerplate grams collapse in
   * the partial agg before the shuffle; the join is AQE-skew-splittable.
   */
  def gramNovelty(df: DataFrame, idCol: Column, textCol: Column,
                  n: Int = 5): DataFrame = {
    val sh = df.select(idCol.as("docId"),
      explode(array_distinct(Dedup.shingles(textCol, n))).as("sh"))
      .filter(col("sh").isNotNull)
    val firsts = sh.groupBy(col("sh")).agg(min(col("docId")).as("firstDoc"))
    sh.join(firsts, "sh")
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("nGrams"),
        sum(when(col("firstDoc") === col("docId"), 1L).otherwise(0L))
          .as("nNovel"))
      .withColumn("noveltyMicro", expr("(1000000 * nNovel) div nGrams"))
  }

  /**
   * Zipf rank-frequency fit over the top-`topV` vocabulary: least-squares
   * slope/intercept of ln(count) against ln(rank) — the corpus-health
   * read next to [[heapsCurve]] (natural text slopes ≈ −1; templated or
   * deduplicated-to-death corpora flatten). Counts come from ONE
   * word-frequency agg; the top-V table is TakeOrderedAndProject (per-
   * partition heaps) and the regression runs on ≤topV rows of collected
   * driver metadata in exact BigInt arithmetic — the HLL/mixing-law
   * class of driver state.
   *
   * Engine exactness: x = lnMicro(rank), y = lnMicro(count) (HALF_UP
   * micro-nats, the ln-parity device); the slope numerator
   * V·Σxy − Σx·Σy is ≤ 0 BY CONSTRUCTION (y is non-increasing in rank —
   * Chebyshev's sum inequality), so the truncating divisions below run
   * on non-negative integers where Scala BigInt `/`, Spark `div` and
   * DuckDB `//` all agree:
   *   negslope_micro = (1e6·(Σx·Σy − V·Σxy)) / (V·Σx² − (Σx)²)
   *   intercept_micro = (Σy + (negslope_micro·Σx) / 1e6) / V
   * Output one row: (v, slope_micro, intercept_micro).
   */
  def zipfFit(df: DataFrame, textCol: Column, topV: Int = 256): DataFrame = {
    require(topV >= 2, "a slope needs at least two vocabulary points")
    val spark = df.sparkSession
    val top = df.select(explode(toks(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topV)
      .collect().map(_.getAs[Long]("c"))
    val v = top.length
    if (v == 0) {
      // empty corpus: no points, no fit — a zero row beats a divide crash
      import spark.implicits._
      return Seq((0L, 0L, 0L)).toDF("v", "slope_micro", "intercept_micro")
    }
    def lnMicro(x: Long): Long =
      BigDecimal(math.log(x.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val xs = (1 to v).map(r => BigInt(lnMicro(r.toLong)))
    val ys = top.map(c => BigInt(lnMicro(c))).toSeq
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sx2 = xs.map(a => a * a).sum
    val den = BigInt(v) * sx2 - sx * sx
    val negSlope =
      if (den == 0) BigInt(0)
      else (BigInt(1000000) * (sx * sy - BigInt(v) * sxy)) / den
    val intercept = (sy + negSlope * sx / BigInt(1000000)) / BigInt(v)
    import spark.implicits._
    Seq((v.toLong, (-negSlope).toLong, intercept.toLong))
      .toDF("v", "slope_micro", "intercept_micro")
  }
}
