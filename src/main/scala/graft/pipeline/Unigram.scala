package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

/**
 * Unigram language-model tokenizer induction (Kudo 2018, "Subword
 * Regularization: Improving Neural Network Translation Models with
 * Multiple Subword Candidates", arXiv:1804.10959 §3) — the SentencePiece
 * unigram algorithm, the other production tokenizer family next to BPE
 * ([[Bpe]]): instead of growing a vocabulary by merges, it SEEDS a large
 * candidate set, fits piece probabilities by EM over the corpus, and
 * prunes down to the target size. Here in its distributed, hard-EM
 * (Viterbi) formulation:
 *
 *  1. ONE corpus-scale pass builds the word-frequency table ([[Bpe
 *     .wordTable]] — the only stage that touches every corpus token;
 *     the distinct-word table is Zipf-bounded at any scale).
 *  2. Seeding: every substring of length 2..`maxPieceLen` of every
 *     distinct word, weighted by word frequency, scored by
 *     `count · length` (covered characters — the suffix-array seeding
 *     score of the paper's reference implementation); the top
 *     `seedMulti` multi-character pieces plus the whole single-character
 *     alphabet form the seed vocabulary. One aggregation over the word
 *     table; the vocabulary is driver-bounded metadata (≤ seedMulti +
 *     |alphabet| rows) from here on.
 *  3. Each EM round: Viterbi-segment the DISTINCT-WORD table under the
 *     current piece costs (a map-side UDF over ≤ |words| rows — never
 *     the corpus), count pieces weighted by word frequency (vocab-bounded
 *     aggregate), prune to the top `pruneMulti` multi-character pieces by
 *     (count desc, piece asc), keep the whole alphabet with a count
 *     floor of 1 (coverage guarantee — every word stays segmentable),
 *     and re-fit costs.
 *
 * DOCUMENTED deviations from the paper (both standard in distributed
 * re-implementations): the E-step is hard (Viterbi best path, not the
 * forward-backward expectation — Kudo §3.2's l-best with l=1), and
 * pruning is by segmented count, not by likelihood-loss ranking. The
 * data movement is identical to the soft variant's; the refinements
 * change only the driver-side arithmetic on the bounded vocab table.
 *
 * Determinism (external-oracle replayable): all costs are integer
 * micro-nats — cost(piece) = lnMicro(Σcnt) − lnMicro(cnt) with lnMicro =
 * round(ln(integer)·1e6) pre-rounded per integer argument (the
 * established ln-parity device). The Viterbi DP minimizes the packed
 * long `totalCost·64 + pieceLen`, so ties break first on cost, then on
 * the SHORTER final piece; seed and prune ranks tie-break on
 * (score/count desc, piece asc). Every comparison is exact integer
 * arithmetic, so a SQL engine replays training and encoding bit-for-bit.
 *
 * Normalization matches [[Bpe]]: lowercase, strip outside [a-z ], split
 * on spaces.
 */
object Unigram {

  private[pipeline] def lnMicro(x: Long): Long =
    math.round(math.log(x.toDouble) * 1e6)

  /** Viterbi segmentation of one word under integer piece costs.
    * best(k) is packed as cost·64 + j (j = the final piece length,
    * 1 ≤ j ≤ maxLen ≤ 63): minimizing the packed long minimizes cost
    * first, shorter-final-piece second — the deterministic tie-break the
    * SQL oracle replays. The alphabet floor guarantees j = 1 is always
    * available, so the DP never dead-ends; characters outside the vocab
    * (impossible under the shared normalization, defensive regardless)
    * fall back to a single-char piece at prohibitive cost. */
  private[graft] def segment(word: String, cost: collection.Map[String, Long],
                             maxLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = new Array[Long](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var k = 1
    while (k <= n) {
      var j = 1
      val jMax = math.min(maxLen, k)
      while (j <= jMax) {
        if (best(k - j) != Long.MaxValue) {
          val c = cost.get(word.substring(k - j, k)) match {
            case Some(pc) => pc
            case None => if (j == 1) 1L << 40 else -1L
          }
          if (c >= 0) {
            val packed = (best(k - j) / 64 + c) * 64 + j
            if (packed < best(k)) best(k) = packed
          }
        }
        j += 1
      }
      k += 1
    }
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = (best(pos) % 64).toInt
      rev += word.substring(pos - j, pos)
      pos -= j
    }
    out ++= rev.reverseIterator
    out.result()
  }

  /** Seed vocabulary over the word-frequency table: top `seedMulti`
    * multi-character substrings by (cnt·len desc, piece asc) plus the
    * full single-character alphabet with its occurrence counts. */
  private[pipeline] def seedVocab(words: DataFrame, maxPieceLen: Int,
                                  seedMulti: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pieces = words.select(col("freq"), explode(flatten(expr(
        s"""transform(sequence(1, length(word)), i ->
           |  filter(transform(sequence(1, $maxPieceLen),
           |    l -> if(i + l - 1 <= length(word),
           |            substring(word, i, l), null)),
           |    p -> p is not null))""".stripMargin))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val multi = pieces.filter(length(col("piece")) > 1)
      .withColumn("rn", row_number().over(Window.orderBy(
        (col("cnt") * length(col("piece"))).desc, col("piece"))))
      .filter(col("rn") <= seedMulti).drop("rn")
    multi.unionByName(pieces.filter(length(col("piece")) === 1))
  }

  private def costMap(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val tot = lnMicro(vocab.iterator.map(_._2).sum)
    vocab.iterator.map { case (p, c) => p -> (tot - lnMicro(c)) }.toMap
  }

  /**
   * Train the unigram vocabulary: returns (rank, piece, cnt, cost_micro)
   * ordered by rank = row_number over (cnt desc, piece asc) of the final
   * round's vocabulary. One corpus pass (the word table); every round
   * runs on the Zipf-bounded distinct-word table with the vocabulary as
   * ≤ (seedMulti + |alphabet|)-row driver metadata — the [[Bpe.train]]
   * collect policy.
   */
  def train(df: DataFrame, textCol: Column, rounds: Int = 2,
            maxPieceLen: Int = 6, seedMulti: Int = 96,
            pruneMulti: Int = 48): DataFrame = {
    require(maxPieceLen <= 63, "packed DP reserves 6 bits for piece length")
    val spark = df.sparkSession
    val words = Bpe.wordTable(df, textCol).staged
    val seed = seedVocab(words, maxPieceLen, seedMulti).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"))).toSeq
    val alphabet = seed.collect { case (p, _) if p.length == 1 => p }
    var vocab = seed
    var r = 0
    while (r < rounds) {
      val cm = costMap(vocab)
      val segU = udf { (w: String) => segment(w, cm, maxPieceLen) }
      val counts = words.select(explode(segU(col("word"))).as("piece"),
          col("freq"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(x => (x.getAs[String]("piece"), x.getAs[Long]("cnt")))
      val cmap = counts.toMap
      val multi = counts.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }.take(pruneMulti)
      val singles = alphabet.map(a => (a, math.max(cmap.getOrElse(a, 0L), 1L)))
      vocab = multi.toSeq ++ singles
      r += 1
    }
    val tot = lnMicro(vocab.iterator.map(_._2).sum)
    import spark.implicits._
    vocab.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => (i + 1L, p, c, tot - lnMicro(c)) }
      .toDF("rank", "piece", "cnt", "cost_micro")
  }

  /** Tokenize text under a trained vocabulary (piece → cost_micro, the
    * driver-bounded metadata [[train]] produces): one map-side closure
    * UDF per row — the per-word Viterbi DP is imperative by nature (the
    * [[Bpe.encode]] beyond-MaxExprMerges rationale), and the UDF keeps
    * the pass shuffle-free and linear in corpus tokens at any scale. */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
             vocab: Seq[(String, Long)], maxPieceLen: Int = 6): DataFrame = {
    val cm = vocab.toMap
    val enc = udf { (text: String) =>
      val ws = text.toLowerCase.replaceAll("[^a-z ]", "").split(" ")
      ws.iterator.filter(_.nonEmpty)
        .flatMap(w => segment(w, cm, maxPieceLen)).toSeq
    }
    df.select(idCol.as("docId"), enc(textCol).as("tokens"))
  }
}
