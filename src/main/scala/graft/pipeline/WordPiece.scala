package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

/**
 * WordPiece tokenizer induction (Schuster & Nakajima 2012, "Japanese and
 * Korean voice search", ICASSP; the algorithm behind BERT's vocabulary,
 * as documented in Wu et al. 2016, arXiv:1609.08144 §4.1) — the third
 * production tokenizer family next to BPE ([[Bpe]]) and unigram-LM
 * ([[Unigram]]). Structurally it is BPE with a different merge
 * criterion: instead of the most FREQUENT adjacent pair, each round
 * merges the pair maximizing the unigram-likelihood gain
 * `score = count(l,r) / (count(l) · count(r))` — the pair whose parts
 * co-occur most above chance. Continuation pieces carry BERT's `##`
 * prefix from the start: "abc" enters as `<a><##b><##c>`, and merging
 * (l, r) names the new symbol `l + strip##(r)` (so a + ##b → ab,
 * ##b + ##c → ##bc), which makes the learned inventory BERT-shaped.
 *
 * Distributed formulation (the [[Bpe.train]] data movement exactly):
 * ONE corpus-scale word-frequency pass, then every merge round runs on
 * the Zipf-bounded distinct-word table — one adjacent-pair count plus
 * one symbol-occurrence count (both map-side partial), a broadcast join
 * of the vocab-bounded symbol counts onto the pair table, and a single
 * argmax row of driver metadata before a narrow literal `replace`
 * rewrite (localCheckpoint'd per round, the Lloyd-loop pattern).
 *
 * Determinism (external-oracle replayable): the score is the exact
 * integer `score_atto = floor(count(l,r) · 10¹⁸ / (count(l) ·
 * count(r)))`, computed in DECIMAL(38,0) arithmetic — count(l,r) ≤
 * min(count(l), count(r)) bounds the quotient by 10¹⁸ (fits a long),
 * and the product arithmetic stays exact through corpus counts of 10¹²
 * (the 100 TB design point) with headroom to 10¹⁹. Ties break on
 * (score_atto desc, left asc, right asc). Encoding is BERT's greedy
 * longest-match-first (MaxMatch) walk, NOT merge replay: at each
 * position take the longest vocabulary piece (`##`-prefixed after
 * position 0); a position with no match maps the WHOLE word to
 * `[UNK]` — the reference WordPiece behavior.
 *
 * Normalization matches [[Bpe]]: lowercase, strip outside [a-z ], split
 * on spaces ('#' can therefore never collide with alphabet symbols).
 */
object WordPiece {

  /** Scale of the exact integer score: score_atto = c·10¹⁸ / (cl·cr). */
  val ScoreScale: Long = 1000000000000000000L

  private def wrap(word: Column): Column =
    when(length(word) === 1, concat(lit("<"), word, lit(">")))
      .otherwise(concat(lit("<"), substring(word, 1, 1), lit("><##"),
        array_join(split(word.substr(lit(2), length(word)), ""), "><##"),
        lit(">")))

  private[pipeline] def strip(r: String): String =
    if (r.startsWith("##")) r.substring(2) else r

  /**
   * The learned merge table: (rank, left_sym, right_sym, new_sym,
   * pair_count, score_atto) for `nMerges` likelihood-ranked merges.
   * Stops early if no pair remains (single-symbol vocabulary).
   *
   * `maxBatch` > 1 runs the batched-greedy variant ([[Bpe.train]]'s
   * real-vocabulary device — one driver round-trip per ROUND, not per
   * merge): each round ranks the top `maxBatch · CandidateFactor`
   * candidates by (score desc, l, r) and greedily takes up to
   * `maxBatch` pairs sharing NO symbol with an earlier pick of the
   * round — including the earlier pick's merge OUTPUT, so the round's
   * chained replace can never rewrite occurrences another pick of the
   * same round created. For WordPiece the batch is then EXACTLY
   * sequential-equivalent on the taken pairs — the likelihood score
   * c·10¹⁸/(cl·cr) is purely local to (l, r), and merging a
   * batch-disjoint pair changes
   * neither the pair count nor either symbol count of the others — so
   * the only deviation (shared with BPE) is that a symbol created in
   * round b cannot merge again until round b+1; maxBatch = 1 recovers
   * strict sequential training.
   */
  def train(df: DataFrame, textCol: Column, nMerges: Int,
            maxBatch: Int = 1): DataFrame = {
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = df.sparkSession
    var syms = Bpe.wordTable(df, textCol)
      .select(wrap(col("word")).as("sym"), col("freq"))
      .staged
    val merges = Seq.newBuilder[(Long, String, String, String, Long, Long)]
    var done = 0
    var exhausted = false
    while (done < nMerges && !exhausted) {
      val want = math.min(maxBatch, nMerges - done)
      val symCnt = syms
        .select(explode(split(expr("substring(sym, 2, length(sym) - 2)"),
          "><")).as("sym"), col("freq"))
        .groupBy("sym").agg(sum("freq").as("sc"))
      val ranked = Bpe.adjacentPairs(syms)
        .groupBy("l", "r").agg(sum("freq").as("c"))
        .join(broadcast(symCnt.select(col("sym").as("l"),
          col("sc").as("cl"))), Seq("l"))
        .join(broadcast(symCnt.select(col("sym").as("r"),
          col("sc").as("cr"))), Seq("r"))
        .withColumn("score_atto", expr(
          s"(CAST(c AS DECIMAL(38,0)) * $ScoreScale) div " +
            "(CAST(cl AS DECIMAL(38,0)) * CAST(cr AS DECIMAL(38,0)))"))
        .orderBy(col("score_atto").desc, col("l"), col("r"))
        .limit(maxBatch * Bpe.CandidateFactor).collect()
      val used = scala.collection.mutable.Set.empty[String]
      val picks = Seq.newBuilder[(String, String, Long, Long)]
      var taken = 0
      ranked.iterator.takeWhile(_ => taken < want).foreach { row =>
        val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
        if (!used(l) && !used(r)) {
          picks += ((l, r, row.getAs[Long]("c"),
            row.getAs[Long]("score_atto")))
          // new_sym joins the exclusion set: an earlier pick's merge
          // output matching a later pick's l/r would let the chained
          // replace merge occurrences created mid-batch, leaving the
          // later pick's pair_count/score_atto stale (r15 advice)
          used += l; used += r; used += l + strip(r); taken += 1
        }
      }
      val batch = picks.result()
      if (batch.isEmpty) exhausted = true
      else {
        batch.foreach { case (l, r, c, sc) =>
          done += 1
          merges += ((done.toLong, l, r, l + strip(r), c, sc))
        }
        val rewritten = batch.foldLeft(col("sym")) {
          case (acc, (l, r, _, _)) =>
            call_function("replace", acc, lit(s"<$l><$r>"),
              lit(s"<${l + strip(r)}>"))
        }
        syms = syms.select(rewritten.as("sym"), col("freq"))
          .staged
      }
    }
    import spark.implicits._
    merges.result()
      .toDF("rank", "left_sym", "right_sym", "new_sym", "pair_count",
        "score_atto")
  }

  /** The single-symbol alphabet the corpus induces under the `##`
    * convention: every word-initial character bare, every non-initial
    * character `##`-prefixed. Bounded driver metadata (≤ 52 rows under
    * the shared normalization) — together with [[train]]'s `new_sym`
    * column it is the complete encode vocabulary. */
  def alphabet(df: DataFrame, textCol: Column): Seq[String] = {
    val words = Bpe.wordTable(df, textCol)
    words.select(substring(col("word"), 1, 1).as("p"))
      .unionByName(words.filter(length(col("word")) > 1)
        .select(explode(split(col("word").substr(lit(2),
          length(col("word"))), "")).as("c"))
        .select(concat(lit("##"), col("c")).as("p")))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
  }

  /** Greedy longest-match-first segmentation of one word: at each
    * position the longest vocabulary piece wins (`##`-prefixed after
    * position 0); no match at any position collapses the whole word to
    * `[UNK]`. */
  private[graft] def matchWord(w: String, vocab: Set[String],
                               maxLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val pre = if (pos == 0) "" else "##"
      var j = math.min(maxLen, w.length - pos)
      var found: String = null
      while (j >= 1 && found == null) {
        val cand = pre + w.substring(pos, pos + j)
        if (vocab(cand)) found = cand else j -= 1
      }
      if (found == null) return Seq("[UNK]")
      out += found
      pos += j
    }
    out.toSeq
  }

  /** Tokenize text under a WordPiece vocabulary (alphabet + merged
    * pieces — driver-bounded metadata): one map-side closure UDF per
    * row, the [[Unigram.encode]] rationale — MaxMatch is imperative by
    * nature, and the UDF keeps the pass shuffle-free and linear in
    * corpus tokens at any scale. */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
             vocab: Seq[String]): DataFrame = {
    val vs = vocab.toSet
    val maxLen = vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length)
      .foldLeft(1)(math.max)
    val enc = udf { (text: String) =>
      val ws = text.toLowerCase.replaceAll("[^a-z ]", "").split(" ")
      ws.iterator.filter(_.nonEmpty)
        .flatMap(w => matchWord(w, vs, maxLen)).toSeq
    }
    df.select(idCol.as("docId"), enc(textCol).as("tokens"))
  }
}
