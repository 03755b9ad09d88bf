package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

/**
 * Byte-pair-encoding tokenizer induction over a corpus (Sennrich et al.
 * 2016, "Neural Machine Translation of Rare Words with Subword Units",
 * arXiv:1508.07909 §3.2) — the algorithm behind GPT-2/SentencePiece-BPE
 * vocabularies, here in its distributed formulation:
 *
 *  1. ONE corpus-scale pass counts word frequencies (explode + map-side
 *     partial agg). This is the only stage that touches every token of
 *     the corpus.
 *  2. Every merge iteration runs on the DISTINCT-WORD table, which Zipf
 *     bounds far below corpus size at any scale (a 100 TB crawl has
 *     millions of distinct normalized words, not trillions). Each round:
 *     one adjacent-pair explode + weighted count (map-side partial), one
 *     argmax — a SINGLE row of driver metadata, same class as DSIR's
 *     bucket table or k-means' centroid rows — then a narrow literal
 *     `replace` projection rewrites the vocabulary. The table is
 *     localCheckpoint'd per round (the Lloyd-loop pattern: round N's
 *     plan must not embed round N−1's subtree).
 *
 * Determinism: the argmax tie-breaks on (count desc, left asc, right
 * asc); symbol rewriting uses sequential left-to-right non-overlapping
 * string `replace` — the SAME greedy application order the reference BPE
 * uses and the same semantics in every SQL engine, so an external oracle
 * replays training exactly. Symbols travel in an unambiguous wrapped
 * form `<ab><c>` (every symbol bracketed), which makes the pair pattern
 * `<a><b>` collision-free against symbol suffixes/prefixes.
 *
 * Normalization for the symbol alphabet: lowercase, strip everything
 * outside [a-z ] (keeps the wrapper characters out of the alphabet; a
 * byte-level variant would escape them instead — the plumbing is
 * identical).
 */
object Bpe {

  private[pipeline] def wordTable(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(regexp_replace(lower(textCol), "[^a-z ]", ""), " "))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private def wrap(word: Column): Column =
    concat(lit("<"), array_join(split(word, ""), "><"), lit(">"))

  private[pipeline] def adjacentPairs(syms: DataFrame): DataFrame =
    syms.select(col("freq"),
        split(expr("substring(sym, 2, length(sym) - 2)"), "><").as("s"))
      .select(col("freq"), explode(expr(
        // sequence(1, 0) DESCENDS in Spark — guard the single-symbol word
        "transform(if(size(s) > 1, sequence(1, size(s) - 1), " +
          "array()), " +
          "j -> struct(element_at(s, j) AS l, element_at(s, j + 1) AS r))"))
        .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))

  /** Candidate window per batch round: both engines pick greedily from
    * the top `maxBatch * CandidateFactor` ranked pairs, so the selection
    * is identical however deep the conflict skips go. */
  private[graft] val CandidateFactor = 16

  /**
   * The learned merge table: (rank, left_sym, right_sym, pair_count) for
   * the `nMerges` most frequent adjacent symbol pairs, each applied to
   * the vocabulary before the next is counted.
   *
   * `maxBatch` > 1 runs the batched-greedy variant — the standard
   * distributed-trainer device for real vocabulary sizes (a 32k-merge
   * GPT-2-class vocabulary cannot afford one driver-synchronized job
   * pair PER merge): each of the ceil(nMerges/maxBatch) rounds counts
   * pairs ONCE, ranks the top `maxBatch · 16` candidates, and greedily
   * takes up to `maxBatch` pairs that share NO symbol with an
   * earlier-taken pair of the same batch — the earlier pick's merge
   * OUTPUT included, so the chained replace never rewrites occurrences
   * created mid-batch (batch-disjoint pairs have non-interfering
   * occurrences, so their batch-start counts are exact
   * and in-batch application order cannot matter). The DOCUMENTED
   * deviation from strictly-sequential Sennrich training: a symbol
   * created in round b cannot merge again until round b+1, even if the
   * new pair would outrank the batch's remaining picks — maxBatch = 1
   * recovers the sequential algorithm exactly. The candidate window is
   * part of the contract (both the Spark side and the SQL oracle pick
   * from the same top-(maxBatch·16) ranked list, so conflict skips
   * resolve identically); a round that exhausts the window short of
   * `maxBatch` simply picks fewer, and ranks stay consecutive.
   */
  def train(df: DataFrame, textCol: Column, nMerges: Int,
            maxBatch: Int = 1, maxRounds: Int = 0): DataFrame = {
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = df.sparkSession
    var syms = wordTable(df, textCol)
      .select(wrap(col("word")).as("sym"), col("freq"))
      .staged
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = 0
    // early rounds are CONFLICT-STARVED: the symbol-disjointness rule
    // bounds round-0 picks by ~|alphabet|/2 however wide the window, so a
    // deep target cannot land nMerges in ceil(nMerges/maxBatch) rounds.
    // `maxRounds` raises the round budget (still a fixed driver-round-trip
    // bound — the scale claim is rounds, not merges); the default keeps
    // the historical ceil(n/batch).
    val rounds =
      if (maxRounds > 0) maxRounds else (nMerges + maxBatch - 1) / maxBatch
    var round = 0
    var exhausted = false
    while (round < rounds && done < nMerges && !exhausted) {
      val want = math.min(maxBatch, nMerges - done)
      val ranked = adjacentPairs(syms)
        .groupBy("l", "r").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(maxBatch * CandidateFactor).collect()
      val used = scala.collection.mutable.Set.empty[String]
      val picks = Seq.newBuilder[(String, String, Long)]
      var taken = 0
      ranked.iterator.takeWhile(_ => taken < want).foreach { r =>
        val (l, rt, c) = (r.getString(0), r.getString(1), r.getLong(2))
        if (!used(l) && !used(rt)) {
          picks += ((l, rt, c))
          // the merge OUTPUT joins the exclusion set too: a later pick
          // whose l/r equals an earlier pick's concatenation would have
          // its occurrences rewritten mid-batch by the chained replace,
          // making its batch-start count stale (r15 advice)
          used += l; used += rt; used += l + rt; taken += 1
        }
      }
      val batch = picks.result()
      if (batch.isEmpty) exhausted = true
      else {
        batch.foreach { case (l, r, c) =>
          done += 1; merges += ((done, l, r, c))
        }
        val rewritten = batch.foldLeft(col("sym")) { case (acc, (l, r, _)) =>
          call_function("replace", acc, lit(s"<$l><$r>"), lit(s"<$l$r>"))
        }
        // r21: LAZY barrier — the rewrite materializes inside the NEXT
        // round's ranked job instead of as its own driver-synchronized
        // checkpoint job (one job per round instead of two, and the final
        // round's rewrite — which nothing consumes — never runs). The
        // checkpoint still truncates lineage on first use, so round N's
        // plan never embeds round N-1's subtree. Same frames, same merges.
        syms = syms.select(rewritten.as("sym"), col("freq")).stagedLazy
      }
      round += 1
    }
    import spark.implicits._
    merges.result().toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Above this merge count the replay switches from a literal-`replace`
    * expression chain to a closure UDF: a real vocabulary's 32k merges
    * as nested expressions would blow the generated-code constant pool
    * and method limits long before codegen could compile them. */
  private[pipeline] val MaxExprMerges = 64

  /** Apply an ordered merge list to tokenize text: words re-wrap to char
    * symbols, each merge replays in rank order, and the symbol sequences
    * come back as token arrays. `merges` is (left, right) in rank order —
    * the driver-bounded metadata [[train]] produces. Up to
    * [[MaxExprMerges]] merges the replay is a narrow chain of literal
    * `replace` projections (pure codegen, no shuffle); beyond that it is
    * ONE deterministic closure UDF over the word array (`String.replace`
    * has the same leftmost-non-overlapping literal semantics as the SQL
    * function, so both paths produce identical tokens — the expression
    * tree stays O(1) however large the vocabulary). */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
             merges: Seq[(String, String)]): DataFrame = {
    val words = filter(
      split(regexp_replace(lower(textCol), "[^a-z ]", ""), " "),
      w => w =!= "")
    val toks =
      if (merges.size <= MaxExprMerges) {
        def chain(c: Column): Column =
          merges.foldLeft(c) { case (acc, (l, r)) =>
            call_function("replace", acc, lit(s"<$l><$r>"), lit(s"<$l$r>"))
          }
        flatten(transform(words, w => {
          val sym = chain(concat(lit("<"), array_join(split(w, ""), "><"), lit(">")))
          split(sym.substr(lit(2), length(sym) - 2), "><")
        }))
      } else {
        val table = merges.map { case (l, r) => (s"<$l><$r>", s"<$l$r>") }.toArray
        val enc = udf { (ws: Seq[String]) =>
          ws.flatMap { w =>
            var s = "<" + w.split("").mkString("><") + ">"
            var i = 0
            while (i < table.length) {
              s = s.replace(table(i)._1, table(i)._2); i += 1
            }
            s.substring(1, s.length - 1).split("><").toSeq
          }
        }
        enc(words)
      }
    df.select(idCol.as("docId"), toks.as("tokens"))
  }
}
