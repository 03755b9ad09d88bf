package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  private def adjacentPairs(syms: DataFrame): DataFrame =
    syms.select(col("freq"),
        split(expr("substring(sym, 2, length(sym) - 2)"), "><").as("s"))
      .select(col("freq"), explode(expr(
        // sequence(1, 0) DESCENDS in Spark — guard the single-symbol word
        "transform(if(size(s) > 1, sequence(1, size(s) - 1), " +
          "array()), " +
          "j -> struct(element_at(s, j) AS l, element_at(s, j + 1) AS r))"))
        .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))

  /** The learned merge table: (rank, left_sym, right_sym, pair_count) for
    * the nMerges most frequent adjacent symbol pairs, each applied to the
    * vocabulary before the next is counted. */
  def train(df: DataFrame, textCol: Column, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    var syms = wordTable(df, textCol)
      .select(wrap(col("word")).as("sym"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 0 until nMerges) {
      val best = adjacentPairs(syms)
        .groupBy("l", "r").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((i + 1, l, r, c))
        syms = syms.select(
          expr(s"replace(sym, '<$l><$r>', '<$l$r>')").as("sym"), col("freq"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Apply an ordered merge list to tokenize text: words re-wrap to char
    * symbols, each merge replays in rank order (a narrow chain of literal
    * `replace` projections — pure codegen, no shuffle), and the symbol
    * sequences come back as token arrays. `merges` is (left, right) in
    * rank order — the driver-bounded metadata [[train]] produces. */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
             merges: Seq[(String, String)]): DataFrame = {
    def chain(c: Column): Column =
      merges.foldLeft(c) { case (acc, (l, r)) =>
        call_function("replace", acc, lit(s"<$l><$r>"), lit(s"<$l$r>"))
      }
    val words = filter(
      split(regexp_replace(lower(textCol), "[^a-z ]", ""), " "),
      w => w =!= "")
    val toks = flatten(transform(words, w => {
      val sym = chain(concat(lit("<"), array_join(split(w, ""), "><"), lit(">")))
      split(sym.substr(lit(2), length(sym) - 2), "><")
    }))
    df.select(idCol.as("docId"), toks.as("tokens"))
  }
}
