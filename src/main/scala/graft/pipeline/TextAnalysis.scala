package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines — north-star
 * extension (BASELINE.json): language-ID, quality scoring, token counting,
 * document fingerprinting.
 *
 * All pure Catalyst string/array expressions — codegen'd, no UDF, no
 * shuffle (per-row projections). Counts are integers; ratios are one fixed
 * double division at the end, keeping results engine/partitioning-stable.
 */
object TextAnalysis {

  /** Non-overlapping occurrence count of literal `w` — portable
    * (length-difference trick, no regex dialect involved). */
  def occurrences(textCol: Column, w: String): Column =
    ((length(textCol) - length(replace(textCol, lit(w), lit("")))) / w.length).cast("long")

  /**
   * Language ID, n-gram/marker heuristic: score each candidate language by
   * marker-token occurrences; argmax with a fixed priority order on ties.
   * (Real pipelines plug in per-language char-trigram tables; the scoring
   * and argmax shape — a `when` chain over integer scores — is identical.)
   */
  def languageId(textCol: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scores = markers.map { case (lang, words) =>
      lang -> words.map(w => occurrences(textCol, " " + w + " ")).reduce(_ + _)
    }
    val maxScore = scores.map(_._2).reduce(greatest(_, _))
    // argmax via CASE chain — first-listed language wins ties
    scores.foldRight(lit("und")) { case ((lang, score), rest) =>
      when(score > 0 && score === maxScore, lang).otherwise(rest)
    }
  }

  /** Whitespace token count (empty text → 0). */
  def tokenCountWhitespace(textCol: Column): Column =
    when(length(trim(textCol)) === 0, 0L)
      .otherwise(size(split(trim(textCol), "\\s+")).cast("long"))

  /** BPE-ish token estimate: runs of letters, runs of digits, or single
    * non-space symbols (the common pre-tokenizer regex shape). */
  def tokenCountBpeIsh(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /**
   * Quality scoring: length, mean word length, stopword ratio, punctuation
   * ratio → a composite score. Integer counts; two double divisions with a
   * fixed shape.
   */
  def qualityFeatures(textCol: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val nChars = length(textCol).cast("long")
    val nWords = tokenCountWhitespace(textCol)
    val stopCount = stopwords.map(w => occurrences(textCol, " " + w + " ")).reduce(_ + _)
    val punctCount = (length(textCol) -
      length(regexp_replace(textCol, "[.,;:!?]", ""))).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "stop_count" -> stopCount,
      "punct_count" -> punctCount,
      "mean_word_len" ->
        when(nWords > 0, (nChars - (nWords - 1)).cast("double") / nWords).otherwise(0.0),
      "stop_ratio" ->
        when(nWords > 0, stopCount.cast("double") / nWords).otherwise(0.0))
  }

  /**
   * Document fingerprint (winnowing-style): the minimum md5 over word
   * 5-gram shingles — robust to local edits, engine-portable (hex-string
   * min), O(tokens) per doc with no shuffle. A second fingerprint over
   * even-indexed shingles gives a cheap 2-band sketch.
   */
  def fingerprint(textCol: Column, n: Int = 5): Column =
    array_min(transform(Dedup.shingles(textCol, n), s => md5(s)))

  def fingerprintBand(textCol: Column, n: Int = 5, band: Int = 2): Column =
    array_min(filter(
      transform(Dedup.shingles(textCol, n), s => md5(s)),
      (h) => (instr(lit("0123456789abcdef"), substring(h, 1, 1)) - 1) % band === 0))
}
