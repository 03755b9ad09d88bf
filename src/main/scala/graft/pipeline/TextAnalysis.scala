package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
   * Gopher document-quality rules — the published web-corpus document
   * filter (Rae et al. 2021, "Scaling Language Models: Methods, Analysis
   * & Insights from Training Gopher", Appendix A; reused by MassiveText
   * and the Dolma pipeline). Per document:
   *  - word count within [minWords, maxWords] (published: 50..100,000)
   *  - mean word length within [3, 10]
   *  - symbol-to-word ratio ('#' or '...') at most 0.1
   *  - at most 90% of lines start with a bullet ('-', '*', '•')
   *  - at most 30% of lines end with an ellipsis
   *  - at least 80% of words contain an alphabetic character
   *  - at least 2 of the 8 English stop words
   *    (the, be, to, of, and, that, have, with) present
   * Returns the measured columns, per-rule flags folded into the single
   * conjunctive `keep` decision. Pure codegen'd arithmetic over the text
   * column — map-side at any scale, no shuffle, oracle-recomputable.
   */
  def gopherRules(textCol: Column, minWords: Long = 50,
                  maxWords: Long = 100000,
                  minStopHits: Int = 2): Seq[(String, Column)] = {
    val nWords = tokenCountWhitespace(textCol)
    val nChars = length(textCol).cast("long")
    val meanWordLen = when(nWords > 0,
      (nChars - (nWords - 1)).cast("double") / nWords).otherwise(0.0)
    val symbolRatio = when(nWords > 0,
      (occurrences(textCol, "#") + occurrences(textCol, "..."))
        .cast("double") / nWords).otherwise(0.0)
    val lines = split(textCol, "\n")
    val nLines = size(lines).cast("long") // split never yields 0 elements
    val bulletFrac = size(filter(lines,
      l => trim(l).rlike("^[-*•]"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => l.endsWith("..."))).cast("double") / nLines
    val alphaFrac = when(nWords > 0,
      size(filter(split(trim(textCol), "\\s+"), w => w.rlike("[A-Za-z]")))
        .cast("double") / nWords).otherwise(0.0)
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => when(concat(lit(" "), textCol, lit(" "))
        .contains(" " + w + " "), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val keep = nWords >= minWords && nWords <= maxWords &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= minStopHits
    Seq(
      "words_n" -> nWords,
      "mean_word_len" -> meanWordLen,
      "symbol_ratio" -> symbolRatio,
      "bullet_frac" -> bulletFrac,
      "ellipsis_frac" -> ellipsisFrac,
      "alpha_frac" -> alphaFrac,
      "stop_hits" -> stopHits,
      "keep" -> keep)
  }

  /**
   * TF-IDF top-k terms per document — corpus vocabulary statistics for
   * filter/feature engineering, using the standard smooth-idf formula
   * idf = ln((1+N)/(1+df)) + 1 (the scikit-learn default, published).
   *
   * 100 TB shapes: one explode feeding a per-(doc,term) Tungsten hash-agg
   * (map-side partial combine — the shuffle carries term counts, not
   * tokens), a term-keyed hash-agg for document frequency, a shuffle join
   * on term (both sides term-partitioned, no broadcast of the vocabulary),
   * the corpus size as ONE broadcast scalar, and the per-doc top-k through
   * a docId-partitioned window (keys = documents, no global sort). The
   * score is rounded to 6 digits BEFORE ranking so rank ties break
   * identically on any engine.
   */
  def tfIdfTopTerms(df: DataFrame, idCol: Column, textCol: Column,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(idCol.as("docId"),
      explode(split(trim(textCol), "\\s+")).as("term"))
    val tf = toks.groupBy("docId", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(idCol).as("n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n") + 1).cast("double") / (col("df") + 1)) + 1), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("docId"))
          .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("docId"), col("rank"), col("term"), col("tfidf"),
        col("tf"), col("df"))
  }

  /**
   * C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
   * Transfer Learning..." §2.2 — the public C4 web-corpus pipeline; the
   * word blocklist is a deployment parameter and omitted here):
   *  - keep only lines ending in a terminal punctuation mark (. ! ? ")
   *  - keep only lines with at least `minLineWords` (3) words
   *  - drop lines containing the word "javascript" (case-insensitive)
   *  - after line filtering, drop the whole page when it has fewer than
   *    `minSentences` (5) sentences, contains the phrase "lorem ipsum"
   *    (case-insensitive), or contains a curly brace '{'
   * Returns the cleaned text (kept lines re-joined), the kept-line and
   * sentence counts, and the page keep decision. Pure codegen'd per-row
   * arithmetic — map-side at any scale, oracle-recomputable.
   */
  def c4Clean(textCol: Column, minLineWords: Int = 3,
              minSentences: Int = 5): Seq[(String, Column)] = {
    val lines = split(textCol, "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    val cleaned = array_join(kept, "\n")
    val sentences = (length(cleaned) -
      length(regexp_replace(cleaned, "[.!?]", ""))).cast("long")
    val keep = sentences >= minSentences &&
      !lower(textCol).contains("lorem ipsum") && !textCol.contains("{")
    Seq(
      "cleaned" -> cleaned,
      "kept_lines" -> size(kept).cast("long"),
      "sentences" -> sentences,
      "keep" -> keep)
  }

  /**
   * C4 bad-words page filter (Raffel et al. 2020, "Exploring the Limits of
   * Transfer Learning…", §2.2): drop any page containing a word from a
   * block list ("List of Dirty, Naughty, Obscene or Otherwise Bad Words"
   * in the paper — the list is a PARAMETER here; deployments supply their
   * own). Matching is case-insensitive on word boundaries: the text is
   * lowered, every non-alphanumeric run is collapsed to a single space,
   * and each list word is counted by exact token equality over the split
   * (NOT the [[occurrences]] length-difference trick, which undercounts
   * adjacent repeats — a hit COUNT should be exact since removal-rate
   * reports aggregate it). Returns the per-page total hit count, the
   * first list word present (list order — the audit column real filters
   * log), and the keep decision. One projection, map-side at any scale;
   * cost is O(tokens·|words|) per page, which is why production lists are
   * applied AFTER cheaper gates (the curation-funnel ordering) —
   * composable here the same way.
   */
  def c4BadWords(textCol: Column, words: Seq[String]): Seq[(String, Column)] = {
    require(words.nonEmpty, "bad-word filter needs a non-empty list")
    // NULL text coalesces to empty (r16 review): a gate must be TOTAL —
    // NULL would propagate into keep and a downstream filter(keep) would
    // silently drop a page that contains no bad words at all
    val toks = split(trim(regexp_replace(lower(coalesce(textCol, lit(""))),
      "[^a-z0-9]+", " ")), " ")
    val counts = words.map(w =>
      size(filter(toks, t => t === lit(w.toLowerCase))).cast("long"))
    val total = counts.reduce(_ + _)
    val first = words.zip(counts).foldRight(lit(null).cast("string")) {
      case ((w, c), rest) => when(c > 0, lit(w)).otherwise(rest)
    }
    Seq(
      "bad_hits" -> total,
      "first_bad" -> first,
      "keep" -> (total === 0L))
  }

  /**
   * RefinedWeb line-wise corrections (Penedo et al. 2023, "The RefinedWeb
   * Dataset for Falcon LLM", arXiv:2306.01116 App. G.2) — the filter
   * family between C4's line rules and Gopher's doc rules: remove lines
   * that (1) are mainly uppercase (uppercase letters ≥ `upperFrac` of
   * the line's letters — the "mainly composed of uppercase characters"
   * rule made precise), (2) consist only of digits, (3) are social
   * counters ("3 likes"), or (4) contain a single word; then, per the
   * paper, if the corrections remove more than `maxRemovedFrac` of the
   * document's length, drop the whole document. Pure per-row
   * projections — no shuffle, no UDF, linear in corpus chars.
   */
  def refinedWebLineCorrections(textCol: Column, upperFrac: Double = 0.6,
                                maxRemovedFrac: Double = 0.05): Seq[(String, Column)] = {
    val lines = split(textCol, "\n")
    def bad(l: Column): Column = {
      val t = trim(l)
      val letc = length(regexp_replace(t, "[^A-Za-z]", ""))
      val upc = length(regexp_replace(t, "[^A-Z]", ""))
      (letc > 0 &&
        upc.cast("double") >= lit(upperFrac) * letc.cast("double")) ||
        t.rlike("^[0-9]+$") ||
        t.rlike("^[0-9]+ (likes?|views?|comments?|shares?|retweets?|upvotes?)$") ||
        (length(t) > 0 && !t.rlike("\\s"))
    }
    val kept = filter(lines, l => !bad(l))
    val cleaned = array_join(kept, "\n")
    val removed = (length(textCol) - length(cleaned)).cast("long")
    Seq(
      "cleaned" -> cleaned,
      "kept_lines" -> size(kept).cast("long"),
      "removed_chars" -> removed,
      "keep" -> (removed.cast("double") <=
        lit(maxRemovedFrac) * length(textCol).cast("double")))
  }

  /**
   * FineWeb custom heuristic filters (Penedo et al. 2024, "The FineWeb
   * Datasets: Decanting the Web for the Finest Text Data at Scale",
   * arXiv:2406.17557 §3.6): the three line-level rules FineWeb ablated
   * as its own contribution beyond C4/Gopher — drop a document when
   *
   *   - the fraction of lines ending in punctuation is ≤ `minPunctFrac`
   *     (published 0.12),
   *   - the fraction of characters inside DUPLICATED lines (2nd+
   *     occurrence, by position) is ≥ `maxDupCharFrac` (published 0.1),
   *   - the fraction of lines shorter than `shortLineLen` chars
   *     (published 30) is ≥ `maxShortFrac` (published 0.67).
   *
   * Pure per-row array arithmetic (the c4Clean class) — rides the scan
   * with no shuffle at any scale. The duplicate-line scan is O(lines²)
   * per document inside one codegen'd expression; for pathological
   * million-line documents the grouped formulation ([[gopherRepetition]]'s
   * line explode) is the escape hatch — web documents sit far below
   * that, and the explode costs a corpus-scale shuffle this avoids.
   */
  def fineWebFilters(textCol: Column, minPunctFrac: Double = 0.12,
                     maxDupCharFrac: Double = 0.1, shortLineLen: Int = 30,
                     maxShortFrac: Double = 0.67): Seq[(String, Column)] = {
    val lines = split(textCol, "\n")
    val n = size(lines)
    val punct = size(filter(lines, l => l.rlike("[.!?\"]$")))
    val short = size(filter(lines, l => length(l) < shortLineLen))
    val dupChars = aggregate(
      transform(lines, (l, i) =>
        when(exists(slice(lines, lit(1), i), p => p === l),
          length(l).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val totChars = aggregate(
      transform(lines, l => length(l).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val pf = punct.cast("double") / n.cast("double")
    val sf = short.cast("double") / n.cast("double")
    val df = when(totChars > 0, dupChars.cast("double") / totChars.cast("double"))
      .otherwise(lit(0.0))
    Seq(
      "n_lines" -> n.cast("long"),
      "punct_frac" -> pf,
      "short_frac" -> sf,
      "dup_char_frac" -> df,
      "keep" -> (pf > minPunctFrac && df < maxDupCharFrac && sf < maxShortFrac))
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

  /**
   * HTML → text extraction — the first stage of every web-corpus pipeline
   * (C4/CCNet consume pre-extracted WET; RefinedWeb/FineWeb re-extract
   * from WARC precisely because extraction quality dominates downstream
   * filters). This is the regex-core extractor: drop <script>/<style>
   * blocks and comments wholesale, strip remaining tags to spaces, decode
   * the basic named entities (&lt; &gt; &quot; &#39; &apos; &nbsp;, with
   * &amp; LAST — the standard order so "&amp;lt;" decodes to the literal
   * "&lt;", not "<"), and collapse whitespace. One codegen'd per-row
   * projection, map-side at any scale; both regex dialects used are in
   * the RE2-safe subset (inline (?is), lazy .*?, no backreferences) so a
   * SQL oracle replays it verbatim. The FULL entity table lives in
   * el/HtmlEntities for flow-level unescape; this keeps the hot corpus
   * path to the six entities that dominate real markup. A DOM-fidelity
   * extractor (trafilatura-class boilerplate removal) is model-assisted
   * territory, out of engine scope — the plumbing here is the stage
   * real deployments slot theirs into.
   */
  def htmlToText(htmlCol: Column): Column = {
    val noScript = regexp_replace(htmlCol, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val amp = replace(named, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /**
   * Positional winnowing (Schleimer, Wilkerson, Aiken 2003, "Winnowing:
   * Local Algorithms for Document Fingerprinting", SIGMOD — the MOSS
   * algorithm): hash every word k-gram, slide a window of `w` consecutive
   * hashes, and select each window's MINIMUM (rightmost occurrence on
   * ties — the paper's rule, maximizing selection overlap between
   * adjacent windows). The selected (hash, position) set is the
   * fingerprint, with the paper's guarantee: any shared run of at least
   * w+k-1 words between two documents shares at least one fingerprint —
   * the LOCAL matching property the global-min [[fingerprint]] lacks.
   *
   * Determinism device: the rightmost-argmin is ONE window min over the
   * combined key h·2³¹ − pos (lexicographic (h, −pos); h is the 32-bit
   * md5 prefix so the product stays under 2⁶³), recovered as
   * pos = h_min·2³¹ − v_min — no nested window, portable to any SQL
   * engine. Docs shorter than w+k−1 words have no full window and emit
   * nothing (they are below the guarantee's match length by definition).
   *
   * Scale shape: one shuffle keyed on the doc id; the two window passes
   * ride the same per-doc sort by position, bounded by the longest
   * document (the repetitionFeatures envelope). Fingerprint density is
   * ~2/(w+1) of tokens (the paper's expectation), so the output is a
   * bounded fraction of the corpus and downstream overlap joins key on
   * the fingerprint hash exactly like shingle joins.
   */
  def winnowing(df: DataFrame, idCol: Column, textCol: Column,
                k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "winnowing needs positive k-gram size and window")
    import org.apache.spark.sql.expressions.Window
    val M = 1L << 31
    val sh = df.select(idCol.as("docId"),
      posexplode(Dedup.shingles(textCol, k)).as(Seq("pos", "sh")))
    val h32 = conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long")
    val hashed = sh.select(col("docId"), col("pos").cast("long").as("pos"),
      h32.as("h"))
    val win = Window.partitionBy(col("docId")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    hashed
      .withColumn("wmin", min(col("h")).over(win))
      .withColumn("vmin", min(col("h") * M - col("pos")).over(win))
      .withColumn("nsh", count(lit(1)).over(Window.partitionBy(col("docId"))))
      .filter(col("pos") <= col("nsh") - w)
      .select(col("docId"), col("wmin").as("fp"),
        (col("wmin") * M - col("vmin")).as("fpPos"))
      .distinct()
  }

  /**
   * Winnowing overlap pairs — MOSS's matching half: documents sharing at
   * least `minShared` winnowing fingerprints are local-overlap candidates
   * (each shared fp witnesses a shared run of ≥ k words; `minShared` > 1
   * demands multiple independent witnesses). The join keys on the
   * fingerprint hash with the same two guards as the shingle joins: a
   * document-frequency cap drops fps present in more than `dfCap` docs
   * (boilerplate runs — quadratic join mass, near-zero match signal)
   * BEFORE the self-join, and the pair count aggregates map-side.
   * Positions are deliberately dropped first (`winnowing` emits one row
   * per (fp, pos); overlap needs each fp once per doc).
   */
  def winnowOverlapPairs(df: DataFrame, idCol: Column, textCol: Column,
                         k: Int = 5, w: Int = 4, minShared: Int = 2,
                         dfCap: Int = 64): DataFrame = {
    require(minShared >= 1 && dfCap >= 1, "winnowOverlap needs positive bounds")
    val fps = winnowing(df, idCol, textCol, k, w)
      .select(col("docId"), col("fp")).distinct()
    val keep = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("dfc")).filter(col("dfc") <= dfCap)
      .select(col("fp"))
    val capped = fps.join(keep, "fp")
    capped.select(col("fp"), col("docId").as("idA"))
      .join(capped.select(col("fp"), col("docId").as("idB")), "fp")
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"))
      .agg(count(lit(1)).as("sharedFps"))
      .filter(col("sharedFps") >= minShared)
  }

  /**
   * Intra-document repetition (the C4/Gopher-family filters: duplicated
   * lines / most-common n-gram share / duplicated n-gram fraction —
   * published web-corpus quality heuristics). Per (doc, n): total grams,
   * distinct grams, the top gram's occurrence count, and the number of
   * occurrences belonging to grams seen 2+ times; callers derive
   * `top_frac`/`dup_frac` and threshold.
   *
   * Shape: explode + two hash-aggregates — both partial-agg map-side, keys
   * are (doc, gram) then doc, so no skew hotter than the document itself;
   * no window, no self-join. ~2 shuffles at any scale.
   */
  def repetitionFeatures(df: DataFrame, idCol: Column, textCol: Column,
                         n: Int): DataFrame = {
    val grams = df.select(idCol.as("docId"),
      explode(Dedup.shingles(textCol, n)).as("g"))
    grams.groupBy(col("docId"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("docId")).agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max(col("c")).as("top_gram_count"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_gram_occurrences"))
  }

  /** Per-n thresholds of the published repetition table (Rae et al. 2021,
    * Appendix A, Table A1): remove the document when the fraction of
    * characters in the TOP n-gram (n=2..4) or in DUPLICATED n-grams
    * (n=5..10) exceeds the limit. */
  val GopherTopGramLimits: Map[Int, Double] =
    Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val GopherDupGramLimits: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /**
   * Gopher repetition rules — the published repetition half of the Gopher
   * document filter (Rae et al. 2021, Appendix A, Table A1; the quality
   * half is [[gopherRules]]). Per document:
   *  - fraction of duplicate lines ≤ 0.30 (all occurrences in duplicated
   *    groups over total lines)
   *  - fraction of characters in duplicate lines ≤ 0.20
   *  - fraction of characters in the most frequent {2,3,4}-gram
   *    ≤ {0.20, 0.18, 0.16} (zero when the top gram occurs once; ties
   *    break on the lexicographically smallest gram)
   *  - fraction of characters in duplicated {5..10}-grams
   *    ≤ {0.15, 0.14, 0.13, 0.12, 0.11, 0.10} (sum of len(gram)·count over
   *    grams occurring more than once — counts every occurrence, the
   *    common reimplementation of the paper's position-marking variant,
   *    which never under-flags)
   * The paper's duplicate-paragraph rules are this same machinery with a
   * blank-line splitter; on documents without paragraph structure they
   * coincide with the line rules.
   *
   * All fractions are rounded to 6 decimals BEFORE thresholding so the
   * keep decision is engine-portable. 100 TB shape: one line explode and
   * one tagged gram explode, each feeding (doc, key)-keyed partial
   * hash-aggs; the only window partitions by (doc, n) — nothing hotter
   * than one document anywhere, no self-join, no global sort.
   */
  def gopherRepetition(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(idCol.as("docId"), textCol.as("t"),
      length(textCol).cast("long").as("nChars"))
    // line plane
    val lc = base.select(col("docId"), explode(split(col("t"), "\n")).as("line"))
      .groupBy("docId", "line").agg(count(lit(1)).as("c"))
    val lineChars = sum(length(col("line")).cast("long") * col("c"))
    val dupLineChars = sum(when(col("c") > 1,
      length(col("line")).cast("long") * col("c")).otherwise(0L))
    val lf = lc.groupBy("docId").agg(
      round(sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("double") /
        sum(col("c")), 6).as("dup_line_frac"),
      round(when(lineChars === 0, 0.0)
        .otherwise(dupLineChars.cast("double") / lineChars), 6)
        .as("dup_line_char_frac"))
    // gram plane: one explode of (n, gram) for n = 2..10
    val tagged = base.select(col("docId"),
      explode(concat((2 to 10).map(n =>
        transform(Dedup.shingles(col("t"), n),
          g => struct(lit(n).as("n"), g.as("g")))): _*)).as("x"))
      .select(col("docId"), col("x.n").as("n"), col("x.g").as("g"))
    val gc = tagged.groupBy("docId", "n", "g").agg(count(lit(1)).as("c"))
    val top = gc.filter(col("n").between(2, 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy("docId", "n").orderBy(col("c").desc, col("g").asc)))
      .filter(col("rk") === 1)
      .select(col("docId"), col("n"),
        when(col("c") > 1, length(col("g")).cast("long") * col("c"))
          .otherwise(0L).as("chars"))
    val dup = gc.filter(col("n").between(5, 10))
      .groupBy("docId", "n")
      .agg(sum(when(col("c") > 1, length(col("g")).cast("long") * col("c"))
        .otherwise(0L)).as("chars"))
    val pivotAggs = (2 to 10).map(n =>
      max(when(col("n") === n, col("chars"))).as(s"chars$n"))
    val feat = top.unionByName(dup).groupBy("docId")
      .agg(pivotAggs.head, pivotAggs.tail: _*)
    def frac(chars: Column, nChars: Column): Column =
      round(when(nChars > 0, chars.cast("double") / nChars).otherwise(0.0), 6)
    val joined = base.select("docId", "nChars")
      .join(lf, "docId").join(feat, "docId")
    val fracCols = (2 to 10).map(n =>
      frac(col(s"chars$n"), col("nChars")).as(
        if (n <= 4) s"top_${n}gram_char_frac" else s"dup_${n}gram_char_frac"))
    val withFracs = joined.select(
      Seq(col("docId"), col("dup_line_frac"), col("dup_line_char_frac")) ++
        fracCols: _*)
    val keep = col("dup_line_frac") <= 0.30 &&
      col("dup_line_char_frac") <= 0.20 &&
      GopherTopGramLimits.toSeq.sortBy(_._1).map { case (n, lim) =>
        col(s"top_${n}gram_char_frac") <= lim }.reduce(_ && _) &&
      GopherDupGramLimits.toSeq.sortBy(_._1).map { case (n, lim) =>
        col(s"dup_${n}gram_char_frac") <= lim }.reduce(_ && _)
    withFracs.withColumn("rep_keep", keep)
  }

  /** PII patterns shared by redaction and counting — the common RE2/Java
    * regex subset so any engine computes identical results. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  /**
   * PII redaction for training-data pipelines: emails → [EMAIL], IPv4 →
   * [IP], phone-shaped digits → [PHONE]. Email first (its local part may
   * contain digits/dots that the narrower patterns would otherwise bite
   * into). Pure regexp_replace chain — codegen'd, no UDF.
   */
  def redactPii(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  def piiCounts(textCol: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(textCol, lit(EmailRe), lit(0))).cast("long"),
    "n_ips" -> size(regexp_extract_all(textCol, lit(Ipv4Re), lit(0))).cast("long"),
    "n_phones" -> size(regexp_extract_all(textCol, lit(PhoneRe), lit(0))).cast("long"))

  /** Unicode NFC canonical composition (UAX #15) — the first stage of the
    * SlimPajama recipe (Soboleva 2023). Native codegen'd expression with a
    * zero-copy ASCII fast path ([[graft.functions.NfcNormalize]]); DuckDB's
    * `nfc_normalize` replays it byte-exactly. */
  def nfc(textCol: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(graft.functions.NfcNormalize(
      org.apache.spark.sql.GraftColumnShim.expression(textCol)))

  /** SlimPajama's dedup-key preprocessing (Soboleva 2023: lowercase +
    * punctuation strip before 13-gram MinHash): keep `[a-z0-9]` and
    * spaces, drop everything else. The removal COLLAPSES (no space
    * substitution), matching the published preprocessing's behavior of
    * hashing over the cleaned byte stream. */
  def slimPajamaDedupText(textCol: Column): Column =
    regexp_replace(lower(textCol), "[^a-z0-9 ]", "")

  /**
   * RedPajama-v2 quality signals (Together AI, RedPajama-Data-v2;
   * Weber et al. 2024, arXiv:2411.12372 §3.2): v2's contribution is
   * shipping per-document quality SIGNALS rather than filter verdicts —
   * a wide measurement frame downstream consumers threshold themselves
   * (the C4/Gopher/ccnet rule INPUTS, precomputed once at corpus scale).
   *
   * A representative doc-level subset with the published signal
   * semantics over the house whitespace tokenization (`\s+` on the
   * trimmed page; line = `\n` split). All counts are integers; every
   * fraction is emitted in integer micro-units via ONE double division
   * rounded HALF_UP — order-independent and engine-exact (DuckDB's
   * `round()` is half-away-from-zero = HALF_UP on these non-negative
   * values). Pure codegen'd per-row projection — map-side at any scale,
   * no shuffle; the one corpus-shuffle signal (unigram entropy) lives in
   * [[unigramEntropyMicro]].
   */
  def rpv2Signals(pageCol: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    def micro(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double") * 1e6, 0))
        .otherwise(0d).cast("long")
    val nChars = length(pageCol).cast("long")
    val lines = split(pageCol, "\n")
    val nLines = size(lines).cast("long")
    val ws = split(trim(pageCol), "\\s+")
    val nWords = tokenCountWhitespace(pageCol)
    val spaced = concat(lit(" "), regexp_replace(pageCol, "\n", " "), lit(" "))
    val stopCount = stopwords.map(w => occurrences(spaced, " " + w + " "))
      .reduce(_ + _)
    val ellipsisN = ((length(pageCol) -
      length(replace(pageCol, lit("..."), lit("")))) / 3).cast("long")
    Seq(
      "ccnet_length" -> nChars,
      "ccnet_nlines" -> nLines,
      // terminator-RUN count ([.!?]+): "..." ends ONE sentence
      "num_sentences" ->
        size(regexp_extract_all(pageCol, lit("[.!?]+"), lit(0))).cast("long"),
      "word_count" -> nWords,
      "mean_word_len_micro" -> micro(nChars - (nWords - 1), nWords),
      "stop_frac_micro" -> micro(stopCount, nWords),
      "uniq_frac_micro" -> micro(size(array_distinct(ws)).cast("long"), nWords),
      "all_caps_frac_micro" -> micro(
        size(filter(ws, w => w.rlike("[A-Za-z]") && w === upper(w))).cast("long"),
        nWords),
      "no_alph_frac_micro" -> micro(
        size(filter(ws, w => !w.rlike("[A-Za-z]"))).cast("long"), nWords),
      "lorem_ipsum_n" -> occurrences(lower(pageCol), "lorem ipsum"),
      "symbol_ratio_micro" -> micro(occurrences(pageCol, "#") + ellipsisN, nWords),
      "curly_frac_micro" -> micro(
        (length(pageCol) - length(translate(pageCol, "{}", ""))).cast("long"),
        nChars),
      "ellipsis_line_frac_micro" -> micro(
        size(filter(lines, l => l.endsWith("..."))).cast("long"), nLines))
  }

  /**
   * Per-document unigram entropy in integer micro-nats — the one
   * RedPajama-v2 signal needing a corpus shuffle (the doc's word
   * histogram): H = ln n − (Σ c·ln c)/n over unigram counts c.
   *
   * Determinism: each ln rounds to integer micro-nats BEFORE the sums
   * (the [[Perplexity]] discipline) so every aggregate is over longs —
   * order-independent — and the final division truncates (`div`).
   * Engine parity of `round(ln(k)·1e6)` verified Java vs DuckDB over
   * k ≤ 2·10⁶ (0 mismatches on a 20k-point sweep; both libms agree to
   * well under the half-micro-nat rounding slack).
   *
   * Scale shape: explode → (doc,word) Tungsten hash-agg with map-side
   * partial combine (the shuffle carries histogram rows, not tokens) →
   * doc-keyed agg. No driver state, no windows.
   */
  def unigramEntropyMicro(df: DataFrame, idCol: Column,
                          pageCol: Column): DataFrame = {
    val lnMicro = (c: Column) => round(log(c.cast("double")) * 1e6, 0).cast("long")
    df.select(idCol.as("docId"),
        explode(split(trim(pageCol), "\\s+")).as("w"))
      .groupBy(col("docId"), col("w"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cln", col("c") * lnMicro(col("c")))
      .groupBy(col("docId"))
      .agg((lnMicro(sum(col("c"))) -
        expr("sum(cln) div sum(c)")).as("entropy_micro"),
        sum(col("c")).as("n_tokens"))
  }
}
