package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training-data pipelines: flag corpus
 * documents that share any word n-gram with an evaluation/benchmark set
 * (the published 13-gram overlap filter family; `n` is a parameter — the
 * small-vocabulary test fixture uses 5).
 *
 * Scale shape: the benchmark set is tiny relative to a 100 TB corpus, so
 * its distinct gram set is broadcast; corpus grams stream map-side through
 * the broadcast hash join (per-doc grams are `array_distinct`'d before the
 * explode so a doc repeating a contaminated gram counts it once), and the
 * only shuffle is the final docId aggregation — partial map-side, key
 * cardinality = contaminated docs only.
 */
object Decontaminate {

  /** Per contaminated corpus doc: the count of distinct benchmark n-grams
    * it contains. Clean docs are absent (anti-join the result to drop
    * contaminated docs from the corpus). */
  def contaminated(corpus: DataFrame, idCol: Column, textCol: Column,
                   bench: DataFrame, benchTextCol: Column,
                   n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(benchTextCol, n)).as("gram"))
      .distinct()
    corpus
      .select(idCol.as("docId"),
        explode(array_distinct(Dedup.shingles(textCol, n))).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("nOverlaps"))
  }

  /**
   * Bloom-filter variant for the scale regime where even the DISTINCT
   * benchmark gram set is too wide to broadcast as a hash table: the
   * grams fold into ONE Spark-native bloom filter (`bloom_filter_agg`, a
   * few MB at fpp 1e-6 for millions of grams), the corpus probes it
   * map-side with `might_contain` — no join at all on the corpus side.
   * Bloom semantics: NO false negatives (every truly contaminated doc is
   * flagged — the safety direction for decontamination), rare false
   * positives over-flag at the configured fpp (they only cost extra
   * removed docs, never leaked benchmark data). `nOverlaps` counts
   * distinct PROBE hits, so it can exceed the exact count only via those
   * false positives.
   */
  def contaminatedBloom(corpus: DataFrame, idCol: Column, textCol: Column,
                        bench: DataFrame, benchTextCol: Column, n: Int,
                        expectedGrams: Long = 1000000L,
                        fpp: Double = 0.000001): DataFrame = {
    // standard bloom sizing: bits = -n·ln(p)/ln²2. The bloom agg/probe
    // expressions are Catalyst-internal (Spark uses them for runtime
    // row-level filters; not in the SQL registry) — reached through the
    // same shim as graft's own native expressions.
    import org.apache.spark.sql.GraftColumnShim.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = math.ceil(
      -expectedGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloomAgg = column(new BloomFilterAggregate(
      expression(xxhash64(col("gram"))),
      expression(lit(expectedGrams)),
      expression(lit(numBits))).toAggregateExpression())
    // the aggregated filter BYTES come to the driver once and embed as a
    // literal — `might_contain` requires a constant filter, and this is
    // exactly how Spark's own injected runtime filters ship; the size is
    // numBits/8 (configuration-bounded, ~1.7 MB at 1M grams / 1e-6 fpp),
    // never data-proportional
    val bfBytes = bench
      .select(explode(Dedup.shingles(benchTextCol, n)).as("gram"))
      .agg(bloomAgg.as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    // empty benchmark frame → null filter blob; the sensible result is
    // "no contamination", not a NullType literal feeding might_contain
    if (bfBytes == null)
      return corpus.sparkSession.createDataFrame(
        corpus.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("docId",
            corpus.select(idCol).schema.head.dataType),
          org.apache.spark.sql.types.StructField("nOverlaps",
            org.apache.spark.sql.types.LongType, nullable = false))))
    corpus
      .select(idCol.as("docId"),
        explode(array_distinct(Dedup.shingles(textCol, n))).as("gram"))
      .filter(column(BloomFilterMightContain(
        expression(lit(bfBytes)), expression(xxhash64(col("gram"))))))
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("nOverlaps"))
  }

  /**
   * Span-level decontamination (Brown et al. 2020, "Language Models are
   * Few-Shot Learners", arXiv:2005.14165, Appendix C): instead of
   * dropping every document that shares an n-gram with the benchmark
   * set, REMOVE a window around each matched n-gram and keep the rest —
   * the paper cuts the colliding 13-gram plus 200 characters each side,
   * splits the document at the removed spans, discards pieces shorter
   * than 200 characters, and removes outright any document that
   * splinters into more than 10 pieces. This formulation applies the
   * same rule at WORD granularity (`padWords` each side of the matched
   * n-gram, `minPieceWords` minimum piece, `maxPieces` splinter cap),
   * which keeps every boundary exact under the whitespace tokenization
   * the rest of the pipeline uses.
   *
   * Returns (docId, nMatches, nPieces, action, text): action `clean`
   * (no matches — text untouched), `split` (matched spans cut, the
   * surviving ≥minPieceWords pieces re-joined), or `removed` (no piece
   * survived, or more than `maxPieces` did — text empty).
   *
   * Scale shape: the benchmark gram set broadcasts (or swap in the
   * bloom plane for the regime beyond broadcast); the corpus window
   * explode is linear and map-side; matched positions MERGE into
   * disjoint removal intervals via the gaps-and-islands pass
   * ([[Dedup.dedupSubstrings]]'s device — two matches at positions
   * p ≤ q merge iff q − p < n + 2·pad), so the per-doc span list is a
   * sliver; piece extraction is a pure per-row array expression. ONE
   * shuffle beyond the match join: the per-doc span gather. Only docs
   * with ≥ n tokens have windows; the benchmark side likewise uses only
   * true n-grams (sub-n-gram texts cannot collide, matching the
   * paper's fixed-n rule).
   */
  def decontaminateSpans(corpus: DataFrame, idCol: Column, textCol: Column,
                         bench: DataFrame, benchTextCol: Column, n: Int,
                         padWords: Int, minPieceWords: Int,
                         maxPieces: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val benchGrams = bench
      .filter(size(split(benchTextCol, " ")) >= n)
      .select(explode(Dedup.shingles(benchTextCol, n)).as("gram"))
      .distinct()
    val base = corpus.select(idCol.as("docId"), textCol.as("text"),
      split(textCol, " ").as("toks"))
    val matches = base
      .select(col("docId"),
        posexplode(when(size(col("toks")) >= n, Dedup.shingles(col("text"), n))
          .otherwise(array().cast("array<string>"))).as(Seq("pos", "win")))
      .join(broadcast(benchGrams), col("win") === col("gram"))
      .select(col("docId"), col("pos"))
    val byDoc = Window.partitionBy("docId").orderBy("pos")
    val spans = matches
      .withColumn("newIsland",
        when(col("pos") - coalesce(lag(col("pos"), 1).over(byDoc),
          lit(-(n + 2 * padWords + 1))) >= n + 2 * padWords, 1).otherwise(0))
      .withColumn("island", sum(col("newIsland")).over(byDoc))
      .groupBy("docId", "island")
      .agg(greatest(min(col("pos")) - padWords, lit(0)).as("s"),
        (max(col("pos")) + n + padWords).as("e"),
        count(lit(1)).as("cnt"))
      .groupBy("docId")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"),
        sum(col("cnt")).as("nMatches"))
    val joined = base.join(spans, Seq("docId"), "left")
      .withColumn("nMatches", coalesce(col("nMatches"), lit(0L)))
      .withColumn("nTokens", size(col("toks")))
      .withColumn("spans", coalesce(
        expr("transform(spans, sp -> struct(sp.s AS s, least(sp.e, nTokens) AS e))"),
        array().cast("array<struct<s:int,e:int>>")))
    val pieces = expr(
      """filter(
        |  transform(sequence(0, size(spans)), i -> struct(
        |    CASE WHEN i = 0 THEN 0 ELSE element_at(spans, i).e END AS ps,
        |    CASE WHEN i = size(spans) THEN nTokens
        |         ELSE element_at(spans, i + 1).s END AS pe)),
        |  p -> p.pe - p.ps >= """.stripMargin + minPieceWords + ")")
    joined
      .withColumn("kept", pieces)
      .withColumn("action",
        when(size(col("spans")) === 0, "clean")
          .when(size(col("kept")) === 0 || size(col("kept")) > maxPieces,
            "removed")
          .otherwise("split"))
      .select(col("docId"), col("nMatches"),
        when(col("action") === "clean", 1)
          .otherwise(size(col("kept"))).as("nPieces"),
        col("action"),
        when(col("action") === "clean", col("text"))
          .when(col("action") === "removed", lit(""))
          .otherwise(expr(
            """array_join(transform(kept,
              |  p -> array_join(slice(toks, p.ps + 1, p.pe - p.ps), ' ')),
              |  ' ')""".stripMargin)).as("text"))
  }

  /** The cleaning step: corpus minus contaminated docs. No broadcast hint:
    * a clean corpus keeps the contaminated set tiny (AQE will broadcast it
    * from runtime stats), but a heavily contaminated corpus can flag
    * millions of ids — forcing a broadcast there would OOM the driver
    * instead of falling back to a shuffled anti-join. */
  def removeContaminated(corpus: DataFrame, idCol: Column, textCol: Column,
                         bench: DataFrame, benchTextCol: Column,
                         n: Int): DataFrame = {
    val bad = contaminated(corpus, idCol, textCol, bench, benchTextCol, n)
    corpus.join(bad.select(col("docId")), idCol === col("docId"), "left_anti")
  }

  /**
   * EMBEDDING-space decontamination — the paraphrase-robust complement
   * to n-gram overlap (Gunasekar et al. 2023, "Textbooks Are All You
   * Need", arXiv:2306.11644 §2.3 tests train/benchmark contamination by
   * embedding-cosine similarity precisely because surface n-grams miss
   * reworded leaks): flag every corpus vector whose cosine to ANY
   * benchmark vector reaches `threshold`, and report that nearest
   * benchmark item for audit. Scoring rides the family's fixed-point
   * substrate ([[Similarity.quantize]]/dotQ, cosine rounded to 6
   * digits), nearest = (cosine desc, bench id asc) — deterministic in
   * any engine.
   *
   * Scale shape: the benchmark set is tiny by definition, so it
   * collapses to ONE row of (id, vector, norm) structs broadcast to
   * every scan task (the trainCentroids device); the corpus pass is a
   * single map-side argmax projection through the codegen'd DotQ kernel
   * — no join, no shuffle at all, linear in corpus rows × benchmark
   * size. For benchmark sets past broadcast width, cluster them and
   * probe per cell (the IVF path); the flag stays a pure projection.
   */
  def contaminatedSemantic(corpus: DataFrame, bench: DataFrame,
                           threshold: Double): DataFrame = {
    import Similarity.{quantize, dotQ, normSqQ, cosineFromQ}
    val b = bench.select(col("vec_id").as("bid"),
        quantize(col("embedding")).as("bq"))
      .withColumn("bn", normSqQ(col("bq")))
      .agg(collect_list(struct(col("bid"), col("bq"), col("bn"))).as("bs"))
    corpus.select(col("vec_id"), quantize(col("embedding")).as("cq"))
      .withColumn("cn", normSqQ(col("cq")))
      .crossJoin(broadcast(b))
      .withColumn("best",
        array_min(transform(col("bs"), x =>
          struct((-round(cosineFromQ(dotQ(col("cq"), x.getField("bq")),
            col("cn"), x.getField("bn")), 6)).as("negCos"),
            x.getField("bid").as("bid")))))
      .select(col("vec_id"),
        (-col("best.negCos")).as("max_cosine"),
        col("best.bid").as("nearest_bench"),
        (-col("best.negCos") >= threshold).as("contaminated"))
  }
}
