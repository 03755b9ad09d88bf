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
}
