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
