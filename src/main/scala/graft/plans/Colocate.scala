package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed co-location — the write-once / join-many-shuffle-free pattern
 * for fact-to-fact joins at scale. The reference runs single-node flows
 * where a "join" is a content lookup; the 100 TB Spark answer to a
 * repeated equi-join is to PRE-PARTITION both sides at write time:
 * `bucketBy(n, key)` hashes rows into n files per partition and records
 * the spec in the catalog, `sortBy(key)` orders rows within each bucket,
 * and every later equi-join on the bucket key reads both sides
 * co-located — SortMergeJoin with NO Exchange and NO per-query Sort
 * (ColocateSpec pins the plan). At 1000 executors this converts the
 * biggest recurring shuffle (fact ⨝ fact, e.g. orders ⨝ lineitem every
 * downstream query) into a streaming merge of pre-sorted files.
 *
 * Bucket count is the knob that must hold at 100 TB: it fixes the read
 * parallelism of every consumer, so size it to the TARGET table bytes
 * (bytes / ~1 GiB per bucket), not the writer's partition count — both
 * sides of a planned join family must agree on (count, key) for the
 * exchange-free plan to apply.
 */
object Colocate {

  /** Drop + clean any prior incarnation (the in-memory catalog does not
    * survive sessions but its managed directory does — the put_sql
    * lesson), then write `df` as a bucketed, bucket-sorted parquet table
    * in the session catalog. */
  def writeBucketed(spark: SparkSession, df: DataFrame, name: String,
                    key: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "bucket count must be positive")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new Path(spark.conf.get("spark.sql.warehouse.dir"), name)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    // repartition on the bucket key first: writer hash == bucket hash
    // (both Murmur3 HashPartitioning), so every task holds exactly one
    // bucket and each bucket lands in ONE file — the condition under
    // which the scan reports per-bucket sort order and later joins skip
    // the Sort as well as the Exchange (Spark 3+/4 additionally gates the
    // sort-order report behind
    // spark.sql.legacy.bucketedTableScan.outputOrdering=true; without it
    // the join keeps a cheap within-partition Sort but still no
    // Exchange). This write-side exchange is the pattern's one-time cost.
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .mode(SaveMode.Overwrite).saveAsTable(name)
  }

  /** Equi-join two bucketed catalog tables on their (same-count) bucket
    * keys. With both specs aligned the optimizer plans the join with no
    * Exchange on either side; the keys may differ in NAME (o_orderkey vs
    * l_orderkey) — only the spec (count, key column) must match its own
    * table. */
  def bucketedEquiJoin(spark: SparkSession, leftName: String, leftKey: String,
                       rightName: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftName)
      .join(spark.table(rightName), col(leftKey) === col(rightKey))
  }
}
