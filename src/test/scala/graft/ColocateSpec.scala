package graft

import org.apache.spark.sql.functions._
import graft.plans.Colocate

/** Pins the POINT of bucketed co-location: the equi-join of two tables
  * bucketed on their join keys (same count) plans with NO Exchange on
  * either side — and, with one file per bucket (the writeBucketed
  * repartition), no per-query Sort either. The result itself must equal
  * the plain join's (co-location changes the plan, never the answer). */
class ColocateSpec extends SparkSpec {

  test("bucketed equi-join: no Exchange, no Sort in the executed plan, " +
    "same result as the plain join") {
    import spark.implicits._
    val left = (1L to 100L).map(k => (k, s"p${k % 5}"))
      .toDF("o_orderkey", "o_orderpriority")
    val right = (1L to 300L).map(i => (i % 100 + 1, (i % 7).toDouble))
      .toDF("l_orderkey", "l_quantity")
    Colocate.writeBucketed(spark, left, "colocate_l", "o_orderkey", 4)
    Colocate.writeBucketed(spark, right, "colocate_r", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevOrd = spark.conf
      .get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try {
      // fact ⨝ fact is the target regime — broadcast must not rescue it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // sort-order reporting from sortBy is behind this flag in Spark 3+/4
      // (one file per bucket is the other precondition — asserted below)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        "true")
      val j = Colocate.bucketedEquiJoin(spark, "colocate_l", "o_orderkey",
        "colocate_r", "l_orderkey")
      val got = j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.matches("(?s).*\\bSort \\[.*"), plan)
      val expect = left.join(right,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(got === expect)
      // one file per bucket actually held (the sort-elision precondition)
      val files = spark.table("colocate_l").inputFiles
      assert(files.length === 4, files.mkString(","))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        prevOrd)
    }
  }

  test("writeBucketed overwrites a prior incarnation cleanly") {
    import spark.implicits._
    val v1 = Seq((1L, "a")).toDF("k", "v")
    val v2 = Seq((2L, "b"), (3L, "c")).toDF("k", "v")
    Colocate.writeBucketed(spark, v1, "colocate_ow", "k", 2)
    Colocate.writeBucketed(spark, v2, "colocate_ow", "k", 2)
    assert(spark.table("colocate_ow").count() === 2)
  }
}
