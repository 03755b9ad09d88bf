package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Staging.StagingOps

/**
 * Stage-attrition ("funnel") report over a curation chain — the
 * observability read every production pipeline publishes next to its
 * output (the per-stage removal-rate tables of C4 §2.2 / Gopher A.1.2 /
 * RefinedWeb Fig. 2 are exactly this shape): how many documents and
 * tokens enter, and how many survive each stage.
 *
 * Stages are expressed as CUMULATIVE keep flags plus the token count
 * the stage's output would contribute — declarative columns, so the
 * WHOLE funnel costs ONE corpus pass: a single wide projection computes
 * every flag/count, one bounded aggregation folds all stage totals
 * (aggregate state = 2·|stages| longs), and an optional exact-dedup
 * terminal stage adds one hash-keyed agg over the last stage's
 * survivors (map-side partial; duplicate copies share their content, so
 * per-hash `first(tokens)` is well-defined and the keeper token mass is
 * a two-level aggregation, never a join).
 *
 * Returns (stage_idx, stage, n_docs, n_tokens), stage_idx 0 = raw.
 */
object Funnel {

  /**
   * @param rawTokens token count of the document as ingested
   * @param stages    (name, cumulative keep flag, stage-output tokens)
   * @param dedupOn   content column for a terminal exact-dedup keeper
   *                  stage over the last flag stage's survivors
   */
  def report(df: DataFrame, rawTokens: Column,
             stages: Seq[(String, Column, Column)],
             dedupOn: Option[Column] = None): DataFrame = {
    require(dedupOn.isEmpty || stages.nonEmpty,
      "the dedup stage needs a preceding flag stage to take survivors from")
    val spark = df.sparkSession
    val proj = df.select(
      rawTokens.cast("long").as("__n0") +:
        (stages.zipWithIndex.flatMap { case ((_, k, t), i) =>
          Seq(k.as(s"__k$i"), t.cast("long").as(s"__t$i"))
        } ++
          dedupOn.map(c => md5(c.cast("binary")).as("__h")).toSeq): _*)
    val base = if (dedupOn.isDefined) proj.staged else proj
    val aggCols = Seq(count(lit(1)).as("d0"),
      coalesce(sum("__n0"), lit(0L)).as("t0")) ++
      stages.indices.flatMap(i => Seq(
        sum(when(col(s"__k$i"), 1L).otherwise(0L)).as(s"d${i + 1}"),
        coalesce(sum(when(col(s"__k$i"), col(s"__t$i")).otherwise(0L)),
          lit(0L)).as(s"t${i + 1}")))
    val r = base.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val flagRows = ("raw", r.getAs[Long]("d0"), r.getAs[Long]("t0")) +:
      stages.zipWithIndex.map { case ((n, _, _), i) =>
        (n, r.getAs[Long](s"d${i + 1}"), r.getAs[Long](s"t${i + 1}")) }
    val rows = dedupOn match {
      case None => flagRows
      case Some(_) =>
        val last = stages.size - 1
        val dd = base.filter(col(s"__k$last"))
          .groupBy("__h").agg(first(col(s"__t$last")).as("n"))
          .agg(count(lit(1)).as("d"), coalesce(sum("n"), lit(0L)).as("t"))
          .collect()(0)
        flagRows :+ ("exact_dedup", dd.getAs[Long]("d"), dd.getAs[Long]("t"))
    }
    import spark.implicits._
    rows.zipWithIndex.map { case ((n, d, t), i) => (i.toLong, n, d, t) }
      .toDF("stage_idx", "stage", "n_docs", "n_tokens")
  }
}
