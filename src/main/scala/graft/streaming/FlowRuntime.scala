package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/**
 * Flow-graph runtime glue — SURVEY §2.10/§3.1.
 *
 * The reference's scheduling/connection plane maps onto Structured
 * Streaming: a processor chain is a DataFrame transform composition, a
 * Connection hand-off is a micro-batch boundary, and per-relationship
 * fan-out (ProcessSession::routeFlowFile, ProcessSession.cpp:804) becomes a
 * relationship-partitioned sink — one `foreachBatch` write, partitioned by
 * the relationship column, so each edge lands in its own directory without
 * N separate filtered queries.
 */
object FlowRuntime {

  /** Scheduling strategy → Trigger (TimerDrivenSchedulingAgent.cpp:28,
    * EventDrivenSchedulingAgent.cpp:39, CronDrivenSchedulingAgent.cpp —
    * cron fires an external AvailableNow run at the instants
    * [[cronDelayMs]] computes from the scheduling period's Quartz
    * expression). */
  def trigger(strategy: String, periodMs: Long = 1000): Trigger =
    strategy match {
      case "TIMER_DRIVEN" => Trigger.ProcessingTime(periodMs)
      case "EVENT_DRIVEN" => Trigger.ProcessingTime(0)
      case "CRON_DRIVEN"  => Trigger.AvailableNow()
      case other => throw new IllegalArgumentException(s"unknown strategy $other")
    }

  /** Milliseconds from `now` until a CRON_DRIVEN source's next scheduled
    * drain: the scheduling period carries the Quartz expression
    * (CronDrivenSchedulingAgent.cpp uses utils::Cron the same way) —
    * None when the schedule never fires again. */
  def cronDelayMs(cronExpr: String,
                  now: java.time.LocalDateTime =
                    java.time.LocalDateTime.now()): Option[Long] =
    Cron(cronExpr).calculateNextTrigger(now)
      .map(next => java.time.Duration.between(now, next).toMillis)

  /** Relationship-partitioned sink: every micro-batch writes each output
    * edge under <root>/relationship=<name>/ (parquet). The micro-batch is
    * the reference's per-trigger session commit (ProcessSession.cpp:855). */
  def relationshipSink(routed: DataFrame, root: String): DataStreamWriter[Row] =
    routed.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("append")
        .partitionBy("relationship")
        .parquet(root)
    }

  /** Start + drain helper for batch-like runs (tests, cron ticks). */
  def runAvailable(writer: DataStreamWriter[Row], checkpoint: String): StreamingQuery = {
    val q = writer.option("checkpointLocation", checkpoint).start()
    q.processAllAvailable()
    q
  }
}
