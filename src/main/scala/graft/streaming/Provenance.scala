package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Provenance — SURVEY §7.5.7 (optional surface).
 *
 * The reference records a per-FlowFile event graph
 * (CREATE/RECEIVE/FORK/JOIN/CLONE/DROP,
 * minifi-api/include/minifi-cpp/provenance/Provenance.h:45-107). Spark's
 * unit of lineage is the query, not the row: the idiomatic analog is a
 * QueryExecutionListener capturing each executed plan — inputs (scan
 * locations), operator tree, output metrics, wall time. Row-level lineage
 * at 100 TB would cost more than the pipeline itself; plan-level lineage is
 * what warehouse provenance systems record.
 */
final class ProvenanceListener extends QueryExecutionListener {

  final case class PlanEvent(funcName: String, durationNs: Long,
                             inputPaths: Seq[String], physicalPlan: String,
                             error: Option[String])

  private val eventsQ = new ConcurrentLinkedQueue[PlanEvent]()

  def events: Seq[PlanEvent] = {
    val b = Seq.newBuilder[PlanEvent]
    eventsQ.forEach(e => b += e)
    b.result()
  }

  private def record(funcName: String, qe: QueryExecution, durationNs: Long,
                     error: Option[String]): Unit = {
    val inputs = qe.executedPlan.collectLeaves().flatMap { leaf =>
      val s = leaf.toString
      val i = s.indexOf("Location:")
      if (i >= 0) Some(s.substring(i).takeWhile(_ != ',')) else None
    }
    eventsQ.add(PlanEvent(funcName, durationNs, inputs.distinct,
      qe.executedPlan.nodeName, error))
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    record(funcName, qe, durationNs, None)

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    record(funcName, qe, 0L, Some(exception.toString))
}
