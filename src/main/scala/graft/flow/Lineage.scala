package graft.flow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.FlowFrame

/**
 * Provenance lineage — FORK/JOIN/CLONE events
 * (minifi-api/include/minifi-cpp/provenance/Provenance.h:45-107) as
 * relational columns. The reference records an event per FlowFile on every
 * session commit (libminifi/src/core/ProcessSession.cpp:973) into a
 * repository; a driver-side event store in Spark would collect per-row
 * events, so here lineage RIDES WITH THE ROWS in the attribute map and the
 * provenance log is a DataFrame derived from any flow output — at 100 TB
 * the log is a table you write alongside the data, not a side channel.
 *
 * Child identity at FORK is DETERMINISTIC (`<parent uuid>#<index>`) rather
 * than the reference's random uuid (utils::IdGenerator): a Spark task retry
 * or a second action over the same lazy plan re-evaluates nondeterministic
 * expressions, so a random uuid() would fork a fragment's identity between
 * the split output and the provenance log derived from it. Determinism is
 * the replay-safe re-expression; uniqueness holds because the parent uuid
 * is unique and the fragment index is unique within the parent. CLONE
 * children are `<parent uuid>@<connection id>` for the same reason.
 */
object Lineage {
  /** Attribute key: event type of the last lineage-changing operation. */
  val EventAttr = "provenance.event"
  /** Attribute key: comma-joined sorted parent uuid list. */
  val ParentsAttr = "provenance.parents"

  val Fork = "FORK"
  val Join = "JOIN"
  val Clone = "CLONE"

  /** Deterministic child uuid for fragment `index` of `parentUuid`. */
  def fragmentUuid(parentUuid: Column, index: Column): Column =
    concat(parentUuid.cast("string"), lit("#"), index.cast("string"))

  /** Deterministic child uuid for a clone routed down `connectionId`. */
  def cloneUuid(parentUuid: Column, connectionId: String): Column =
    concat(parentUuid.cast("string"), lit("@"), lit(connectionId))

  /** Lineage attributes as a map column (for map_concat into Attributes). */
  def eventMap(event: String, parents: Column): Column =
    map(lit(EventAttr), lit(event), lit(ParentsAttr), parents.cast("string"))

  /** Stamp a CLONE event onto every row of an edge feeding one of several
    * same-relationship connections (ProcessSession clone on
    * multi-connection routing): the clone's parent is the original uuid,
    * recorded BEFORE the uuid swap, and the child uuid is deterministic per
    * connection. Shared by the batch runner and the streaming
    * interpretation — the event shape must match for [[events]] to read
    * both. */
  def stampClone(base: DataFrame, connectionId: String): DataFrame =
    FlowFrame.withAttrs(base, Seq(
        EventAttr -> lit(Clone),
        ParentsAttr -> col(FlowFrame.Uuid)))
      .withColumn(FlowFrame.Uuid,
        cloneUuid(col(FlowFrame.Uuid), connectionId))

  /**
   * The provenance-event table of a flow output: one row per FlowFile that
   * carries a lineage event — (eventType, childUuid, parentUuids). Rows
   * without an event (sources, pure transforms) are filtered map-side; the
   * projection never touches content, so Parquet-backed flows prune it.
   */
  def events(ff: DataFrame): DataFrame =
    ff.filter(FlowFrame.attr(EventAttr).isNotNull)
      .select(
        FlowFrame.attr(EventAttr).as("eventType"),
        col(FlowFrame.Uuid).as("childUuid"),
        split(FlowFrame.attr(ParentsAttr), ",").as("parentUuids"))
}
