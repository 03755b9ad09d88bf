package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col
import graft.core.FlowFrame

/**
 * ExecuteScript with the reference's full session API — SURVEY §2.4
 * (extensions/script/ExecuteScript.h:48-86; session surface per the lua
 * binding: LuaProcessSession.h:36-42 get/create/read/write/transfer/remove,
 * LuaScriptFlowFile.cpp:33-72 getAttribute/addAttribute/updateAttribute/
 * removeAttribute; behaviors pinned by
 * extensions/lua/tests/TestExecuteScriptProcessorWithLuaScript.cpp).
 *
 * The script language is Scala — in a Spark-native engine the user's
 * "script" is a serializable `ScriptSession => Unit` (the reference's
 * `onTrigger(context, session)`), shipped to executors and invoked once
 * per incoming FlowFile, exactly the reference's trigger cadence. The
 * lua/python *interpreters* are the only part not carried over: user code
 * here is JVM-native, so it runs inside the executor without an engine
 * boundary.
 *
 * Session-commit semantics (ProcessSession.cpp): FlowFiles the script
 * transfers are emitted on their relationship; removed ones disappear; an
 * incoming FlowFile the script neither transfers nor removes is the
 * reference's ROLLBACK (it stays queued) — the batch analog re-emits it
 * unchanged with a null relationship so a retrying runner can requeue it.
 *
 * Scale: embarrassingly parallel — one partition-local session object per
 * row, no shuffle, no driver involvement. Catalyst cannot see through the
 * closure (same as the reference's opaque script), so use the declarative
 * operators when they can express the logic.
 */
object Script {

  /** Mutable FlowFile view handed to the script (LuaScriptFlowFile). */
  final class ScriptFlowFile private[Script] (
      val uuid: String,
      private[Script] var attrs: Map[String, String],
      private[Script] var content: String) {
    def getAttribute(key: String): Option[String] = attrs.get(key)
    /** Adds only when absent (FlowFile::addAttribute contract); returns
      * whether the attribute was added. */
    def addAttribute(key: String, value: String): Boolean =
      if (attrs.contains(key)) false else { attrs += key -> value; true }
    /** Updates only when present; returns whether it was updated. */
    def updateAttribute(key: String, value: String): Boolean =
      if (attrs.contains(key)) { attrs += key -> value; true } else false
    def removeAttribute(key: String): Boolean =
      if (attrs.contains(key)) { attrs -= key; true } else false
    /** Convenience setter (add-or-update), the putAttribute analog. */
    def setAttribute(key: String, value: String): Unit = attrs += key -> value
  }

  /** One onTrigger invocation's session (LuaProcessSession surface). */
  final class ScriptSession private[Script] (
      incoming: Option[ScriptFlowFile], newUuid: () => String) {
    private[Script] val transferred = ArrayBuffer.empty[(ScriptFlowFile, String)]
    private[Script] val removed = ArrayBuffer.empty[ScriptFlowFile]
    private var got = false

    /** The incoming FlowFile; None on a source-style trigger — and None
      * again once consumed (session:get() hands out each file once). */
    def get(): Option[ScriptFlowFile] =
      if (got) None else { got = true; incoming }
    /** Create a FlowFile; with a parent, attributes are inherited
      * (LuaProcessSession::create(parent)). */
    def create(parent: Option[ScriptFlowFile] = None): ScriptFlowFile =
      new ScriptFlowFile(newUuid(),
        parent.map(_.attrs).getOrElse(Map.empty), "")
    def read(ff: ScriptFlowFile): String = ff.content
    def write(ff: ScriptFlowFile, newContent: String): Unit =
      ff.content = newContent
    def transfer(ff: ScriptFlowFile, relationship: String): Unit =
      transferred += ff -> relationship
    def remove(ff: ScriptFlowFile): Unit = removed += ff
  }

  /**
   * Run `onTrigger` once per incoming FlowFile, distributed. Output rows
   * are the transferred FlowFiles (relationship set); a not-handled
   * incoming FlowFile passes through with a null relationship (the
   * rollback analog documented above).
   */
  def executeScript(df: DataFrame,
                    onTrigger: ScriptSession => Unit): DataFrame = {
    val in = df
      .withColumn(FlowFrame.Relationship,
        col(FlowFrame.Relationship).cast("string"))
      .withColumn(FlowFrame.Content, col(FlowFrame.Content).cast("string"))
    val schema = in.schema
    val iUuid = schema.fieldIndex(FlowFrame.Uuid)
    val iAttrs = schema.fieldIndex(FlowFrame.Attributes)
    val iContent = schema.fieldIndex(FlowFrame.Content)
    val iRel = schema.fieldIndex(FlowFrame.Relationship)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val origAttrs = r.getMap[String, String](iAttrs).toMap
        val origContent = Option(r.getString(iContent)).getOrElse("")
        val ff = new ScriptFlowFile(r.getString(iUuid), origAttrs, origContent)
        val session = new ScriptSession(Some(ff),
          () => java.util.UUID.randomUUID().toString)
        onTrigger(session)
        def emit(uuid: String, attrs: Map[String, String], content: String,
                 rel: String): Row = {
          val vals = r.toSeq.toArray
          vals(iUuid) = uuid
          vals(iAttrs) = attrs
          vals(iContent) = content
          vals(iRel) = rel
          Row.fromSeq(vals.toIndexedSeq)
        }
        // remove cancels any earlier transfer of the same FlowFile — the
        // reference deletes the record outright (ProcessSession::remove)
        val committed = session.transferred.toSeq
          .filterNot { case (f, _) => session.removed.exists(_ eq f) }
        val handled = session.transferred.exists(_._1 eq ff) ||
          session.removed.exists(_ eq ff)
        committed.map { case (f, rel) => emit(f.uuid, f.attrs, f.content, rel) } ++
          // rollback analog: the ORIGINAL row, untouched by any partial
          // script mutation (the reference discards session-local state)
          (if (handled) Nil
           else Seq(emit(ff.uuid, origAttrs, origContent, null)))
      }
    }
  }
}
