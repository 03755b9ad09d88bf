package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col
import graft.core.FlowFrame

/**
 * PutOPC — SURVEY §2.2 (extensions/opc/src/putopc.cpp:276-308, update at
 * :136-200, create at :201-275; OPC-as-source is out of scope per SURVEY
 * §2.1).
 *
 * Per FlowFile: resolve the target node (id or browse-name under the
 * configured parent), parse the CONTENT into the configured `Value type`
 * (opc.h:50-59 — Int64/UInt64/Int32/UInt32/Boolean/Float/Double/String;
 * a conversion failure routes `failure`, putopc.cpp:232), then update the
 * node when it exists or create it under the parent otherwise; either
 * outcome routes `success`, server rejection routes `failure`.
 *
 * The OPC UA wire client (open62541 in the reference) is the pluggable
 * boundary — [[InMemory]] is a real node store with exists/update/create
 * semantics; a deployment binds an Eclipse Milo-backed [[Connection]] and
 * the parse/route logic applies unchanged.
 */
object Opc {

  /** Node address: namespace index + id (path or int), putopc.h:64-82. */
  final case class NodeId(nsIndex: Int, id: String)

  /** The wire boundary (putopc.cpp connection_->update_node/create_node). */
  trait Connection extends Serializable {
    def exists(node: NodeId): Boolean
    def update(node: NodeId, value: Any): Boolean
    def create(parent: NodeId, target: NodeId, browseName: String,
               value: Any): Boolean
  }

  type ConnectionFactory = () => Connection

  private object Store {
    val nodes = TrieMap.empty[(String, Int, String), Any]
  }

  /** In-memory OPC UA server stand-in; `namespace` isolates tests,
    * `rejectWrites` simulates a bad status code from the server. */
  final case class InMemory(namespace: String, rejectWrites: Boolean = false)
      extends Connection {
    private def key(n: NodeId) = (namespace, n.nsIndex, n.id)
    def exists(node: NodeId): Boolean = Store.nodes.contains(key(node))
    def update(node: NodeId, value: Any): Boolean =
      !rejectWrites && { Store.nodes.put(key(node), value); true }
    def create(parent: NodeId, target: NodeId, browseName: String,
               value: Any): Boolean =
      !rejectWrites && { Store.nodes.put(key(target), value); true }
    def read(node: NodeId): Option[Any] = Store.nodes.get(key(node))
  }

  /** Content → typed OPC value (putopc.cpp:140-186: std::stoll/stoull/
    * stoi/stoul/stof/stod, utils::string::toBool). None = conversion
    * failure. */
  private[graft] def parseValue(content: String, valueType: String): Option[Any] =
    try {
      valueType match {
        case "Int64" => Some(content.trim.toLong)
        case "UInt64" => Some(java.lang.Long.parseUnsignedLong(content.trim))
        case "Int32" => Some(content.trim.toInt)
        case "UInt32" => Some(java.lang.Integer.parseUnsignedInt(content.trim))
        case "Boolean" => content.trim.toLowerCase match {
          case "true" | "1" => Some(true)
          case "false" | "0" => Some(false)
          case _ => None
        }
        case "Float" => Some(content.trim.toFloat)
        case "Double" => Some(content.trim.toDouble)
        case "String" => Some(content)
        case _ => None
      }
    } catch { case _: NumberFormatException => None }

  /**
   * PutOPC over a FlowFrame. The target node id comes from attribute
   * `targetIdAttr` when set (the reference evaluates EL per FlowFile),
   * else the fixed `targetNode`; rows route success/failure per the
   * reference's update-or-create outcome.
   */
  def putOpc(df: DataFrame, factory: ConnectionFactory, parent: NodeId,
             valueType: String, targetNode: Option[NodeId] = None,
             targetIdAttr: Option[String] = None,
             browseName: String = "",
             targetNsIndex: Option[Int] = None): DataFrame = {
    // row-encoder-safe: relationship/content typed string even when the
    // upstream frame carries a VOID null relationship
    val in = df
      .withColumn(FlowFrame.Relationship,
        col(FlowFrame.Relationship).cast("string"))
      .withColumn(FlowFrame.Content, col(FlowFrame.Content).cast("string"))
    val schema = in.schema
    val iAttrs = schema.fieldIndex(FlowFrame.Attributes)
    val iContent = schema.fieldIndex(FlowFrame.Content)
    val iRel = schema.fieldIndex(FlowFrame.Relationship)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    in.mapPartitions { rows =>
      val conn = factory()
      rows.map { r =>
        val attrs = r.getMap[String, String](iAttrs)
        val content = Option(r.getString(iContent)).getOrElse("")
        // Option(_) guards null-VALUED attributes (a composite EL that
        // evaluated to null) — an unresolvable target routes failure
        val target = targetIdAttr.flatMap(a => attrs.get(a))
          .flatMap(Option(_))
          .map(id => NodeId(targetNsIndex.getOrElse(parent.nsIndex), id))
          .orElse(targetNode)
        val rel = target match {
          case None => "failure" // unresolvable target (putopc.cpp:296-299)
          case Some(t) => parseValue(content, valueType) match {
            case None => "failure" // conversion failure (putopc.cpp:232)
            case Some(v) =>
              val ok =
                if (conn.exists(t)) conn.update(t, v)
                else conn.create(parent, t, browseName, v)
              if (ok) "success" else "failure"
          }
        }
        val vals = r.toSeq.toArray
        vals(iRel) = rel
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }
}
