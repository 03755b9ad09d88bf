package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

/**
 * Outbound sink plane — SURVEY §2.2.
 *
 * PutTCP/PutUDP move bytes; the HTTP-based sinks (PostElasticsearch,
 * PutSplunkHTTP, PushGrafanaLoki) are a *payload contract* plus a POST —
 * the POST is `Exec.httpCallPartition`'s job, and the payload builders
 * here are pure Catalyst columns (testable offline, byte-deterministic).
 */
object Sinks {

  /**
   * PutFile (PutFile.cpp:75): write each row's content to
   * `directory/filename`, conflict strategies fail/replace/ignore,
   * optional directory creation. The directory is a per-row column because
   * the reference evaluates the Directory property per FlowFile
   * (`/out/${lang}` EL patterns, PutFile.cpp Directory supports expression
   * language); a null/empty directory routes to failure like an
   * unresolvable EL result. Returns the relationship per row
   * ("success"/"failure"); nondeterministic so the optimizer can neither
   * duplicate nor reorder the write (same policy as Sources.fetchFile).
   * Each task writes its own rows — distributed, no driver funnel; the
   * directory must be a shared filesystem on a real cluster, exactly like
   * the reference's PutFile target.
   */
  def putFileUdf(conflict: String, createDirs: Boolean):
      org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (directory: String, filename: String, content: Array[Byte]) =>
      if (directory == null || directory.isEmpty) "failure"
      else try {
        val dir = java.nio.file.Paths.get(directory)
        if (createDirs) java.nio.file.Files.createDirectories(dir)
        val target = dir.resolve(filename)
        val exists = java.nio.file.Files.exists(target)
        conflict.toLowerCase match {
          case "fail" if exists    => "failure"
          case "ignore" if exists  => "success"
          case _ =>
            java.nio.file.Files.write(target,
              if (content == null) Array.emptyByteArray else content)
            "success"
        }
      } catch { case _: java.io.IOException => "failure" }
    }.asNondeterministic()

  /**
   * Per-row PutTCP/PutUDP for the config-driven dispatch: one
   * connection/datagram per row — the reference's per-FlowFile send. The
   * per-partition [[putTcp]]/[[putUdp]] below amortize the connection for
   * bulk paths; the dispatch favors the row shape because each row must
   * carry its own success/failure relationship. Nondeterministic so a
   * network send is never duplicated or reordered by the optimizer.
   */
  /** Host/port arrive per ROW: the reference's Hostname and Port
    * properties are EL-evaluated per FlowFile (PutTCP.h:55-67 —
    * `${tcp_port}` fans one processor out over many servers,
    * PutTCPTests.cpp "multiple servers"). An unparseable port or an
    * unreachable destination routes that row to failure. */
  def putTcpUdf(delimiter: String = "\n"):
      org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (msg: String, host: String, port: Integer) =>
      if (host == null || port == null) "failure"
      else try {
        val sock = new Socket(host, port.intValue())
        try {
          sock.getOutputStream.write(
            ((if (msg == null) "" else msg) + delimiter)
              .getBytes(StandardCharsets.UTF_8))
          sock.getOutputStream.flush()
          "success"
        } finally sock.close()
      } catch { case scala.util.control.NonFatal(_) => "failure" }
    }.asNondeterministic()

  def putUdpUdf():
      org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (msg: String, host: String, port: Integer) =>
      if (host == null || port == null) "failure"
      else try {
        val sock = new DatagramSocket()
        try {
          val bytes = (if (msg == null) "" else msg).getBytes(StandardCharsets.UTF_8)
          sock.send(new DatagramPacket(bytes, bytes.length,
            InetAddress.getByName(host), port.intValue()))
          "success"
        } finally sock.close()
      } catch { case scala.util.control.NonFatal(_) => "failure" }
    }.asNondeterministic()

  /**
   * PutTCP/PutUDP's deterministic wire plane (PutTCP.cpp:77-99,134-160;
   * PutUDP.cpp:61-75): Hostname and Port resolve PER FLOWFILE via EL, an
   * empty endpoint routes `failure` without sending, the TCP stream is the
   * content bytes followed by the Outgoing Message Delimiter bytes
   * (sendStreamWithDelimiter), and UDP sends the bare content as one
   * datagram. Pure projection — the live-socket transmission on top of it
   * is [[putTcp]]/[[putUdp]]. Map-side only at any scale.
   */
  def putTcpEnvelope(ff: org.apache.spark.sql.DataFrame, hostnameEl: String,
                     portEl: String,
                     delimiter: String = ""): org.apache.spark.sql.DataFrame = {
    import graft.core.FlowFrame
    import graft.el.ElCompiler
    val host = coalesce(ElCompiler.template(hostnameEl), lit(""))
    val port = coalesce(ElCompiler.template(portEl), lit(""))
    val content = col(FlowFrame.Content).cast("binary")
    val delimBytes = delimiter.getBytes(StandardCharsets.UTF_8)
    ff.select(
      col(FlowFrame.Uuid).cast("string").as("uuid"),
      host.as("hostname"), port.as("port"),
      // TCP payload: content + delimiter; UDP datagram: bare content
      (if (delimBytes.isEmpty) content
       else concat(content, lit(delimBytes))).as("payload"),
      content.as("datagram"),
      when(host === "" || port === "", "failure")
        .otherwise("success").as("relationship"))
  }

  /**
   * PutTCP (extensions/standard-processors/processors/PutTCP.cpp): write
   * each row's message to host:port, newline-delimited. One connection per
   * partition (the reference pools connections per processor); rows pass
   * through so the caller can route on delivery.
   */
  def putTcp(messages: Dataset[String], host: String, port: Int,
             delimiter: String = "\n"): Long = {
    messages.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val sock = new Socket(host, port)
        try {
          val out = sock.getOutputStream
          var n = 0L
          rows.foreach { m =>
            out.write((m + delimiter).getBytes(StandardCharsets.UTF_8)); n += 1
          }
          out.flush()
          Iterator.single(n)
        } finally sock.close()
      }
    }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)
  }

  /** PutUDP (PutUDP.cpp): one datagram per row. */
  def putUdp(messages: Dataset[String], host: String, port: Int): Long = {
    messages.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val sock = new DatagramSocket()
        val addr = InetAddress.getByName(host)
        try {
          var n = 0L
          rows.foreach { m =>
            val b = m.getBytes(StandardCharsets.UTF_8)
            sock.send(new DatagramPacket(b, b.length, addr, port)); n += 1
          }
          Iterator.single(n)
        } finally sock.close()
      }
    }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)
  }

  /**
   * PostElasticsearch _bulk payload (extensions/elasticsearch/
   * PostElasticsearch.cpp:59-135): per row, an action metadata line
   * ({"index":{"_index":...,"_id":...}}) followed by the document JSON for
   * index/create/update; delete emits only the action line. The rows'
   * payload lines concat with newlines into one _bulk body per batch.
   */
  def esBulkLines(action: Column, indexCol: Column, idCol: Column,
                  docJson: Column): Column = {
    // upsert is the _bulk "update" action with doc_as_upsert
    // (PostElasticsearch.cpp:100-111); update/upsert wrap the content in
    // a {"doc": ...} envelope; delete has no payload line
    val metaAction = when(action.isin("update", "upsert"), "update")
      .otherwise(action)
    val meta = concat(
      lit("{\""), metaAction, lit("\":{\"_index\":\""), indexCol,
      lit("\",\"_id\":\""), idCol, lit("\"}}"))
    when(action === "delete", meta)
      .when(action === "update",
        concat(meta, lit("\n{\"doc\":"), docJson, lit("}")))
      .when(action === "upsert",
        concat(meta, lit("\n{\"doc\":"), docJson,
          lit(",\"doc_as_upsert\":true}")))
      .otherwise(concat(meta, lit("\n"), docJson))
  }

  /** Assemble one _bulk body from per-row lines (group-agg, order by id). */
  def esBulkBody(lines: Column, orderCol: Column): Column =
    concat(array_join(
      transform(array_sort(collect_list(struct(orderCol.as("o"), lines.as("l")))),
        e => e.getField("l")), "\n"), lit("\n"))

  /**
   * PutSplunkHTTP HEC event (extensions/splunk/PutSplunkHTTP.cpp:40-60):
   * the event JSON with optional sourcetype/source/host/index metadata —
   * the reference sends these as query parameters; the HEC JSON-event
   * form carries the same fields inline.
   */
  def splunkHecEvent(eventCol: Column, sourceType: Option[String] = None,
                     source: Option[String] = None, host: Option[String] = None,
                     index: Option[String] = None): Column = {
    val metaFields: Seq[Column] =
      sourceType.map(v => lit("\"sourcetype\":\"" + v + "\"")).toSeq ++
      source.map(v => lit("\"source\":\"" + v + "\"")).toSeq ++
      host.map(v => lit("\"host\":\"" + v + "\"")).toSeq ++
      index.map(v => lit("\"index\":\"" + v + "\"")).toSeq
    val metaJson =
      if (metaFields.isEmpty) lit("")
      else concat(concat_ws(",", metaFields: _*), lit(","))
    concat(lit("{"), metaJson, lit("\"event\":"), to_json(struct(eventCol.as("raw"))),
      lit("}"))
  }

  /**
   * PushGrafanaLoki REST body (extensions/grafana-loki/
   * PushGrafanaLokiREST.cpp:105-147): one stream per label set, values =
   * [[ns-timestamp-string, line], ...] ordered by timestamp. Group-agg per
   * label set; labels are a plan-time map.
   */
  def lokiStream(labels: Seq[(String, String)], tsNanosCol: Column,
                 lineCol: Column,
                 metadataCol: Option[Column] = None): Column = {
    // JSON-escape label keys/values (r17, found by the gRPC-equivalence
    // spec; r18 review: the reference's rapidjson writer also escapes
    // CONTROL characters — \b \t \n \f \r get their short forms, every
    // other char below 0x20 goes \u00XX — so a label carrying a newline
    // must not produce an invalid stream object either)
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        // rapidjson's Writer emits UPPERCASE hex for control chars (\u001B),
        // so byte-level equivalence against the reference holds (r18 ADVICE)
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04X")
        case c    => sb.append(c)
      }
      sb.toString
    }
    val labelJson =
      labels.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    // Log Line Metadata Attributes (PushGrafanaLokiREST.cpp:101-116): when
    // the attribute list is configured, every value triple carries the
    // present-attribute object as a third element — {} when none matched
    val valueStruct = metadataCol match {
      case Some(m) => struct(tsNanosCol.as("t"), lineCol.as("l"),
        to_json(coalesce(m, map_from_arrays(
          array().cast("array<string>"),
          array().cast("array<string>")))).as("m"))
      case None => struct(tsNanosCol.as("t"), lineCol.as("l"), lit("").as("m"))
    }
    concat(
      lit(s"""{"stream":{$labelJson},"values":["""),
      array_join(
        transform(
          array_sort(collect_list(valueStruct)),
          e => concat(lit("[\""), e.getField("t").cast("string"), lit("\","),
            to_json(struct(e.getField("l").as("v"))).substr(lit(6),
              length(to_json(struct(e.getField("l").as("v")))) - 6),
            if (metadataCol.isDefined)
              concat(lit(","), e.getField("m")) else lit(""),
            lit("]"))),
        ","),
      lit("]}"))
  }

  /** Wrap one or more stream objects into the POST /loki/api/v1/push body. */
  def lokiPushBody(streams: Column*): Column =
    concat(lit("""{"streams":["""), concat_ws(",", streams: _*), lit("]}"))

  /**
   * PushGrafanaLokiGrpc stream-labels string (extensions/grafana-loki/
   * PushGrafanaLokiGrpc.cpp:38-54 setUpStreamLabels): the gRPC transport
   * carries the label set as ONE `{key="value", key2="value2"}` string
   * (logproto.StreamAdapter.labels — protos/grafana-loki-push.proto:36),
   * keys in sorted order (the reference builds a std::map) and `"` in
   * values escaped as `\"`. Same label map as the REST body's
   * `"stream":{...}` object — only the wire shape differs.
   */
  def lokiGrpcLabels(labels: Seq[(String, String)]): String =
    labels.sortBy(_._1).map { case (k, v) =>
      s"""$k="${v.replace("\"", "\\\"")}""""
    }.mkString("{", ", ", "}")

  /**
   * PushGrafanaLokiGrpc push-payload plane (extensions/grafana-loki/
   * PushGrafanaLokiGrpc.cpp:117-136 submitRequest + protos/
   * grafana-loki-push.proto): ONE logproto.StreamAdapter per label set —
   * labels as the [[lokiGrpcLabels]] string, entries = (timestamp
   * nanos → protobuf Timestamp, line, nonIndexedLabels name/value pairs
   * from the configured metadata attributes), in timestamp order. The
   * logical content is EXACTLY the REST body's (stream labels, [ts,
   * line, metadata] triples) — [[lokiStream]] and this struct differ
   * only in transport encoding (JSON vs protobuf; SinksSpec pins the
   * field-for-field equivalence). The gRPC channel itself (keepalive,
   * SSL creds, x-scope-orgid tenant metadata) is connector wiring the
   * sandbox cannot exercise, like the Kafka/MQTT transports.
   */
  def lokiGrpcStream(labels: Seq[(String, String)], tsNanosCol: Column,
                     lineCol: Column,
                     metadataCol: Option[Column] = None): Column = {
    val entry = metadataCol match {
      case Some(m) => struct(tsNanosCol.as("timestamp"), lineCol.as("line"),
        transform(map_entries(coalesce(m, map_from_arrays(
            array().cast("array<string>"), array().cast("array<string>")))),
          e => struct(e.getField("key").as("name"),
            e.getField("value").as("value"))).as("nonIndexedLabels"))
      case None => struct(tsNanosCol.as("timestamp"), lineCol.as("line"),
        array().cast("array<struct<name:string,value:string>>")
          .as("nonIndexedLabels"))
    }
    struct(lit(lokiGrpcLabels(labels)).as("labels"),
      array_sort(collect_list(entry)).as("entries"))
  }

  /**
   * QuerySplunkIndexingStatus payload/parse plane (extensions/splunk/
   * QuerySplunkIndexingStatus.cpp:38,75): batch the pending `splunk.ack.id`
   * attributes into the POST /services/collector/ack body
   * ({"acks":[id,...]}), then route each row by the response's
   * {"acks":{"id":bool,...}} — true → acknowledged, false → undetermined
   * (retry until max-wait), missing ack id → failure.
   */
  def splunkAckRequestBody(ackIds: Column): Column =
    concat(lit("""{"acks":["""),
      array_join(transform(ackIds, i => i.cast("string")), ","), lit("]}"))

  def splunkAckStatus(responseJson: Column, ackId: Column): Column = {
    val acks = from_json(get_json_object(responseJson, "$.acks"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.BooleanType))
    val status = element_at(acks, ackId.cast("string"))
    when(status === true, "acknowledged")
      .when(status === false, "undetermined")
      .otherwise("failure")
  }
}
