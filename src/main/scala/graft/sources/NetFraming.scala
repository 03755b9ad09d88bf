package graft.sources

import java.util.Locale
import java.util.regex.Pattern

/**
 * Pure byte→message framing planes shared by the live socket listeners
 * (NetListener / GetTcp) and the batch oracle queries in SparkEntry.
 *
 * The sockets themselves need a live network, but everything BETWEEN the
 * received bytes and the emitted FlowFile is deterministic — exactly the
 * split the reference makes between its asio transports and the framing
 * in the read loops:
 *
 *  - ListenTCP: `extension-framework/src/utils/net/TcpServer.cpp:54-78`
 *    (`readLoop`) — repeated `async_read_until` on the Message Delimiter;
 *    Consume Delimiter strips it from the message; an EOF before the next
 *    delimiter DISCARDS the unterminated tail (the read error returns
 *    before anything is enqueued).
 *  - GetTCP: `extensions/standard-processors/processors/GetTCP.cpp:183-220`
 *    — messages KEEP their delimiter; a message longer than Max Message
 *    Size is emitted as max-size chunks that all route to `partial`,
 *    including the delimiter-terminated tail chunk
 *    (GetTCPTests.cpp:185-225); EOF likewise discards an unterminated
 *    tail.
 *  - ListenHTTP: `extensions/civetweb/processors/ListenHTTP.cpp` method
 *    dispatch + HeadersAsAttributesRegex capture
 *    (ListenHTTPTests.cpp:277-394).
 *
 * Keeping these planes pure lets the DuckDB oracle pin them byte-for-byte
 * (`listen_tcp_frames` / `get_tcp_frames` / `listen_http_envelope`) while
 * the socket tests in NetSpec exercise the same code over loopback.
 */
object NetFraming {

  /** One framing pass over the connection's accumulated buffer: returns
    * the complete (delimiter-terminated) frames and the unterminated
    * remainder to carry into the next read. Mirrors TcpServer.cpp's
    * `read_message.substr(0, bytes_read - (consume ? delim.size : 0))`
    * per `async_read_until` hit. */
  def splitFrames(buf: String, delimiter: String,
                  consumeDelimiter: Boolean): (Vector[String], String) = {
    val frames = Vector.newBuilder[String]
    var rest = buf
    var idx = rest.indexOf(delimiter)
    while (idx >= 0) {
      frames += rest.substring(0, if (consumeDelimiter) idx else idx + delimiter.length)
      rest = rest.substring(idx + delimiter.length)
      idx = rest.indexOf(delimiter)
    }
    (frames.result(), rest)
  }

  /** Whole-connection plane: the frames a connection emits given its full
    * byte stream followed by EOF. The unterminated remainder is DISCARDED
    * — TcpServer.cpp:58-62 returns on the eof read error without
    * enqueuing the partial buffer. */
  def connectionFrames(stream: String, delimiter: String,
                       consumeDelimiter: Boolean): Vector[String] =
    splitFrames(stream, delimiter, consumeDelimiter)._1

  /** GetTCP client plane: (message, relationship) rows for a connection's
    * full byte stream. Messages keep the delimiter; a message longer than
    * maxMessageSize (0 = unlimited) splits into max-size chunks that ALL
    * route to `partial` (GetTCPTests.cpp:214-222: "abcdefghij",
    * "klmnopqrst", "uvwxyz\r" partial; "Bye\r" success); EOF discards an
    * unterminated tail (GetTCP.cpp:197-201). */
  def getTcpMessages(stream: String, delimiter: String,
                     maxMessageSize: Int): Vector[(String, String)] = {
    val (messages, _) = splitFrames(stream, delimiter, consumeDelimiter = false)
    messages.flatMap { m =>
      if (maxMessageSize <= 0 || m.length <= maxMessageSize) Vector((m, "success"))
      else m.grouped(maxMessageSize).map(c => (c, "partial")).toVector
    }
  }

  /** ListenHTTP request plane: HTTP status, whether a FlowFile commits,
    * its content, and the headers captured as attributes.
    *
    * Method semantics per ListenHTTPTests.cpp:277-333 — POST commits the
    * body; GET commits an EMPTY FlowFile (a liveness probe that still
    * flows); HEAD answers 200 without committing; anything else is 405.
    * Headers whose LOWERCASED name full-matches HeadersAsAttributesRegex
    * ride with the message (ListenHTTPTests.cpp:354-394); repeated
    * headers join with "," like the reference's civetweb view. */
  final case class HttpResult(status: Int, committed: Boolean,
                              content: String, captured: Map[String, String])

  def httpEnvelope(method: String, headers: Seq[(String, String)],
                   body: String, headersAttrRegex: Option[String]): HttpResult = {
    def captured: Map[String, String] = headersAttrRegex match {
      case Some(re) =>
        val p = Pattern.compile(re)
        headers.groupBy(_._1.toLowerCase(Locale.ROOT)).collect {
          case (k, vs) if p.matcher(k).matches() => k -> vs.map(_._2).mkString(",")
        }
      case None => Map.empty
    }
    method match {
      case "POST" => HttpResult(200, committed = true, body, captured)
      case "GET"  => HttpResult(200, committed = true, "", captured)
      case "HEAD" => HttpResult(200, committed = false, "", Map.empty)
      case _      => HttpResult(405, committed = false, "", Map.empty)
    }
  }

  // ---- batch plane columns for the oracle rows -------------------------
  // The same functions the live sockets call, lifted to columns so the
  // framing semantics are DuckDB-pinned (`listen_tcp_frames`,
  // `get_tcp_frames`, `listen_http_envelope`). Per-connection framing is
  // inherently a local linear scan — these stay narrow (no shuffle) and
  // scale with whatever partitioning the message stream already has.

  import org.apache.spark.sql.functions.udf

  val tcpFramesUdf = udf((stream: String, delimiter: String, consume: Boolean) =>
    connectionFrames(stream, delimiter, consume))

  val getTcpUdf = udf((stream: String, delimiter: String, maxMessageSize: Int) =>
    getTcpMessages(stream, delimiter, maxMessageSize))

  val httpEnvelopeUdf = udf((method: String, names: Seq[String],
                             values: Seq[String], body: String, regex: String) =>
    httpEnvelope(method, names.zip(values), body,
      Option(regex).filter(_.nonEmpty)))
}
