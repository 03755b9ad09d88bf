package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Socket plane — SURVEY §2.1 ListenTCP / ListenUDP / ListenHTTP / GetTCP
 * (NetworkListenerProcessor.cpp:65-92, ListenTCP.h:41-91, GetTCP.h:61-68,
 * extensions/civetweb/processors/ListenHTTP.h:66-85).
 *
 * The reference's listeners are single-node servers feeding a bounded
 * in-memory queue that `onTrigger` drains in Max Batch Size chunks. The
 * Spark-native mapping keeps that shape: a background accept loop feeds a
 * queue owned by the stream (the listener lives with the driver, exactly
 * one bind point like the reference's single agent), and each micro-batch
 * drains the queued range — the offset is the message sequence number.
 * Downstream parsing/routing then fans out across the cluster.
 *
 * TCP framing splits on the Message Delimiter (newline default, delimiter
 * consumed — ListenTCP.h:71-79); UDP emits one message per datagram.
 *
 * Usage: spark.readStream.format("graft.sources.NetListenerSource")
 *          .option("protocol", "tcp"|"udp").option("port", "0").load()
 * The bound port is discoverable via NetListenerSource.boundPort(name)
 * using the required "name" option (tests bind port 0 = ephemeral).
 */
class NetListenerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetListenerSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NetListenerTable(
      Option(properties.get("name")).getOrElse("default"),
      Option(properties.get("protocol")).getOrElse("tcp"),
      Option(properties.get("port")).map(_.toInt).getOrElse(0),
      Option(properties.get("delimiter")).getOrElse("\n"),
      Option(properties.get("basePath")).getOrElse("/contentListener"),
      Option(properties.get("maxQueueSize")).map(_.toInt).getOrElse(10000),
      Option(properties.get("headersAttrRegex")).filter(_.nonEmpty),
      Option(properties.get("consumeDelimiter")).forall(_.toBoolean),
      Option(properties.get("maxRowsPerTrigger")).map(_.toLong).getOrElse(0L))
}

object NetListenerSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("sender", StringType, nullable = false),
    StructField("sender_port", IntegerType, nullable = false),
    StructField("port", IntegerType, nullable = false),
    StructField("message", StringType, nullable = false),
    StructField("headers", MapType(StringType, StringType), nullable = true)))

  /** Stamp the reference's output attributes onto listener rows —
    * ListenTCP.cpp:46-47 (`tcp.port`, `tcp.sender`), ListenUDP.h:66-68
    * (`udp.port`, `udp.sender`, `udp.sender.port`): the FlowFile envelope
    * plane the `listen_udp_envelope` oracle row pins. A narrow map
    * projection — no shuffle, rides whatever partitioning the stream
    * already has. */
  def envelope(df: DataFrame, protocol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val attrs = protocol match {
      case "udp" => map(
        lit("udp.port"), col("port").cast("string"),
        lit("udp.sender"), col("sender"),
        lit("udp.sender.port"), col("sender_port").cast("string"))
      case _ => map(
        lit("tcp.port"), col("port").cast("string"),
        lit("tcp.sender"), col("sender"))
    }
    df.withColumn("attrs", attrs)
  }

  /** One listener per source name (the reference: one server per
    * processor instance); lets tests find the ephemeral bound port. */
  private[sources] val listeners = new ConcurrentHashMap[String, Listener]()

  def boundPort(name: String): Int = {
    val l = listeners.get(name)
    require(l != null, s"no listener named $name")
    l.port
  }

  /** (queued, dropped) message counts — the observable face of the
    * bounded-queue contract (the reference logs "Queue is full. TCP
    * message ignored." per drop). */
  def queueStats(name: String): (Int, Long) = {
    val l = listeners.get(name)
    require(l != null, s"no listener named $name")
    (l.queuedCount, l.dropped)
  }

  private[sources] def listenerFor(name: String, protocol: String, port: Int,
                                   delimiter: String,
                                   basePath: String = "/contentListener",
                                   maxQueueSize: Int = 10000,
                                   headersAttrRegex: Option[String] = None,
                                   consumeDelimiter: Boolean = true): Listener =
    listeners.computeIfAbsent(name, _ => {
      val l = new Listener(protocol, port, delimiter, basePath, maxQueueSize,
        headersAttrRegex, consumeDelimiter)
      l.start()
      l
    })

  /** Background accept loop + bounded message log (the reference's
    * max-queue-size concurrent queue, NetworkListenerProcessor.cpp:71).
    * Bounded two ways, like the reference: messages arriving while the
    * queue holds `maxQueueSize` uncommitted entries are dropped (the
    * reference logs and discards on a full ConcurrentQueue), and entries
    * at or below the committed offset are pruned on `commit` — so a
    * long-running stream holds at most one uncommitted window in memory.
    * Protocols: tcp (delimiter-framed), udp (datagram-framed), http
    * (ListenHTTP, extensions/civetweb/processors/ListenHTTP.h:66-85 —
    * one message per POST/PUT body on the base path). */
  private[sources] final class Listener(protocol: String, requestedPort: Int,
                                        delimiter: String,
                                        basePath: String = "/contentListener",
                                        maxQueueSize: Int = 10000,
                                        headersAttrRegex: Option[String] = None,
                                        consumeDelimiter: Boolean = true) {
    private val log = new ArrayBuffer[(Long, String, Int, String, Map[String, String])]()
    private val nextSeq = new AtomicLong(0L)
    @volatile private var droppedCount = 0L
    @volatile private var running = true
    private var serverSocket: ServerSocket = _
    private var udpSocket: DatagramSocket = _
    private var httpServer: com.sun.net.httpserver.HttpServer = _

    def port: Int = protocol match {
      case "udp"  => udpSocket.getLocalPort
      case "http" => httpServer.getAddress.getPort
      case _      => serverSocket.getLocalPort
    }

    private def append(sender: String, senderPort: Int, msg: String,
                       headers: Map[String, String] = Map.empty): Unit =
      log.synchronized {
        if (log.length >= maxQueueSize) droppedCount += 1  // full queue drops, as the reference
        else log += ((nextSeq.getAndIncrement(), sender, senderPort, msg, headers))
      }

    /** Entries are seq-ordered, so the range is a contiguous slice; with
      * commit-time pruning the scan is bounded by maxQueueSize. */
    def range(fromExclusive: Long,
              untilInclusive: Long): Seq[(Long, String, Int, String, Map[String, String])] =
      log.synchronized {
        val from = log.indexWhere(_._1 > fromExclusive)
        if (from < 0) Seq.empty
        else log.view.slice(from, log.length).takeWhile(_._1 <= untilInclusive).toSeq
      }

    /** Drop entries the stream has durably committed (<= seq). */
    def prune(upToInclusive: Long): Unit = log.synchronized {
      val keepFrom = log.indexWhere(_._1 > upToInclusive)
      if (keepFrom < 0) log.clear()
      else if (keepFrom > 0) log.remove(0, keepFrom)
    }

    def dropped: Long = droppedCount
    def queuedCount: Int = log.synchronized(log.length)
    def maxSeq: Long = nextSeq.get() - 1

    def start(): Unit = protocol match {
      case "http" =>
        httpServer = com.sun.net.httpserver.HttpServer.create(
          new InetSocketAddress(requestedPort), 0)
        // Method semantics per the reference battery (ListenHTTPTests.cpp:
        // 277-333): POST commits the body as a FlowFile; GET commits an
        // EMPTY FlowFile (a liveness probe that still flows); HEAD answers
        // 200 without committing; PUT/DELETE answer 405. Headers matching
        // HeadersAsAttributesRegex (whole-name, case-insensitive via
        // lowercased keys — the JDK server title-cases names) ride with
        // the message (ListenHTTPTests.cpp:354-394).
        httpServer.createContext(basePath, exchange => {
          // the request plane is the shared pure function the oracle row
          // `listen_http_envelope` pins — only the transport lives here
          import scala.jdk.CollectionConverters._
          val headers = exchange.getRequestHeaders.entrySet().asScala.toSeq
            .flatMap(e => e.getValue.asScala.map(v => e.getKey -> v))
          val body =
            if (exchange.getRequestMethod == "POST")
              new String(exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            else ""
          val r = NetFraming.httpEnvelope(exchange.getRequestMethod, headers,
            body, headersAttrRegex)
          if (r.committed)
            append(exchange.getRemoteAddress.getAddress.getHostAddress,
              exchange.getRemoteAddress.getPort, r.content, r.captured)
          exchange.sendResponseHeaders(r.status, -1)
          exchange.close()
        })
        httpServer.start()
      case "udp" =>
        udpSocket = new DatagramSocket(new InetSocketAddress(requestedPort))
        val t = new Thread(() => {
          val buf = new Array[Byte](65536)
          while (running) {
            try {
              val p = new DatagramPacket(buf, buf.length)
              udpSocket.receive(p)
              append(p.getAddress.getHostAddress, p.getPort,
                new String(p.getData, p.getOffset, p.getLength, StandardCharsets.UTF_8))
            } catch { case _: Exception if !running => }
          }
        }, s"graft-udp-listener")
        t.setDaemon(true); t.start()
      case _ =>
        serverSocket = new ServerSocket(requestedPort)
        val t = new Thread(() => {
          while (running) {
            try {
              val client = serverSocket.accept()
              val worker = new Thread(() => handleTcp(client))
              worker.setDaemon(true); worker.start()
            } catch { case _: Exception if !running => }
          }
        }, s"graft-tcp-listener")
        t.setDaemon(true); t.start()
    }

    /** Split the connection's byte stream on the (possibly multi-char)
      * delimiter via the shared framing plane (NetFraming.splitFrames —
      * the code the `listen_tcp_frames` oracle row pins); Consume
      * Delimiter (ListenTCP.h:77-79, default true) strips it from the
      * message, false keeps it (ListenTcpTests.cpp:290 "Custom delimiter"
      * battery). An unterminated tail at connection close is DISCARDED,
      * matching TcpServer.cpp:58-62's eof return. */
    private def handleTcp(client: Socket): Unit = {
      val sender = client.getInetAddress.getHostAddress
      val senderPort = client.getPort
      val in = client.getInputStream
      var carry = ""
      val bytes = new Array[Byte](8192)
      var n = in.read(bytes)
      while (n >= 0) {
        val (frames, rest) = NetFraming.splitFrames(
          carry + new String(bytes, 0, n, StandardCharsets.UTF_8),
          delimiter, consumeDelimiter)
        frames.foreach(append(sender, senderPort, _))
        carry = rest
        n = in.read(bytes)
      }
      client.close()
    }

    def stop(): Unit = {
      running = false
      if (serverSocket != null) serverSocket.close()
      if (udpSocket != null) udpSocket.close()
      if (httpServer != null) httpServer.stop(0)
      log.synchronized(log.clear())
    }
  }
}

private class NetListenerTable(name: String, protocol: String, port: Int,
                               delimiter: String, basePath: String,
                               maxQueueSize: Int,
                               headersAttrRegex: Option[String],
                               consumeDelimiter: Boolean,
                               maxRowsPerTrigger: Long = 0L)
  extends Table with SupportsRead {
  override def name(): String = s"listen:$protocol:$name"
  override def schema(): StructType = NetListenerSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = NetListenerSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new NetListenerStream(name, protocol, port, delimiter, basePath,
          maxQueueSize, headersAttrRegex, consumeDelimiter,
          maxRowsPerTrigger)
    }
}

private case class SeqOffset(json: String) extends Offset {
  lazy val seq: Long = json.toLong
}

private class NetListenerStream(name: String, protocol: String, port: Int,
                                delimiter: String, basePath: String,
                                maxQueueSize: Int,
                                headersAttrRegex: Option[String],
                                consumeDelimiter: Boolean,
                                maxRowsPerTrigger: Long = 0L)
  extends MicroBatchStream with SupportsAdmissionControl {
  private val listener =
    NetListenerSource.listenerFor(name, protocol, port, delimiter, basePath,
      maxQueueSize, headersAttrRegex, consumeDelimiter)

  override def initialOffset(): Offset = SeqOffset("-1")
  override def latestOffset(): Offset = SeqOffset(listener.maxSeq.toString)

  /** Per-trigger admission control: an explicit connection queue limit
    * caps each micro-batch at maxRowsPerTrigger messages past the start
    * offset; commit() prunes only delivered entries, so the rest drain on
    * subsequent triggers (same mapping as TailFileSource's
    * maxLinesPerTrigger). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = listener.maxSeq
    if (maxRowsPerTrigger <= 0) SeqOffset(latest.toString)
    else {
      val s = if (start == null) -1L else start.asInstanceOf[SeqOffset].seq
      SeqOffset(math.min(latest, s + maxRowsPerTrigger).toString)
    }
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    if (e <= s) Array.empty
    // the queued range travels inside the partition descriptor — the
    // listener's buffer lives with the driver, like the reference's queue
    else Array(NetBatchPartition(listener.range(s, e), listener.port))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new NetBatchReader(p.asInstanceOf[NetBatchPartition])

  // Committed entries are checkpoint-durable downstream — evict them so a
  // long-running listener holds only the uncommitted window (the reference
  // drains its queue on every onTrigger).
  override def commit(end: Offset): Unit =
    listener.prune(end.asInstanceOf[SeqOffset].seq)
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset = SeqOffset(json)
}

private case class NetBatchPartition(
    rows: Seq[(Long, String, Int, String, Map[String, String])],
    localPort: Int)
  extends InputPartition

private class NetBatchReader(p: NetBatchPartition) extends PartitionReader[InternalRow] {
  private var idx = -1
  override def next(): Boolean = { idx += 1; idx < p.rows.length }
  override def get(): InternalRow = {
    val (seq, sender, senderPort, msg, headers) = p.rows(idx)
    val ks = headers.keys.toArray.map(k => UTF8String.fromString(k): Any)
    val vs = headers.keys.toArray
      .map(k => UTF8String.fromString(headers(k)): Any)
    InternalRow(seq, UTF8String.fromString(sender), senderPort, p.localPort,
      UTF8String.fromString(msg),
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vs)))
  }
  override def close(): Unit = ()
}

/**
 * GetTCP (GetTCP.h:61-68): the CLIENT side — connect to a list of
 * `host:port` endpoints, read delimiter-framed messages. Batch shape:
 * endpoints distribute across partitions, one connection per endpoint,
 * messages become rows.
 *
 * Message semantics per the reference battery (GetTCPTests.cpp:154-225):
 * each message KEEPS its trailing Message Delimiter ("Hello\n"); a message
 * longer than Max Message Size splits into max-size chunks that ALL route
 * to `partial` — including the delimiter-terminated tail chunk — while a
 * message within the cap routes to `success`. Max Message Size 0 disables
 * chunking. An unterminated tail at stream close is DISCARDED
 * (GetTCP.cpp:197-201 returns the read error before enqueuing). The
 * framing itself is the shared NetFraming.getTcpMessages plane, pinned by
 * the `get_tcp_frames` oracle row.
 */
object GetTcp {
  def read(endpoints: Dataset[String],
           delimiter: String = "\n"): Dataset[(String, String)] = {
    implicit val enc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    readRouted(endpoints, delimiter).map(r => (r._1, r._2))
  }

  /** (endpoint, message, relationship) rows with the partial/success
    * routing above. */
  def readRouted(endpoints: Dataset[String], delimiter: String = "\n",
                 maxMessageSize: Int = 0): Dataset[(String, String, String)] = {
    implicit val enc: Encoder[(String, String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING)
    endpoints.mapPartitions { eps =>
      eps.flatMap { ep =>
        val Array(host, port) = ep.split(":", 2)
        val sock = new Socket(host, port.toInt)
        try {
          val all = new String(sock.getInputStream.readAllBytes(),
            StandardCharsets.UTF_8)
          NetFraming.getTcpMessages(all, delimiter, maxMessageSize)
            .map { case (m, rel) => (ep, m, rel) }
        } finally sock.close()
      }
    }
  }
}
