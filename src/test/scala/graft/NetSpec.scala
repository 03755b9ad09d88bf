package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import graft.sources.{GetTcp, NetListenerSource}

/** Socket-plane tests over loopback: ListenTCP framing, ListenUDP
  * datagrams, GetTCP client reads (ListenTCP.h:41-91, GetTCP.h:61). */
class NetSpec extends SparkSpec {

  test("ListenTCP: delimiter framing across connections, streamed offsets") {
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "t1").option("protocol", "tcp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName("tcp_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // binds the listener
      val port = NetListenerSource.boundPort("t1")

      val c1 = new Socket(InetAddress.getLoopbackAddress, port)
      c1.getOutputStream.write("m1\nm2\ndangling".getBytes(StandardCharsets.UTF_8))
      c1.getOutputStream.flush()
      // close WITHOUT a final delimiter: the unterminated tail is
      // discarded, as the reference's readLoop returns on eof before
      // enqueuing the partial buffer (TcpServer.cpp:58-62)
      c1.close()
      val c2 = new Socket(InetAddress.getLoopbackAddress, port)
      c2.getOutputStream.write("other\n".getBytes(StandardCharsets.UTF_8))
      c2.close()

      eventually(40, 250) {
        q.processAllAvailable()
        val msgs = spark.table("tcp_in").collect()
          .map(_.getAs[String]("message")).toSet
        msgs == Set("m1", "m2", "other")
      }
    } finally q.stop()
  }

  test("ListenUDP: one message per datagram") {
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "u1").option("protocol", "udp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName("udp_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("u1")
      val sock = new DatagramSocket()
      Seq("d1", "d2 with spaces").foreach { m =>
        val b = m.getBytes(StandardCharsets.UTF_8)
        sock.send(new DatagramPacket(b, b.length, InetAddress.getLoopbackAddress, port))
      }
      sock.close()
      eventually(40, 250) {
        q.processAllAvailable()
        spark.table("udp_in").collect()
          .map(_.getAs[String]("message")).toSet == Set("d1", "d2 with spaces")
      }
    } finally q.stop()
  }

  test("ListenHTTP method battery: POST commits the body, GET commits an " +
       "empty FlowFile, HEAD answers without committing, PUT/DELETE are " +
       "405 (ListenHTTPTests.cpp:277-333)") {
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "h1").option("protocol", "http")
      .option("port", "0").option("basePath", "/contentListener")
      .load()
      .writeStream.format("memory").queryName("http_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("h1")
      val client = java.net.http.HttpClient.newHttpClient()
      def send(method: String, body: String): Int = {
        val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/contentListener"))
          .method(method, java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
          .statusCode()
      }
      assert(send("POST", "Test payload") === 200)
      assert(send("PUT", "put payload") === 405)
      assert(send("DELETE", "") === 405)
      assert(send("HEAD", "") === 200)
      assert(send("GET", "") === 200)
      eventually(40, 250) {
        q.processAllAvailable()
        // exactly two committed requests: the POST body and the GET's
        // empty message — PUT/DELETE/HEAD commit nothing
        spark.table("http_in").collect()
          .map(_.getAs[String]("message")).sorted.toSeq ==
          Seq("", "Test payload")
      }
    } finally q.stop()
  }

  test("ListenHTTP headers-as-attributes regex captures matching request " +
       "headers (ListenHTTPTests.cpp:354-394)") {
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "h2").option("protocol", "http")
      .option("port", "0").option("basePath", "/contentListener")
      .option("headersAttrRegex", "f.*")
      .load()
      .writeStream.format("memory").queryName("http_hdr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("h2")
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port/contentListener"))
        .header("foo", "1").header("bar", "2")
        .method("POST",
          java.net.http.HttpRequest.BodyPublishers.ofString("Test payload"))
        .build()
      assert(client.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode() === 200)
      eventually(40, 250) {
        q.processAllAvailable()
        val rows = spark.table("http_hdr").collect()
        rows.nonEmpty && {
          val h = rows.head.getMap[String, String](
            rows.head.fieldIndex("headers")).toMap
          h.get("foo").contains("1") && !h.contains("bar")
        }
      }
    } finally q.stop()
  }

  test("GetTCP: messages keep their delimiter; Max Message Size chunks " +
       "oversized messages to partial (GetTCPTests.cpp:154-225)") {
    import spark.implicits._
    def serve(payload: String): ServerSocket = {
      val server = new ServerSocket(0)
      val t = new Thread(() => {
        var served = 0
        while (served < 8) {
          try {
            val c = server.accept()
            c.getOutputStream.write(payload.getBytes(StandardCharsets.UTF_8))
            c.close(); served += 1
          } catch { case _: Exception => served = 8 }
        }
      })
      t.setDaemon(true); t.start()
      server
    }
    // delimiter stays on each message (reference: content == "Hello\n")
    val s1 = serve("a\nb\nc\n")
    try {
      val out = GetTcp.read(Seq(s"127.0.0.1:${s1.getLocalPort}").toDS())
        .collect().map(_._2).toSeq
      assert(out === Seq("a\n", "b\n", "c\n"))
    } finally s1.close()

    // the battery's too-large case: delimiter '\r', max size 10 — the
    // 27-char message chunks to partial (incl. its delimiter-bearing
    // tail); "Bye\r" fits and routes success
    val s2 = serve("abcdefghijklmnopqrstuvwxyz\rBye\r")
    try {
      val out = GetTcp.readRouted(Seq(s"127.0.0.1:${s2.getLocalPort}").toDS(),
        delimiter = "\r", maxMessageSize = 10)
        .collect().map(r => (r._2, r._3)).toSeq
      assert(out === Seq(
        ("abcdefghij", "partial"), ("klmnopqrst", "partial"),
        ("uvwxyz\r", "partial"), ("Bye\r", "success")))
    } finally s2.close()
  }

  test("ListenTCP max queue size: messages beyond the cap are dropped, " +
       "the retained window flows (ListenTcpTests.cpp:80-112)") {
    import org.apache.spark.sql.streaming.Trigger
    def drain(q: String): Long = {
      val query = spark.readStream.format("graft.sources.NetListenerSource")
        .option("name", "qcap").option("protocol", "tcp").option("port", "0")
        .option("maxQueueSize", "50")
        .load()
        .writeStream.format("memory").queryName(q)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      query.awaitTermination()
      spark.table(q).count()
    }
    assert(drain("qcap_bind") === 0) // binds the listener, nothing queued
    val port = NetListenerSource.boundPort("qcap")
    for (i <- 0 until 100) {
      val c = new Socket(InetAddress.getLoopbackAddress, port)
      c.getOutputStream.write(s"test_message_$i\n".getBytes(StandardCharsets.UTF_8))
      c.close()
    }
    // no query ran while sending: the 50-entry queue filled, the rest
    // dropped (the reference logs "Queue is full. TCP message ignored."
    // 50 times); wait for every handler to account for its message, then
    // one drain delivers exactly the retained window
    eventually(40, 250) {
      val (queued, dropped) = NetListenerSource.queueStats("qcap")
      queued + dropped == 100
    }
    assert(NetListenerSource.queueStats("qcap") === ((50, 50L)))
    assert(drain("qcap_out") === 50)
  }

  test("ListenTCP admission control: maxRowsPerTrigger bounds every " +
       "micro-batch while the queued backlog drains completely") {
    def start(q: String) = spark.readStream
      .format("graft.sources.NetListenerSource")
      .option("name", "rowcap").option("protocol", "tcp").option("port", "0")
      .option("maxQueueSize", "500")
      .option("maxRowsPerTrigger", "12")
      .load()
      .writeStream.format("memory").queryName(q).outputMode("append").start()
    val bind = start("rowcap_bind"); bind.processAllAvailable(); bind.stop()
    val port = NetListenerSource.boundPort("rowcap")
    for (i <- 0 until 40) {
      val c = new Socket(InetAddress.getLoopbackAddress, port)
      c.getOutputStream.write(s"m$i\n".getBytes(StandardCharsets.UTF_8))
      c.close()
    }
    eventually(40, 250) {
      NetListenerSource.queueStats("rowcap")._1 == 40
    }
    val query = start("rowcap_out")
    query.processAllAvailable()
    val batches = query.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    query.stop()
    assert(spark.table("rowcap_out").count() === 40)
    assert(batches.size >= 4, s"expected >=4 capped batches, got $batches")
    assert(batches.forall(_ <= 12), s"a batch exceeded the cap: $batches")
  }

  test("ListenUDP max queue size: datagrams beyond the cap are dropped, " +
       "the retained window flows (ListenUDPTests.cpp:86-119)") {
    import org.apache.spark.sql.streaming.Trigger
    def drain(q: String): Long = {
      val query = spark.readStream.format("graft.sources.NetListenerSource")
        .option("name", "uqcap").option("protocol", "udp").option("port", "0")
        .option("maxQueueSize", "50")
        .load()
        .writeStream.format("memory").queryName(q)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      query.awaitTermination()
      spark.table(q).count()
    }
    assert(drain("uqcap_bind") === 0)
    val port = NetListenerSource.boundPort("uqcap")
    val sock = new java.net.DatagramSocket()
    try {
      val addr = InetAddress.getLoopbackAddress
      for (i <- 0 until 100) {
        val b = "test_message".getBytes(StandardCharsets.UTF_8)
        sock.send(new java.net.DatagramPacket(b, b.length, addr, port))
      }
    } finally sock.close()
    // UDP is lossy even on loopback, so the total accounted may fall a
    // hair short of 100 — but the queue must never exceed the cap, and
    // everything past the cap must be counted dropped, not queued
    eventually(40, 250) {
      val (queued, dropped) = NetListenerSource.queueStats("uqcap")
      queued == 50 && dropped >= 40
    }
    assert(drain("uqcap_out") === 50)
  }

  test("ListenTCP custom delimiters: multi-char and multi-byte delimiters " +
       "with Consume Delimiter on/off (ListenTcpTests.cpp:290-316)") {
    for ((delim, consume, name) <- Seq(
      ("foo\nbar", true, "tcd1"), ("💩", false, "tcd2"))) {
      val q = spark.readStream.format("graft.sources.NetListenerSource")
        .option("name", name).option("protocol", "tcp").option("port", "0")
        .option("delimiter", delim)
        .option("consumeDelimiter", consume.toString)
        .load()
        .writeStream.format("memory").queryName(s"tcp_$name")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val port = NetListenerSource.boundPort(name)
        val c = new Socket(InetAddress.getLoopbackAddress, port)
        c.getOutputStream.write(
          (s"test_message_1${delim}another_message$delim")
            .getBytes(StandardCharsets.UTF_8))
        c.close()
        val want =
          if (consume) Set("test_message_1", "another_message")
          else Set(s"test_message_1$delim", s"another_message$delim")
        eventually(40, 250) {
          q.processAllAvailable()
          spark.table(s"tcp_$name").collect()
            .map(_.getAs[String]("message")).toSet == want
        }
      } finally q.stop()
    }
  }

  test("end-to-end ListenSyslog flow: TCP listener -> syslog dispatch -> " +
       "relationship-partitioned sink (the reference's flagship path)") {
    import graft.ops.Syslog
    val ckpt = java.nio.file.Files.createTempDirectory("sys_ckpt")
    val out = java.nio.file.Files.createTempDirectory("sys_out")
    val listened = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "sysl").option("protocol", "tcp").option("port", "0")
      .load()
    val parsed = Syslog.parseSyslog(listened, org.apache.spark.sql.functions.col("message"))
    val writer = graft.streaming.FlowRuntime.relationshipSink(parsed, out.toString)
    val q = writer.option("checkpointLocation", ckpt.toString).start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("sysl")
      val c = new Socket(InetAddress.getLoopbackAddress, port)
      c.getOutputStream.write(
        ("<34>1 2026-08-12T22:14:15.003Z host app 1234 ID47 - hello\n" +
         "<13>Feb  5 17:32:18 mymachine legacy payload\n" +
         "not syslog\n").getBytes(StandardCharsets.UTF_8))
      c.close()
      eventually(40, 250) {
        q.processAllAvailable()
        new java.io.File(s"$out/relationship=success").exists() &&
          new java.io.File(s"$out/relationship=invalid").exists()
      }
      val success = spark.read.parquet(s"$out/relationship=success")
      assert(success.count() === 2)
      assert(success.select("syslog_format").collect().map(_.getString(0)).sorted
        === Array("rfc3164", "rfc5424"))
      assert(spark.read.parquet(s"$out/relationship=invalid").count() === 1)
    } finally q.stop()
  }

  test("NetFraming pure planes: delimiter split, EOF discard, GetTCP " +
       "chunking battery, HTTP envelope dispatch") {
    import graft.sources.NetFraming
    // incremental carry: delimiter split across reads
    assert(NetFraming.splitFrames("m1\nm2\npart", "\n", consumeDelimiter = true)
      === ((Vector("m1", "m2"), "part")))
    assert(NetFraming.splitFrames("m1\nm2\n", "\n", consumeDelimiter = false)
      === ((Vector("m1\n", "m2\n"), "")))
    // consecutive delimiters emit empty frames; EOF discards the tail
    assert(NetFraming.connectionFrames("a\n\nb", "\n", consumeDelimiter = true)
      === Vector("a", ""))
    // multi-char delimiter
    assert(NetFraming.connectionFrames("xfoobaryfoobar", "foobar", consumeDelimiter = false)
      === Vector("xfoobar", "yfoobar"))
    // the GetTCPTests.cpp:185-225 battery, as a pure plane
    assert(NetFraming.getTcpMessages("abcdefghijklmnopqrstuvwxyz\rBye\r", "\r", 10)
      === Vector(("abcdefghij", "partial"), ("klmnopqrst", "partial"),
        ("uvwxyz\r", "partial"), ("Bye\r", "success")))
    assert(NetFraming.getTcpMessages("Hello\n", "\n", 0)
      === Vector(("Hello\n", "success")))
    assert(NetFraming.getTcpMessages("Hello\nleftover", "\n", 0)
      === Vector(("Hello\n", "success"))) // tail discarded
    // HTTP dispatch (ListenHTTPTests.cpp:277-394)
    val post = NetFraming.httpEnvelope("POST",
      Seq("Foo" -> "1", "Bar" -> "2", "foo" -> "3"), "body", Some("f.*"))
    assert(post === NetFraming.HttpResult(200, committed = true, "body",
      Map("foo" -> "1,3")))
    assert(NetFraming.httpEnvelope("GET", Seq("foo" -> "1"), "", Some("f.*"))
      === NetFraming.HttpResult(200, committed = true, "", Map("foo" -> "1")))
    assert(NetFraming.httpEnvelope("HEAD", Seq("foo" -> "1"), "", Some("f.*"))
      === NetFraming.HttpResult(200, committed = false, "", Map.empty))
    assert(NetFraming.httpEnvelope("DELETE", Nil, "", None)
      === NetFraming.HttpResult(405, committed = false, "", Map.empty))
    // full-match anchoring: "oo.*" must NOT capture "foo"
    assert(NetFraming.httpEnvelope("POST", Seq("foo" -> "1"), "b", Some("oo.*"))
      .captured.isEmpty)
  }

  test("listener rows carry sender/local ports; envelope() stamps the " +
       "reference attribute names (ListenTCP.cpp:46-47, ListenUDP.h:66-68)") {
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "env1").option("protocol", "udp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName("udp_env")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("env1")
      val sock = new DatagramSocket()
      val b = "dgram".getBytes(StandardCharsets.UTF_8)
      sock.send(new DatagramPacket(b, b.length, InetAddress.getLoopbackAddress, port))
      val senderPort = sock.getLocalPort
      sock.close()
      eventually(40, 250) {
        q.processAllAvailable()
        spark.table("udp_env").count() == 1
      }
      val row = NetListenerSource.envelope(spark.table("udp_env"), "udp")
        .selectExpr("message", "attrs['udp.port']", "attrs['udp.sender']",
          "attrs['udp.sender.port']")
        .collect().head
      assert(row.getString(0) === "dgram")
      assert(row.getString(1) === port.toString)
      assert(row.getString(2) === InetAddress.getLoopbackAddress.getHostAddress)
      assert(row.getString(3) === senderPort.toString)
    } finally q.stop()
  }

  private def eventually(attempts: Int, sleepMs: Long)(cond: => Boolean): Unit = {
    var i = 0
    while (i < attempts && !cond) { Thread.sleep(sleepMs); i += 1 }
    assert(cond, s"condition not met after $attempts attempts")
  }
}
