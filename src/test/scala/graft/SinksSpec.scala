package graft

import org.apache.spark.sql.functions._
import graft.sources.{NetListenerSource, Sinks}

/** Outbound sink tests: PutTCP/PutUDP over loopback (against the
  * NetListener sources), and the HTTP sink payload contracts. */
class SinksSpec extends SparkSpec {

  test("PutTCP delivers rows to a TCP listener (PutTCP.cpp)") {
    import spark.implicits._
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "sink_t").option("protocol", "tcp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName("put_tcp_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("sink_t")
      val sent = Sinks.putTcp(Seq("x1", "x2", "x3").toDS(), "127.0.0.1", port)
      assert(sent === 3L)
      eventually(40, 250) {
        q.processAllAvailable()
        spark.table("put_tcp_in").collect()
          .map(_.getAs[String]("message")).toSet == Set("x1", "x2", "x3")
      }
    } finally q.stop()
  }

  test("PutUDP sends one datagram per row (PutUDP.cpp)") {
    import spark.implicits._
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "sink_u").option("protocol", "udp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName("put_udp_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("sink_u")
      val sent = Sinks.putUdp(Seq("d1", "d2").toDS(), "127.0.0.1", port)
      assert(sent === 2L)
      eventually(40, 250) {
        q.processAllAvailable()
        spark.table("put_udp_in").collect()
          .map(_.getAs[String]("message")).toSet == Set("d1", "d2")
      }
    } finally q.stop()
  }

  test("PostElasticsearch _bulk payload shape (PostElasticsearch.cpp:59-135)") {
    val df = spark.createDataFrame(Seq(
      (1L, "index", """{"f":1}"""),
      (2L, "delete", """{"f":2}"""),
      (3L, "create", """{"f":3}"""))).toDF("id", "action", "doc")
    val lines = df.select(col("id"), Sinks.esBulkLines(col("action"), lit("idx1"),
      col("id").cast("string"), col("doc")).as("line"))
    val got = lines.orderBy("id").collect().map(_.getAs[String]("line")).toSeq
    assert(got(0) === "{\"index\":{\"_index\":\"idx1\",\"_id\":\"1\"}}\n{\"f\":1}")
    assert(got(1) === "{\"delete\":{\"_index\":\"idx1\",\"_id\":\"2\"}}") // no doc line
    assert(got(2) === "{\"create\":{\"_index\":\"idx1\",\"_id\":\"3\"}}\n{\"f\":3}")

    val body = lines.agg(Sinks.esBulkBody(col("line"), col("id"))).collect()(0).getString(0)
    assert(body.endsWith("\n")) // _bulk bodies are newline-terminated
    assert(body.linesIterator.size === 5) // 2 + 1 + 2 lines
  }

  test("Splunk HEC event payload (PutSplunkHTTP.cpp:40-60)") {
    val df = spark.createDataFrame(Seq(Tuple1("msg with \"quotes\""))).toDF("raw")
    val plain = df.select(Sinks.splunkHecEvent(col("raw"))).collect()(0).getString(0)
    assert(plain === """{"event":{"raw":"msg with \"quotes\""}}""")
    val withMeta = df.select(Sinks.splunkHecEvent(col("raw"),
      sourceType = Some("st"), index = Some("main"))).collect()(0).getString(0)
    assert(withMeta ===
      """{"sourcetype":"st","index":"main","event":{"raw":"msg with \"quotes\""}}""")
  }

  test("Loki push body: label stream with ns timestamps, ordered values " +
       "(PushGrafanaLokiREST.cpp:105-147)") {
    val df = spark.createDataFrame(Seq(
      (2000000L, "second \"line\""),
      (1000000L, "first line"))).toDF("ts", "line")
    val stream = df.agg(Sinks.lokiStream(Seq("job" -> "graft", "env" -> "test"),
      col("ts"), col("line")).as("s"))
    val body = stream.select(Sinks.lokiPushBody(col("s"))).collect()(0).getString(0)
    assert(body ===
      """{"streams":[{"stream":{"job":"graft","env":"test"},"values":[""" +
      """["1000000","first line"],["2000000","second \"line\""]]}]}""")
  }

  test("Loki log-line metadata: configured attributes present on the row " +
       "ride as each value's third element, {} when none matched " +
       "(PushGrafanaLokiRESTTest.cpp:233-244; PushGrafanaLokiREST.cpp:101-116)") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("ts", LongType),
      StructField("line", StringType),
      StructField("attrs", MapType(StringType, StringType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1000000L, "log line 1",
        Map("label1" -> "value1", "label4" -> "value4")),
      org.apache.spark.sql.Row(2000000L, "log line 2",
        Map("label1" -> "value1", "label2" -> "value2")),
      org.apache.spark.sql.Row(3000000L, "log line 3",
        Map.empty[String, String])).asJava, schema)
    val wanted = Seq("label1", "label2", "label3")
    val metadata = map_filter(col("attrs"),
      (k, _) => k.isin(wanted.map(lit(_)): _*))
    val stream = df.agg(Sinks.lokiStream(Seq("job" -> "graft"),
      col("ts"), col("line"), Some(metadata)).as("s"))
    val body = stream.select(Sinks.lokiPushBody(col("s")))
      .collect()(0).getString(0)
    // label4 is not in the configured list; line 3 has no matches → {}
    assert(body ===
      """{"streams":[{"stream":{"job":"graft"},"values":[""" +
      """["1000000","log line 1",{"label1":"value1"}],""" +
      """["2000000","log line 2",{"label1":"value1","label2":"value2"}],""" +
      """["3000000","log line 3",{}]]}]}""")
  }

  test("Loki gRPC push payload: StreamAdapter labels string (sorted keys, " +
       "escaped quotes) + ordered entries carry EXACTLY the REST body's " +
       "logical content (PushGrafanaLokiGrpc.cpp:38-54,117-136; " +
       "protos/grafana-loki-push.proto)") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("ts", LongType),
      StructField("line", StringType),
      StructField("attrs", MapType(StringType, StringType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(2000000L, "second \"line\"",
        Map("label1" -> "value1")),
      org.apache.spark.sql.Row(1000000L, "first line",
        Map.empty[String, String])).asJava, schema)
    val labels = Seq("job" -> "graft", "env" -> "va\"l")
    // the labels string: std::map order (sorted keys), \" escaping
    assert(Sinks.lokiGrpcLabels(labels) === """{env="va\"l", job="graft"}""")
    val grpcRow = df.agg(Sinks.lokiGrpcStream(labels, col("ts"), col("line"),
      Some(col("attrs"))).as("s")).select(col("s.*")).collect()(0)
    assert(grpcRow.getString(0) === """{env="va\"l", job="graft"}""")
    val entries = grpcRow.getSeq[org.apache.spark.sql.Row](1)
    // entries in timestamp order, (ts, line, name/value pairs)
    assert(entries.map(e => (e.getLong(0), e.getString(1))) ===
      Seq((1000000L, "first line"), (2000000L, "second \"line\"")))
    assert(entries(0).getSeq[org.apache.spark.sql.Row](2).isEmpty)
    assert(entries(1).getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getString(0), p.getString(1))) ===
      Seq(("label1", "value1")))
    // field-for-field equivalence with the REST plane on the same rows:
    // the REST values triples parse back to the gRPC entries exactly
    val restBody = df.agg(Sinks.lokiStream(labels, col("ts"), col("line"),
        Some(col("attrs"))).as("s"))
      .select(Sinks.lokiPushBody(col("s"))).collect()(0).getString(0)
    def jpath(p: String): String = spark.range(1)
      .select(get_json_object(lit(restBody), p)).collect()(0).getString(0)
    assert(entries.zipWithIndex.forall { case (e, i) =>
      jpath(s"$$.streams[0].values[$i][0]") == e.getLong(0).toString &&
        jpath(s"$$.streams[0].values[$i][1]") == e.getString(1)
    })
    assert(jpath("$.streams[0].values[0][2]") === "{}")
    assert(jpath("$.streams[0].values[1][2]") === """{"label1":"value1"}""")
  }

  test("Loki REST labels escape CONTROL characters like the reference's " +
       "rapidjson writer (short forms + \\u00XX), so a newline/tab/0x01 " +
       "in a label still yields a valid stream object") {
    import spark.implicits._
    val ctl = 1.toChar.toString              // a raw 0x01 control char
    val labels = Seq("job" -> "gr\naft", "env" -> ("a\tb" + ctl + "c"),
      "q" -> "sl\\as\"h")
    val body = Seq((1000000L, "line")).toDF("ts", "line")
      .agg(Sinks.lokiStream(labels, col("ts"), col("line")).as("s"))
      .select(Sinks.lokiPushBody(col("s"))).collect()(0).getString(0)
    assert(body.contains("\"job\":\"gr\\naft\""))
    assert(body.contains("\"env\":\"a\\tb\\u0001c\""))
    assert(body.contains("\"q\":\"sl\\\\as\\\"h\""))
    // the body must parse as JSON -- the r18 review finding was that a
    // control char produced an INVALID object
    def jpath(p: String): String = spark.range(1)
      .select(get_json_object(lit(body), p)).collect()(0).getString(0)
    assert(jpath("$.streams[0].stream.job") === "gr\naft")
    assert(jpath("$.streams[0].stream.env") === "a\tb" + ctl + "c")
    assert(jpath("$.streams[0].stream.q") === "sl\\as\"h")
  }

  test("Loki REST control-char escapes use UPPERCASE hex like rapidjson's " +
       "writer (0x1B -> \\u001B), byte-for-byte vs the reference") {
    import spark.implicits._
    val esc = 27.toChar.toString             // ESC = 0x1B exercises hex letters
    val body = Seq((1000000L, "line")).toDF("ts", "line")
      .agg(Sinks.lokiStream(Seq("env" -> ("a" + esc + "b")),
        col("ts"), col("line")).as("s"))
      .select(Sinks.lokiPushBody(col("s"))).collect()(0).getString(0)
    assert(body.contains("\"env\":\"a\\u001Bb\""))
    assert(!body.contains("\\u001b"))
  }

  test("Splunk ack polling: request body + per-id status routing " +
       "(QuerySplunkIndexingStatus.cpp:38,75)") {
    import spark.implicits._
    val body = Seq(Seq(1L, 7L, 42L)).toDF("ids")
      .select(Sinks.splunkAckRequestBody(col("ids"))).collect()(0).getString(0)
    assert(body === """{"acks":[1,7,42]}""")

    val resp = """{"acks":{"1":true,"7":false}}"""
    val rows = Seq(1L, 7L, 42L).toDF("ack_id")
      .select(col("ack_id"), Sinks.splunkAckStatus(lit(resp), col("ack_id")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "acknowledged"), (7L, "undetermined"),
      (42L, "failure")))
  }

  private def eventually(attempts: Int, sleepMs: Long)(cond: => Boolean): Unit = {
    var i = 0
    while (i < attempts && !cond) { Thread.sleep(sleepMs); i += 1 }
    assert(cond, s"condition not met after $attempts attempts")
  }

  test("PutTCP flow dispatch routes per-row delivery against a loopback " +
       "listener; unreachable port routes failure") {
    import graft.flow._
    val q = spark.readStream.format("graft.sources.NetListenerSource")
      .option("name", "flow_sink_t").option("protocol", "tcp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName("flow_put_tcp_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val port = NetListenerSource.boundPort("flow_sink_t")
      def run(p: Int): Seq[String] = {
        val yml =
          s"""MiNiFi Config Version: 3
             |Processors:
             |- name: gen
             |  id: g
             |  class: org.apache.nifi.minifi.processors.GenerateFlowFile
             |  Properties:
             |    Batch Size: '2'
             |    Custom Text: hello tcp
             |    Data Format: Text
             |    Unique FlowFiles: 'false'
             |- name: put
             |  id: p
             |  class: org.apache.nifi.minifi.processors.PutTCP
             |  auto-terminated relationships list: [success, failure]
             |  Properties:
             |    Hostname: 127.0.0.1
             |    Port: '$p'
             |Connections:
             |- {id: c, source id: g, source relationship names: [success], destination id: p}
             |""".stripMargin
        FlowRunner.run(spark, FlowConfig.parse(yml)).output("put")
          .select(col("relationship")).collect().map(_.getString(0)).toSeq
      }
      assert(run(port) === Seq("success", "success"))
      eventually(40, 250) {
        q.processAllAvailable()
        spark.table("flow_put_tcp_in").collect()
          .map(_.getAs[String]("message")).count(_ == "hello tcp") >= 2
      }
      // a closed port routes failure instead of failing the job
      val deadPort = { val s = new java.net.ServerSocket(0)
        val p = s.getLocalPort; s.close(); p }
      assert(run(deadPort) === Seq("failure", "failure"))
    } finally q.stop()
  }

  test("PutTCP fans out over multiple servers via an EL port property, " +
       "and an invalid host routes failure (PutTCPTests.cpp:355-487)") {
    import graft.flow._
    // two loopback listeners; each FlowFile carries its target port in
    // the tcp_port attribute, the processor's Port property is EL
    def startListener(name: String, table: String) = spark.readStream
      .format("graft.sources.NetListenerSource")
      .option("name", name).option("protocol", "tcp").option("port", "0")
      .load()
      .writeStream.format("memory").queryName(table)
      .outputMode("append").start()
    val q1 = startListener("multi_a", "multi_a_in")
    val q2 = startListener("multi_b", "multi_b_in")
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val portA = graft.sources.NetListenerSource.boundPort("multi_a")
      val portB = graft.sources.NetListenerSource.boundPort("multi_b")
      def yml(updateProps: String) =
        s"""MiNiFi Config Version: 3
           |Processors:
           |- name: gen
           |  id: g
           |  class: org.apache.nifi.minifi.processors.GenerateFlowFile
           |  Properties: {Batch Size: '1', Custom Text: probe, Data Format: Text, Unique FlowFiles: 'false'}
           |- name: upd
           |  id: u
           |  class: org.apache.nifi.minifi.processors.UpdateAttribute
           |  Properties:
           |$updateProps
           |- name: put
           |  id: p
           |  class: org.apache.nifi.minifi.processors.PutTCP
           |  auto-terminated relationships list: [success, failure]
           |  Properties:
           |    Hostname: $${tcp_host}
           |    Port: $${tcp_port}
           |Connections:
           |- {id: c1, source id: g, source relationship names: [success], destination id: u}
           |- {id: c2, source id: u, source relationship names: [success], destination id: p}
           |""".stripMargin
      def run(host: String, port: String): String =
        FlowRunner.run(spark, FlowConfig.parse(yml(
          s"    tcp_host: '$host'\n    tcp_port: '$port'")))
          .output("put").select(col("relationship")).collect()(0).getString(0)
      // one processor, two servers — the EL port picks the destination
      assert(run("127.0.0.1", portA.toString) === "success")
      assert(run("127.0.0.1", portB.toString) === "success")
      eventually(40, 250) {
        q1.processAllAvailable(); q2.processAllAvailable()
        spark.table("multi_a_in").collect()
          .exists(_.getAs[String]("message") == "probe") &&
        spark.table("multi_b_in").collect()
          .exists(_.getAs[String]("message") == "probe")
      }
      // invalid-host / unparseable-port corners route failure
      // (PutTCPTests.cpp "invalid host" / "invalid server")
      assert(run("invalid_hostname_that_does_not_resolve", portA.toString)
        === "failure")
      assert(run("127.0.0.1", "not_a_port") === "failure")
    } finally { q1.stop(); q2.stop() }
  }
}
