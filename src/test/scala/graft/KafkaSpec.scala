package graft

import org.apache.spark.sql.functions._
import graft.sources.Kafka

/** ConsumeKafka/PublishKafka option mapping + envelope projection tests —
  * no broker needed: the mapped strings and the header Columns are the
  * deliverable (ConsumeKafka.h:93-233, PublishKafka.h:57-215). */
class KafkaSpec extends SparkSpec {

  test("consumeOptions: names vs patterns, offsets, transactions, group id") {
    val names = Kafka.consumeOptions(Kafka.ConsumeProps(
      brokers = "b1:9092,b2:9092", topicNames = Seq("t1", "t2"),
      groupId = "g1", offsetReset = "earliest", honorTransactions = true,
      maxPollRecords = 500))
    assert(names("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    assert(names("subscribe") === "t1,t2")
    assert(!names.contains("subscribePattern"))
    assert(names("startingOffsets") === "earliest")
    assert(names("kafka.isolation.level") === "read_committed")
    assert(names("kafka.group.id") === "g1")
    assert(names("maxOffsetsPerTrigger") === "500")

    val pats = Kafka.consumeOptions(Kafka.ConsumeProps(
      brokers = "b:9092", topicNames = Seq("lo.*", "hi.*"),
      topicNameFormat = "Patterns", honorTransactions = false))
    assert(pats("subscribePattern") === "lo.*|hi.*")
    assert(!pats.contains("subscribe"))
    assert(pats("startingOffsets") === "latest")
    assert(pats("kafka.isolation.level") === "read_uncommitted")
    assert(!pats.contains("kafka.group.id"))
  }

  test("publishOptions: delivery guarantee and producer caps") {
    val opts = Kafka.publishOptions(Kafka.PublishProps(
      brokers = "b:9092", topic = "out", deliveryGuarantee = "all",
      compressCodec = "gzip"))
    assert(opts("topic") === "out")
    assert(opts("kafka.acks") === "all")
    assert(opts("kafka.compression.type") === "gzip")
  }

  test("header projection honors duplicate-header policy " +
       "(ConsumeKafka.h:185-196)") {
    // stand-in for the connector's headers ARRAY<STRUCT<key,value BINARY>>
    val df = spark.sql(
      """SELECT array(
        |  named_struct('key', 'h1', 'value', CAST('first' AS BINARY)),
        |  named_struct('key', 'h2', 'value', CAST('only' AS BINARY)),
        |  named_struct('key', 'h1', 'value', CAST('last' AS BINARY))
        |) AS headers""".stripMargin)
    def get(name: String, policy: String): String =
      df.select(Kafka.headerAttr(col("headers"), name, policy)).collect()(0).getString(0)
    assert(get("h1", "KEEP_FIRST") === "first")
    assert(get("h1", "KEEP_LATEST") === "last")
    assert(get("h1", "COMMA_SEPARATED_MERGE") === "first, last")
    assert(get("h2", "KEEP_LATEST") === "only")
    assert(get("missing", "KEEP_LATEST") === null)
    assert(get("missing", "COMMA_SEPARATED_MERGE") === null)
  }

  test("attrsToHeaders builds the producer headers array from attributes " +
       "(PublishKafka.h:125)") {
    val df = flowFrame(Seq(("payload", Map("a" -> "1", "b" -> "2"))))
    val rows = df.select(explode(Kafka.attrsToHeaders(
        col(graft.core.FlowFrame.Attributes), Seq("a", "missing", "b"))).as("h"))
      .select(col("h.key"), col("h.value").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("a", "1"), ("b", "2"))) // absent attr -> no header
  }

  test("MQTT option mapping covers the connection + subscribe surface " +
       "(AbstractMQTTProcessor.h:98-167)") {
    import graft.sources.Mqtt
    val conn = Mqtt.ConnectionProps("tcp://broker:1883", clientId = "c1",
      qos = 1, cleanSession = false, username = "u")
    val consume = Mqtt.consumeOptions(conn, "sensors/#", "/tmp/mqtt-store")
    assert(consume("brokerUrl") === "tcp://broker:1883")
    assert(consume("topic") === "sensors/#")
    assert(consume("QoS") === "1")
    assert(consume("cleanSession") === "false")
    assert(consume("clientId") === "c1")
    assert(consume("username") === "u")
    assert(!consume.contains("password"))
    assert(consume("localStorage") === "/tmp/mqtt-store")

    val publish = Mqtt.publishOptions(conn, "alerts", retain = true)
    assert(publish("topic") === "alerts")
    assert(publish("retained") === "true")
  }

  test("ConsumeMQTT validation battery: topic/broker errors, QoS-0 durable " +
       "warning per version, version-foreign property warnings " +
       "(ConsumeMQTTTests.cpp:134-245)") {
    import graft.sources.Mqtt
    def conn(qos: Int = 0, version: String = "3.1.1",
             cleanSession: Boolean = true) =
      Mqtt.ConnectionProps("127.0.0.1:1883", clientId = "subscriber",
        qos = qos, mqttVersion = version, cleanSession = cleanSession)

    // EmptyTopic / EmptyBrokerURI
    assert(Mqtt.validateConsume(conn(), "").errors
      .exists(_.contains("\"Topic\"")))
    assert(Mqtt.validateConsume(
      Mqtt.ConnectionProps(""), "mytopic").errors
      .exists(_.contains("\"Broker URI\"")))

    // DurableSessionWithID: QoS 1 durable → no warning
    assert(Mqtt.validateConsume(conn(qos = 1, cleanSession = false),
      "mytopic").warnings.isEmpty)
    // DurableSessionWithQoS0: QoS 0 durable → the 3.x warning text
    assert(Mqtt.validateConsume(conn(qos = 0, cleanSession = false),
      "mytopic").warnings === Seq(
      "Messages are not preserved during client disconnection by the " +
        "broker when QoS is less than 1 for durable (non-clean) sessions. " +
        "Only subscriptions are preserved."))
    // V5 variants keyed on Session Expiry Interval
    assert(Mqtt.validateConsume(conn(qos = 1, version = "5.0"), "mytopic",
      sessionExpirySec = Some(3600)).warnings.isEmpty)
    assert(Mqtt.validateConsume(conn(qos = 0, version = "5.0"), "mytopic",
      sessionExpirySec = Some(3600)).warnings === Seq(
      "Messages are not preserved during client disconnection by the " +
        "broker when QoS is less than 1 for durable " +
        "(Session Expiry Interval > 0) sessions. " +
        "Only subscriptions are preserved."))

    // version-foreign properties warn and are not used
    assert(Mqtt.validateConsume(conn(), "mytopic", cleanStartSet = true)
      .warnings === Seq("MQTT 3.x specification does not support Clean " +
      "Start. Property is not used."))
    assert(Mqtt.validateConsume(conn(), "mytopic",
      sessionExpirySec = Some(3600)).warnings === Seq("MQTT 3.x " +
      "specification does not support Session Expiry Intervals. " +
      "Property is not used."))
    assert(Mqtt.validateConsume(conn(), "mytopic",
      topicAliasMaximum = Some(1)).warnings === Seq("MQTT 3.x " +
      "specification does not support Topic Alias Maximum. " +
      "Property is not used."))
    assert(Mqtt.validateConsume(conn(), "mytopic",
      receiveMaximum = Some(1)).warnings === Seq("MQTT 3.x specification " +
      "does not support Receive Maximum. Property is not used."))
    assert(Mqtt.validateConsume(conn(version = "5.0"), "mytopic",
      sessionExpirySec = Some(0), cleanSessionSet = true).warnings ===
      Seq("MQTT 5.0 specification does not support Clean Session. " +
        "Property is not used."))
  }

  test("ConsumeKafka conformance table: every property and enum value " +
       "(ConsumeKafka.h:40-46,93-235; KafkaProcessorBase.h:34-90) maps to " +
       "a connector option, a projection/transform, or a documented " +
       "rejection") {
    import Kafka._
    def opts(f: ConsumeProps => ConsumeProps): Map[String, String] =
      consumeOptions(f(ConsumeProps("b:9092", Seq("t"))))
    val headersDf = spark.sql(
      """SELECT array(
        |  named_struct('key', 'h', 'value', CAST('x' AS BINARY)),
        |  named_struct('key', 'h', 'value', CAST('y' AS BINARY))
        |) AS headers""".stripMargin)
    val recordsDf = spark.sql(
      """SELECT * FROM VALUES
        | ('t', 0, CAST(5 AS LONG), CAST('m1' AS BINARY), CAST('k' AS BINARY), CAST('2026-01-01' AS TIMESTAMP)),
        | ('t', 0, CAST(7 AS LONG), CAST('m2' AS BINARY), CAST('k' AS BINARY), CAST('2026-01-01' AS TIMESTAMP)),
        | ('t', 1, CAST(3 AS LONG), CAST('m3' AS BINARY), CAST('k' AS BINARY), CAST('2026-01-01' AS TIMESTAMP))
        |AS t(topic, partition, offset, value, key, timestamp)""".stripMargin)
    val table: Seq[(String, () => Unit)] = Seq(
      "Kafka Brokers" -> (() =>
        assert(opts(identity)("kafka.bootstrap.servers") === "b:9092")),
      "Topic Names" -> (() => assert(opts(identity)("subscribe") === "t")),
      "Topic Name Format" -> { () => // enum: Names | Patterns
        assert(opts(identity).contains("subscribe"))
        assert(opts(_.copy(topicNameFormat = "Patterns"))
          .contains("subscribePattern"))
      },
      "Honor Transactions" -> { () => // bool → isolation.level
        assert(opts(identity)("kafka.isolation.level") === "read_committed")
        assert(opts(_.copy(honorTransactions = false))("kafka.isolation.level")
          === "read_uncommitted")
      },
      "Group ID" -> (() =>
        assert(opts(_.copy(groupId = "g"))("kafka.group.id") === "g")),
      "Offset Reset" -> { () => // enum: earliest | latest | none
        assert(opts(_.copy(offsetReset = "earliest"))("startingOffsets") === "earliest")
        assert(opts(identity)("startingOffsets") === "latest")
        // none = fail when no/expired offset: failOnDataLoss carries the
        // mid-stream half only — first run on a fresh checkpoint starts
        // at latest (documented residual gap, Kafka.scala consumeOptions)
        assert(opts(_.copy(offsetReset = "none"))("failOnDataLoss") === "true")
        assert(opts(identity)("failOnDataLoss") === "false")
      },
      "Key Attribute Encoding" -> { () => // enum: UTF8 | HEX
        val r = Kafka.envelopeAttrs(recordsDf.limit(1), "HEX")
          .select(col("`kafka.key`")).collect()(0).getString(0)
        assert(r === "6B") // uppercase hex of 'k' (rdkafka_utils.cpp:160)
        val u = Kafka.envelopeAttrs(recordsDf.limit(1), "UTF8")
          .select(col("`kafka.key`")).collect()(0).getString(0)
        assert(u === "k")
      },
      "Message Demarcator" -> { () => // bundle transform
        val rows = Kafka.demarcate(recordsDf, "|").orderBy("partition")
          .select(col("content"), col("`kafka.count`"), col("`kafka.offset`"))
          .collect()
        assert(rows(0).getString(0) === "m1|m2") // offset order within bundle
        assert(rows(0).getString(1) === "2")     // kafka.count = bundle size
        assert(rows(0).getString(2) === "7")     // kafka.offset = largest
        assert(rows(1).getString(0) === "m3")
      },
      "Message Header Encoding" -> { () => // enum: UTF8 | HEX, post-merge
        val hexMerged = headersDf.select(Kafka.headerAttr(col("headers"),
          "h", "COMMA_SEPARATED_MERGE", "HEX")).collect()(0).getString(0)
        assert(hexMerged === "782C2079") // hex("x, y") — encode AFTER merge
      },
      "Headers To Add As Attributes" -> { () =>
        val m = headersDf.select(Kafka.headersAsAttrs(col("headers"),
          Seq("h", "absent")).as("m")).collect()(0)
          .getMap[String, String](0)
        assert(m === Map("h" -> "y")) // absent header → no attribute entry
      },
      "Duplicate Header Handling" -> { () => // enum: 3 policies
        def get(p: String) = headersDf.select(
          Kafka.headerAttr(col("headers"), "h", p)).collect()(0).getString(0)
        assert(get("KEEP_FIRST") === "x")
        assert(get("KEEP_LATEST") === "y")
        assert(get("COMMA_SEPARATED_MERGE") === "x, y")
      },
      "Max Poll Records" -> (() =>
        assert(opts(_.copy(maxPollRecords = 42))("maxOffsetsPerTrigger") === "42")),
      "Max Poll Time" -> (() =>
        assert(opts(_.copy(maxPollTimeMs = 1234))("kafkaConsumer.pollTimeoutMs") === "1234")),
      "Session Timeout" -> (() =>
        assert(opts(_.copy(sessionTimeoutMs = 9000))("kafka.session.timeout.ms") === "9000")),
      "Commit Offsets Policy" -> { () => // enum: 3 subsumed + 1 rejected
        for (subsumed <- Seq("No Commit", "Auto Commit", "Commit After Batch"))
          assert(!opts(_.copy(commitPolicy = subsumed)).keys
            .exists(_.contains("commit"))) // checkpoint owns progress
        intercept[IllegalArgumentException] {
          opts(_.copy(commitPolicy = "Commit from incoming flowfiles"))
        }
      },
      "SSL Context Service" -> { () => // base security plane
        assert(Kafka.securityOptions(Kafka.SecurityProps("ssl"))(
          "kafka.security.protocol") === "SSL")
      },
      "Security Protocol" -> { () => // enum: 4 values
        for ((in, out) <- Seq("plaintext" -> "PLAINTEXT", "ssl" -> "SSL",
            "sasl_plaintext" -> "SASL_PLAINTEXT", "sasl_ssl" -> "SASL_SSL"))
          assert(Kafka.securityOptions(Kafka.SecurityProps(in))(
            "kafka.security.protocol") === out)
      },
      "SASL Mechanism" -> { () => // enum: GSSAPI | PLAIN
        val plain = Kafka.securityOptions(Kafka.SecurityProps(
          "sasl_plaintext", "PLAIN", username = "u", password = "p"))
        assert(plain("kafka.sasl.mechanism") === "PLAIN")
        assert(plain("kafka.sasl.jaas.config").contains("username=\"u\""))
        val gss = Kafka.securityOptions(Kafka.SecurityProps(
          "sasl_ssl", "GSSAPI", kerberosServiceName = "kafka",
          kerberosPrincipal = "svc@REALM", kerberosKeytabPath = "/kt"))
        assert(gss("kafka.sasl.mechanism") === "GSSAPI")
        assert(gss("kafka.sasl.kerberos.service.name") === "kafka")
      },
      "Kerberos Service Name" -> (() => ()), // asserted under SASL Mechanism
      "Kerberos Principal" -> { () =>
        assert(Kafka.securityOptions(Kafka.SecurityProps("sasl_ssl", "GSSAPI",
          kerberosPrincipal = "svc@REALM"))("kafka.sasl.jaas.config")
          .contains("principal=\"svc@REALM\""))
      },
      "Kerberos Keytab Path" -> { () =>
        assert(Kafka.securityOptions(Kafka.SecurityProps("sasl_ssl", "GSSAPI",
          kerberosKeytabPath = "/kt"))("kafka.sasl.jaas.config")
          .contains("keyTab=\"/kt\""))
      },
      "Username" -> (() => ()),  // asserted under SASL Mechanism (PLAIN)
      "Password" -> (() => ()))
    table.foreach { case (prop, check) =>
      withClue(s"property '$prop': ")(check())
    }
    // completeness: the table names every property in the reference's
    // ConsumeKafka + KafkaProcessorBase Properties arrays
    val referenceProps = Set(
      "Kafka Brokers", "Topic Names", "Topic Name Format",
      "Honor Transactions", "Group ID", "Offset Reset",
      "Key Attribute Encoding", "Message Demarcator",
      "Message Header Encoding", "Headers To Add As Attributes",
      "Duplicate Header Handling", "Max Poll Records", "Max Poll Time",
      "Session Timeout", "Commit Offsets Policy",
      "SSL Context Service", "Security Protocol", "Kerberos Service Name",
      "Kerberos Principal", "Kerberos Keytab Path", "SASL Mechanism",
      "Username", "Password")
    assert(referenceProps.subsetOf(table.map(_._1).toSet))
  }

  test("MQTT conformance table: every AbstractMQTTProcessor/ConsumeMQTT/" +
       "PublishMQTT property maps to a connector option or a documented " +
       "disposition (option, transform, validation rule, or rejection " +
       "with reason)") {
    import graft.sources.Mqtt
    val conn = Mqtt.ConnectionProps("tcp://b:1883", clientId = "c",
      qos = 1, username = "u", password = "p", connectionTimeoutSec = 11,
      keepAliveSec = 22, mqttVersion = "3.1.1", cleanSession = false)
    val consume = Mqtt.consumeOptions(conn, "top/#", "/tmp/store")
    val publish = Mqtt.publishOptions(conn, "out", retain = true)
    // option-mapped plane, property name → option key
    val optionMapped = Map(
      "Broker URI" -> "brokerUrl", "Client ID" -> "clientId",
      "Quality of Service" -> "QoS", "MQTT Version" -> "mqttVersion",
      "Connection Timeout" -> "connectionTimeout",
      "Keep Alive Interval" -> "keepAlive", "Username" -> "username",
      "Password" -> "password", "Clean Session" -> "cleanSession",
      "Topic" -> "topic")
    optionMapped.foreach { case (prop, key) =>
      withClue(s"property '$prop': ")(
        assert(consume.contains(key) || publish.contains(key)))
    }
    assert(publish("retained") === "true") // PublishMQTT Retain
    // completeness: the union of option-mapped names, the Retain flag,
    // and the documented dispositions covers the reference tables
    val referenceProps = Set(
      // AbstractMQTTProcessor.h:98-175
      "Broker URI", "Client ID", "Quality of Service", "MQTT Version",
      "Connection Timeout", "Keep Alive Interval", "Last Will Topic",
      "Last Will Message", "Last Will QoS", "Last Will Retain",
      "Last Will Content Type", "Username", "Password",
      "Security Protocol", "Security CA", "Security Cert",
      "Security Private Key", "Security Pass Phrase",
      // ConsumeMQTT.h
      "Record Reader", "Topic", "Clean Session", "Clean Start",
      "Session Expiry Interval", "Queue Max Message",
      "Attribute From Content Type", "Topic Alias Maximum",
      "Receive Maximum", "Add Attributes As Fields",
      // PublishMQTT.h
      "Record Writer", "Retain", "Message Expiry Interval", "Content Type")
    val covered = optionMapped.keySet ++ Set("Retain") ++
      Mqtt.propertyDispositions.keySet
    val missing = referenceProps -- covered
    assert(missing.isEmpty, s"undocumented properties: $missing")
    // every disposition carries a category and a reason
    Mqtt.propertyDispositions.values.foreach { d =>
      assert(d.matches("^(rejected|subsumed|transform|validated): .+"))
    }
  }

  test("PublishKafka schedule rule: Batch Size capped by Queue Max Message " +
       "(PublishKafkaTests.cpp:28-38)") {
    val e = intercept[IllegalArgumentException] {
      Kafka.publishOptions(Kafka.PublishProps("b:9092", "t",
        batchSize = 1500, queueBufferMaxMessage = 1000))
    }
    assert(e.getMessage ===
      "Invalid configuration: Batch Size cannot be larger than Queue Max Message")
    // at the cap is fine
    assert(Kafka.publishOptions(Kafka.PublishProps("b:9092", "t",
      batchSize = 1000, queueBufferMaxMessage = 1000)).nonEmpty)
  }

  test("PublishMQTT validation: topic/broker errors, v5-only publish " +
       "properties warn on 3.x (PublishMQTTTests.cpp:74-100)") {
    import graft.sources.Mqtt
    def conn(version: String = "3.1.1") =
      Mqtt.ConnectionProps("127.0.0.1:1883", mqttVersion = version)
    assert(Mqtt.validatePublish(conn(), "").errors ===
      Seq("PublishMQTT: Topic is required"))
    assert(Mqtt.validatePublish(Mqtt.ConnectionProps(""), "mytopic").errors
      .exists(_.contains("\"Broker URI\"")))
    assert(Mqtt.validatePublish(conn(), "mytopic",
      messageExpirySec = Some(60)).warnings === Seq("MQTT 3.x " +
      "specification does not support Message Expiry Intervals. " +
      "Property is not used."))
    assert(Mqtt.validatePublish(conn(), "mytopic",
      contentTypeSet = true).warnings === Seq("MQTT 3.x specification " +
      "does not support Content Types. Property is not used."))
    assert(Mqtt.validatePublish(conn("5.0"), "mytopic",
      messageExpirySec = Some(60), contentTypeSet = true).warnings.isEmpty)
  }

  test("publishRecords: default key = FlowFile id, segmentation caps, " +
       "empty-content policy, no-regex no-headers (PublishKafka.cpp:676, " +
       "ReadCallback :237,:269)") {
    import graft.core.FlowFrame
    val ff = flowFrame(Seq(("abcdefghij", Map("s" -> "t1", "h.x" -> "v"))))
      .withColumn(FlowFrame.Uuid, lit("ff-1"))
    // Max Flow Segment Size 0 → whole content one message; key defaults
    // to the FlowFile id when Kafka Key is unset; no regex → no headers
    val whole = Kafka.publishRecords(ff, topicEl = "t-${s}").collect()
    assert(whole.length === 1)
    assert(whole(0).getAs[String]("topic") === "t-t1")
    assert(whole(0).getAs[String]("key") === "ff-1")
    assert(whole(0).getAs[Int]("segment") === 0)
    assert(new String(whole(0).getAs[Array[Byte]]("value")) === "abcdefghij")
    assert(whole(0).getAs[String]("headers") === "")
    // seg size 4 over 10 bytes → 3 segments (4, 4, 2), same key+headers
    val segs = Kafka.publishRecords(ff, "t", attributeNameRegex = Some("h\\..*"),
      maxSegSizeBytes = 4).orderBy("segment").collect()
    assert(segs.map(r => new String(r.getAs[Array[Byte]]("value"))).toSeq ===
      Seq("abcd", "efgh", "ij"))
    assert(segs.forall(_.getAs[String]("headers") === "h.x=v"))
    // empty content: one empty-value message, or none under Fail Empty
    val empty = flowFrame(Seq(("", Map.empty[String, String])))
    assert(Kafka.publishRecords(empty, "t").count() === 1)
    assert(Kafka.publishRecords(empty, "t").collect()(0)
      .getAs[Array[Byte]]("value").length === 0)
    assert(Kafka.publishRecords(empty, "t",
      failEmptyFlowFiles = true).count() === 0)
  }

  test("publishRecords header regex is a FULL match (make_headers uses " +
       "std::regex_match, RegexUtils.cpp:250) and byte segmentation splits " +
       "multibyte text mid-codepoint") {
    import graft.core.FlowFrame
    // "lang" must select ONLY the attribute named exactly lang — an
    // unanchored partial match would also emit language/slang
    val ff = flowFrame(Seq(("héllo wörld", Map(
      "lang" -> "de", "language" -> "german", "slang" -> "no"))))
      .withColumn(FlowFrame.Uuid, lit("ff-1"))
    val rows = Kafka.publishRecords(ff, "t",
      attributeNameRegex = Some("lang")).collect()
    assert(rows.head.getAs[String]("headers") === "lang=de")
    // UTF-8 "héllo wörld" = 13 bytes (é, ö are 2 bytes); seg size 4 →
    // ceil(13/4) = 4 segments, and segment 0 ends INSIDE é's two bytes —
    // reassembling the raw bytes restores the original exactly
    val segs = Kafka.publishRecords(ff, "t", maxSegSizeBytes = 4)
      .orderBy("segment").collect()
    assert(segs.length === 4)
    val joined = segs.flatMap(_.getAs[Array[Byte]]("value"))
    assert(new String(joined, "UTF-8") === "héllo wörld")
    assert(segs(0).getAs[Array[Byte]]("value").length === 4)
    assert(segs(3).getAs[Array[Byte]]("value").length === 1)
  }

  test("Mqtt.publishEnvelope: MQTT 3.x drops every v5 property " +
       "(setMqtt5Properties PublishMQTT.cpp:244-246)") {
    import graft.sources.Mqtt
    val ff = flowFrame(Seq(("payload", Map("a" -> "1", "b" -> "2"))))
    val v5 = Mqtt.publishEnvelope(ff, "top", qos = 2, retain = true,
      contentTypeEl = Some("ct-${a}"), messageExpirySec = Some(9L),
      mqttVersion = "5.0").collect()(0)
    assert(v5.getAs[String]("content_type") === "ct-1")
    assert(v5.getAs[Long]("message_expiry_sec") === 9L)
    assert(v5.getAs[String]("user_properties") === "a=1,b=2")
    assert(v5.getAs[Int]("qos") === 2 && v5.getAs[Boolean]("retain"))
    val v3 = Mqtt.publishEnvelope(ff, "top", qos = 2, retain = true,
      contentTypeEl = Some("ct-${a}"), messageExpirySec = Some(9L),
      mqttVersion = "3.1.1").collect()(0)
    assert(v3.getAs[String]("content_type") === null)
    assert(v3.isNullAt(v3.fieldIndex("message_expiry_sec")))
    assert(v3.getAs[String]("user_properties") === "")
  }

  test("envelope projection stamps the kafka.* attribute set") {
    val df = spark.sql(
      """SELECT CAST('k' AS BINARY) AS key, CAST('v' AS BINARY) AS value,
        | 'topic1' AS topic, 3 AS partition, CAST(42 AS LONG) AS offset,
        | CAST('2026-01-01 00:00:00' AS TIMESTAMP) AS timestamp""".stripMargin)
    val row = Kafka.envelopeAttrs(df)
      .select("`kafka.key`", "`kafka.topic`", "`kafka.partition`", "`kafka.offset`")
      .collect()(0)
    assert(row.getString(0) === "k")
    assert(row.getString(1) === "topic1")
    assert(row.getString(2) === "3")
    assert(row.getString(3) === "42")
  }
}
