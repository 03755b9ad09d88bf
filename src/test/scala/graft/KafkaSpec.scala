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
