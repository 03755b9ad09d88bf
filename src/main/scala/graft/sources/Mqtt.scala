package graft.sources

/**
 * ConsumeMQTT / PublishMQTT property mapping — SURVEY §2.1/§2.2
 * (extensions/mqtt/processors/AbstractMQTTProcessor.h:98-175,
 * ConsumeMQTT.h, PublishMQTT.h).
 *
 * No MQTT connector jar ships in this container; the engine surface is
 * the property mapping onto the Apache Bahir `spark-sql-streaming-mqtt`
 * option names (the public Structured Streaming MQTT source), so a
 * deployment that adds the connector jar runs
 * `readStream.format("org.apache.bahir.sql.streaming.mqtt.MQTTStreamSourceProvider")
 *  .options(Mqtt.consumeOptions(props)).load(brokerUri)` unchanged.
 */
object Mqtt {

  /** Shared connection surface (AbstractMQTTProcessor.h:98-167). */
  case class ConnectionProps(
      brokerUri: String,                  // Broker URI
      clientId: String = "",              // Client ID
      qos: Int = 0,                       // Quality of Service (0/1/2)
      mqttVersion: String = "3.1.1",      // MQTT Version
      connectionTimeoutSec: Long = 30,    // Connection Timeout
      keepAliveSec: Long = 60,            // Keep Alive Interval
      username: String = "",              // Username
      password: String = "",              // Password
      cleanSession: Boolean = true)       // ConsumeMQTT session state

  private def base(p: ConnectionProps): Map[String, String] = Map(
    "brokerUrl" -> p.brokerUri,
    "QoS" -> p.qos.toString,
    "mqttVersion" -> p.mqttVersion,
    "connectionTimeout" -> p.connectionTimeoutSec.toString,
    "keepAlive" -> p.keepAliveSec.toString,
    "cleanSession" -> p.cleanSession.toString) ++
    (if (p.clientId.nonEmpty) Map("clientId" -> p.clientId) else Map.empty) ++
    (if (p.username.nonEmpty) Map("username" -> p.username) else Map.empty) ++
    (if (p.password.nonEmpty) Map("password" -> p.password) else Map.empty)

  /** ConsumeMQTT (topic filter subscription). `persistence` keeps the
    * paho client store durable across restarts — the reference's
    * non-clean-session redelivery contract. */
  def consumeOptions(p: ConnectionProps, topicFilter: String,
                     localStorageDir: String = ""): Map[String, String] =
    base(p) + ("topic" -> topicFilter) ++
      (if (localStorageDir.nonEmpty) Map("localStorage" -> localStorageDir)
       else Map.empty)

  /** PublishMQTT (fixed topic, optional retain flag). */
  def publishOptions(p: ConnectionProps, topic: String,
                     retain: Boolean = false): Map[String, String] =
    base(p) + ("topic" -> topic, "retained" -> retain.toString)

  final case class Validation(errors: Seq[String], warnings: Seq[String])

  /**
   * ConsumeMQTT schedule-time validation
   * (AbstractMQTTProcessor::onSchedule + ConsumeMQTT checks;
   * ConsumeMQTTTests.cpp:134-245): missing topic/broker are errors; the
   * version-specific durability and property-applicability rules are the
   * reference's exact warning texts — a durable session (3.x Clean
   * Session=false, 5.0 Session Expiry Interval>0) with QoS<1 does not
   * preserve messages, and version-foreign properties are ignored with a
   * warning (Clean Start / Session Expiry / Topic Alias Maximum / Receive
   * Maximum on 3.x; Clean Session on 5.0).
   */
  def validateConsume(p: ConnectionProps, topicFilter: String,
                      cleanStartSet: Boolean = false,
                      sessionExpirySec: Option[Long] = None,
                      topicAliasMaximum: Option[Int] = None,
                      receiveMaximum: Option[Int] = None,
                      cleanSessionSet: Boolean = false): Validation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    if (topicFilter.isEmpty)
      errors += "Expected valid value from \"Topic\", but got PropertyNotSet"
    if (p.brokerUri.isEmpty)
      errors += "Expected valid value from \"Broker URI\", but got PropertyNotSet"
    val is5 = p.mqttVersion.startsWith("5")
    val durable =
      if (is5) sessionExpirySec.exists(_ > 0) else !p.cleanSession
    if (durable && p.qos < 1)
      warnings += ("Messages are not preserved during client disconnection " +
        "by the broker when QoS is less than 1 for durable " +
        (if (is5) "(Session Expiry Interval > 0)" else "(non-clean)") +
        " sessions. Only subscriptions are preserved.")
    if (!is5) {
      if (cleanStartSet)
        warnings += "MQTT 3.x specification does not support Clean Start. Property is not used."
      if (sessionExpirySec.isDefined)
        warnings += "MQTT 3.x specification does not support Session Expiry Intervals. Property is not used."
      if (topicAliasMaximum.isDefined)
        warnings += "MQTT 3.x specification does not support Topic Alias Maximum. Property is not used."
      if (receiveMaximum.isDefined)
        warnings += "MQTT 3.x specification does not support Receive Maximum. Property is not used."
    } else if (cleanSessionSet)
      warnings += "MQTT 5.0 specification does not support Clean Session. Property is not used."
    Validation(errors.result(), warnings.result())
  }

  /**
   * PublishMQTT schedule-time validation (PublishMQTTTests.cpp:74-100):
   * a missing topic/broker is an error with the reference's text; the
   * MQTT-5-only publish properties (Message Expiry Interval, Content
   * Type) warn and are ignored on 3.x.
   */
  def validatePublish(p: ConnectionProps, topic: String,
                      messageExpirySec: Option[Long] = None,
                      contentTypeSet: Boolean = false): Validation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    if (topic.isEmpty) errors += "PublishMQTT: Topic is required"
    if (p.brokerUri.isEmpty)
      errors += "Expected valid value from \"Broker URI\", but got PropertyNotSet"
    if (!p.mqttVersion.startsWith("5")) {
      if (messageExpirySec.isDefined)
        warnings += ("MQTT 3.x specification does not support Message " +
          "Expiry Intervals. Property is not used.")
      if (contentTypeSet)
        warnings += ("MQTT 3.x specification does not support Content " +
          "Types. Property is not used.")
    }
    Validation(errors.result(), warnings.result())
  }

  /**
   * Disposition of every reference MQTT property that does NOT map to a
   * Bahir connector option string (AbstractMQTTProcessor.h:98-175,
   * ConsumeMQTT.h, PublishMQTT.h): the conformance spec asserts the union
   * of `consumeOptions`/`publishOptions` keys and this map covers the
   * reference's full property tables, so nothing is silently dropped —
   * a property is an option, a downstream transform, a validation rule,
   * or an explicit connector-boundary rejection with the reason recorded.
   */
  val propertyDispositions: Map[String, String] = Map(
    "Last Will Topic" ->
      "rejected: the public Bahir MQTT source does not expose paho last-will configuration",
    "Last Will Message" ->
      "rejected: see Last Will Topic",
    "Last Will QoS" ->
      "rejected: see Last Will Topic",
    "Last Will Retain" ->
      "rejected: see Last Will Topic",
    "Last Will Content Type" ->
      "rejected: MQTT 5 will-properties; see Last Will Topic",
    "Security Protocol" ->
      "subsumed: the broker URI scheme (tcp:// vs ssl://) selects the transport in paho",
    "Security CA" ->
      "rejected: JVM TLS trust comes from the truststore, not a PEM path option",
    "Security Cert" ->
      "rejected: JVM TLS client certs come from the keystore, not a PEM path option",
    "Security Private Key" ->
      "rejected: see Security Cert",
    "Security Pass Phrase" ->
      "rejected: see Security Cert",
    "Record Reader" ->
      "transform: record.Records readers parse the payload AFTER the source (ConvertRecord composition)",
    "Record Writer" ->
      "transform: record.Records writers render the payload BEFORE the sink",
    "Clean Start" ->
      "validated: MQTT 5-only; validateConsume warns and ignores it on 3.x",
    "Session Expiry Interval" ->
      "validated: MQTT 5-only durability plane; validateConsume applies the version matrix",
    "Queue Max Message" ->
      "subsumed: backpressure is the micro-batch admission bound, not an in-process queue cap",
    "Attribute From Content Type" ->
      "rejected: MQTT 5 content-type metadata is not surfaced by the connector",
    "Topic Alias Maximum" ->
      "validated: MQTT 5-only; validateConsume warns and ignores it on 3.x",
    "Receive Maximum" ->
      "validated: MQTT 5-only; validateConsume warns and ignores it on 3.x",
    "Add Attributes As Fields" ->
      "transform: envelope columns are projected into the frame by the source schema",
    "Message Expiry Interval" ->
      "rejected: MQTT 5 publish-properties are not surfaced by the connector",
    "Content Type" ->
      "rejected: MQTT 5 publish-properties are not surfaced by the connector")

  /**
   * PublishMQTT message-envelope assembly plane (PublishMQTT.cpp:58-126
   * onTrigger + setMqtt5Properties at :243-282): one FlowFrame row becomes
   * the MQTTAsync_message the reference enqueues —
   *  - Topic is EL-evaluated per FlowFile (getTopic, :227-233; required)
   *  - payload is the FlowFile content verbatim (sendMessage)
   *  - qos / retain are static message flags (readProperties, :51)
   *  - MQTT 5 properties: Message Expiry Interval in seconds when set
   *    (:249-253), Content Type (EL per FlowFile) when explicitly set and
   *    non-empty (:255-261), and EVERY attribute as a user property
   *    (addAttributesAsUserProperties, :266-282 — the reference iterates
   *    the attribute std::map, so key-sorted; canonical "k=v" comma join
   *    here). On MQTT 3.x the property set is empty (:244-246).
   * Pure per-row projection — no shuffle at any scale.
   */
  def publishEnvelope(ff: org.apache.spark.sql.DataFrame, topicEl: String,
                      qos: Int = 0, retain: Boolean = false,
                      contentTypeEl: Option[String] = None,
                      messageExpirySec: Option[Long] = None,
                      mqttVersion: String = "5.0"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.core.FlowFrame
    import graft.el.ElCompiler
    val v5 = mqttVersion.startsWith("5")
    val userProps =
      if (!v5) lit("")
      else array_join(
        transform(array_sort(map_entries(col(FlowFrame.Attributes))),
          e => concat(e.getField("key"), lit("="), e.getField("value"))), ",")
    val contentType =
      if (!v5) lit(null: String)
      else contentTypeEl.map(el => ElCompiler.template(el))
        .getOrElse(lit(null: String))
    val expiry =
      if (v5) messageExpirySec.map(s => lit(s)).getOrElse(lit(null: java.lang.Long))
      else lit(null: java.lang.Long)
    ff.select(
      col(FlowFrame.Uuid).cast("string").as("uuid"),
      ElCompiler.template(topicEl).as("topic"),
      col(FlowFrame.Content).cast("string").as("payload"),
      lit(qos).as("qos"), lit(retain).as("retain"),
      contentType.as("content_type"),
      expiry.cast("long").as("message_expiry_sec"),
      userProps.as("user_properties"))
  }
}
