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
}
