package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ConsumeKafka / PublishKafka property mapping — SURVEY §2.1/§2.2
 * (extensions/kafka/ConsumeKafka.h:93-233, PublishKafka.h:57-215).
 *
 * Spark-first, Kafka IS a built-in Structured Streaming source/sink
 * (`format("kafka")`); the engine work is mapping the reference's
 * processor property surface onto the connector's options and projecting
 * the record envelope (headers, key, timestamp) into FlowFile attributes.
 * These builders return the option maps for `readStream`/`writeStream`;
 * the header/key projections are plain Columns, testable without a
 * broker (the connector jar itself plugs into the same strings).
 */
object Kafka {

  /** ConsumeKafka property surface (ConsumeKafka.h:93-233). */
  case class ConsumeProps(
      brokers: String,                           // Kafka Brokers
      topicNames: Seq[String],                   // Topic Names
      topicNameFormat: String = "Names",         // Names | Patterns
      groupId: String = "",                      // Group ID
      offsetReset: String = "latest",            // earliest | latest | none
      honorTransactions: Boolean = true,         // Honor Transactions
      maxPollRecords: Int = 10000,               // Max Poll Records
      sessionTimeoutMs: Long = 60000)            // Session Timeout

  /**
   * → `spark.readStream.format("kafka").options(...)`. Offset Reset maps
   * to `startingOffsets` (the checkpoint supersedes it on restart, exactly
   * like the reference's committed group offsets); Honor Transactions maps
   * to `isolation.level`; Max Poll Records bounds the micro-batch via
   * `maxOffsetsPerTrigger`.
   */
  def consumeOptions(p: ConsumeProps): Map[String, String] = {
    val subscription =
      if (p.topicNameFormat.equalsIgnoreCase("Patterns"))
        "subscribePattern" -> p.topicNames.mkString("|")
      else
        "subscribe" -> p.topicNames.mkString(",")
    Map(
      "kafka.bootstrap.servers" -> p.brokers,
      subscription,
      "startingOffsets" -> (p.offsetReset.toLowerCase match {
        case "earliest" => "earliest"
        case _          => "latest"
      }),
      "kafka.isolation.level" ->
        (if (p.honorTransactions) "read_committed" else "read_uncommitted"),
      "maxOffsetsPerTrigger" -> p.maxPollRecords.toString,
      "kafka.session.timeout.ms" -> p.sessionTimeoutMs.toString) ++
      (if (p.groupId.nonEmpty) Map("kafka.group.id" -> p.groupId) else Map.empty)
  }

  /** PublishKafka property surface (PublishKafka.h:57-215). */
  case class PublishProps(
      brokers: String,                           // Known Brokers
      topic: String,                             // Topic Name
      deliveryGuarantee: String = "1",           // 0 | 1 | all
      maxRequestSizeBytes: Long = 1048576,       // Max Request Size
      requestTimeoutMs: Long = 10000,            // Request Timeout
      compressCodec: String = "none",            // Compress Codec
      batchSize: Int = 10)                       // Batch Size

  /** → `df.writeStream.format("kafka").options(...)`. Delivery Guarantee
    * maps to producer `acks`; codec/batch/request caps map to their
    * librdkafka-equivalent producer settings. */
  def publishOptions(p: PublishProps): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> p.brokers,
    "topic" -> p.topic,
    "kafka.acks" -> p.deliveryGuarantee,
    "kafka.max.request.size" -> p.maxRequestSizeBytes.toString,
    "kafka.request.timeout.ms" -> p.requestTimeoutMs.toString,
    "kafka.compression.type" -> p.compressCodec,
    "kafka.batch.size" -> p.batchSize.toString)

  /**
   * Project the Kafka record envelope into FlowFile attributes
   * (ConsumeKafka.cpp attribute stamping): key (UTF8 per Key Attribute
   * Encoding), topic, partition, offset, timestamp.
   */
  def envelopeAttrs(df: DataFrame): DataFrame = df
    .withColumn("kafka.key", col("key").cast("string"))
    .withColumn("kafka.topic", col("topic"))
    .withColumn("kafka.partition", col("partition").cast("string"))
    .withColumn("kafka.offset", col("offset").cast("string"))
    .withColumn("kafka.timestamp", col("timestamp").cast("string"))

  /**
   * Headers To Add As Attributes (ConsumeKafka.h:176-196): the connector
   * exposes `headers` as ARRAY<STRUCT<key,value>>; pick the named headers
   * with the Duplicate Header Handling policy — KEEP_FIRST, KEEP_LATEST
   * (reference default) or COMMA_SEPARATED_MERGE.
   */
  def headerAttr(headersCol: Column, name: String,
                 policy: String = "KEEP_LATEST"): Column = {
    val matching = filter(headersCol, h => h.getField("key") === name)
    val values = transform(matching, h => h.getField("value").cast("string"))
    // try_element_at: an absent header is null, not an ANSI index error
    policy match {
      case "KEEP_FIRST"            => try_element_at(values, lit(1))
      case "KEEP_LATEST"           => try_element_at(values, lit(-1))
      case "COMMA_SEPARATED_MERGE" => when(size(values) > 0, array_join(values, ", "))
      case other => throw new IllegalArgumentException(s"header policy $other")
    }
  }

  /** PublishKafka "Attributes to Send as Headers" (PublishKafka.h:125):
    * build the connector's headers array from the attribute map for the
    * names matching the given list. */
  def attrsToHeaders(attrsMap: Column, names: Seq[String]): Column =
    filter(
      array(names.map(n => struct(
        lit(n).as("key"),
        element_at(attrsMap, n).cast("binary").as("value"))): _*),
      h => h.getField("value").isNotNull)
}
