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

  /** ConsumeKafka property surface — the FULL set from
    * ConsumeKafka.h:93-233 plus the enum planes at ConsumeKafka.h:40-46.
    * Every field maps to a connector option (consumeOptions), an
    * envelope/header projection (envelopeAttrs / headerAttr /
    * headersAsAttrs), the bundle transform (demarcate), or a documented
    * subsumption/rejection (commit policy — see consumeOptions). */
  case class ConsumeProps(
      brokers: String,                           // Kafka Brokers
      topicNames: Seq[String],                   // Topic Names
      topicNameFormat: String = "Names",         // Names | Patterns
      groupId: String = "",                      // Group ID
      offsetReset: String = "latest",            // earliest | latest | none
      honorTransactions: Boolean = true,         // Honor Transactions
      maxPollRecords: Int = 10000,               // Max Poll Records
      sessionTimeoutMs: Long = 60000,            // Session Timeout
      maxPollTimeMs: Long = 4000,                // Max Poll Time
      keyAttributeEncoding: String = "UTF8",     // UTF8 | HEX
      messageDemarcator: Option[String] = None,  // Message Demarcator
      messageHeaderEncoding: String = "UTF8",    // UTF8 | HEX
      headersToAddAsAttributes: Seq[String] = Nil,
      duplicateHeaderHandling: String = "KEEP_LATEST",
      commitPolicy: String = "Commit After Batch") // Commit Offsets Policy

  /**
   * → `spark.readStream.format("kafka").options(...)`. Offset Reset maps
   * to `startingOffsets` (the checkpoint supersedes it on restart, exactly
   * like the reference's committed group offsets); `none` (= error when no
   * stored offset) keeps `failOnDataLoss=true` so a missing/expired offset
   * fails the query instead of silently resetting. Honor Transactions maps
   * to `isolation.level`; Max Poll Records bounds the micro-batch via
   * `maxOffsetsPerTrigger`; Max Poll Time maps to the consumer poll bound
   * `kafkaConsumer.pollTimeoutMs`.
   *
   * Commit Offsets Policy (ConsumeKafka.h:40, :226-235): progress is
   * owned by the streaming checkpoint — exactly-once, strictly stronger
   * than the reference's at-least-once commit points — so `No Commit`,
   * `Auto Commit` and `Commit After Batch` are subsumed (no option;
   * Spark forbids `enable.auto.commit` outright).
   * `Commit from incoming flowfiles` drives the consumer from OTHER
   * flowfiles' attributes, which contradicts checkpoint-owned progress —
   * rejected at build time with this explanation.
   */
  def consumeOptions(p: ConsumeProps): Map[String, String] = {
    if (p.commitPolicy.equalsIgnoreCase("Commit from incoming flowfiles"))
      throw new IllegalArgumentException(
        "Commit Offsets Policy 'Commit from incoming flowfiles' is not " +
        "supported: streaming progress is owned by the query checkpoint " +
        "(exactly-once); external offset control would corrupt it")
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
      // 'none' = the consumer errors when no stored offset exists.
      // failOnDataLoss=true carries the MID-STREAM half (expired/lost
      // offsets fail the query) but NOT the first-run half: Structured
      // Streaming has no stored-offset-or-error start mode, so a fresh
      // checkpoint silently starts at `latest`. RESIDUAL GAP, documented
      // in COVERAGE.md §2.1 — progress is owned by the query checkpoint,
      // which exists from batch 0, so the reference's "no committed group
      // offset" state is unreachable after the first trigger.
      "failOnDataLoss" ->
        (if (p.offsetReset.equalsIgnoreCase("none")) "true" else "false"),
      "kafka.isolation.level" ->
        (if (p.honorTransactions) "read_committed" else "read_uncommitted"),
      "maxOffsetsPerTrigger" -> p.maxPollRecords.toString,
      "kafkaConsumer.pollTimeoutMs" -> p.maxPollTimeMs.toString,
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
      batchSize: Int = 10,                       // Batch Size
      queueBufferMaxMessage: Int = 1000)         // Queue Buffering Max Messages

  /** → `df.writeStream.format("kafka").options(...)`. Delivery Guarantee
    * maps to producer `acks`; codec/batch/request caps map to their
    * librdkafka-equivalent producer settings. Schedule-time rule
    * (PublishKafkaTests.cpp:28-38): Batch Size must not exceed Queue Max
    * Message, with the reference's error text. */
  def publishOptions(p: PublishProps): Map[String, String] = {
    if (p.batchSize > p.queueBufferMaxMessage)
      throw new IllegalArgumentException("Invalid configuration: " +
        "Batch Size cannot be larger than Queue Max Message")
    publishOptions0(p)
  }

  private def publishOptions0(p: PublishProps): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> p.brokers,
    "topic" -> p.topic,
    "kafka.acks" -> p.deliveryGuarantee,
    "kafka.max.request.size" -> p.maxRequestSizeBytes.toString,
    "kafka.request.timeout.ms" -> p.requestTimeoutMs.toString,
    "kafka.compression.type" -> p.compressCodec,
    "kafka.batch.size" -> p.batchSize.toString)

  /** KafkaProcessorBase security surface (KafkaProcessorBase.h:34-90):
    * Security Protocol {plaintext, ssl, sasl_plaintext, sasl_ssl}, SASL
    * Mechanism {GSSAPI, PLAIN} with username/password, and the Kerberos
    * triplet — each maps onto the consumer/producer `kafka.`-prefixed
    * client config the connector passes through verbatim. */
  case class SecurityProps(
      securityProtocol: String = "plaintext",
      saslMechanism: String = "GSSAPI",
      username: String = "",              // for SASL PLAIN
      password: String = "",
      kerberosServiceName: String = "",
      kerberosPrincipal: String = "",
      kerberosKeytabPath: String = "")

  def securityOptions(p: SecurityProps): Map[String, String] = {
    val proto = p.securityProtocol.toLowerCase match {
      case "plaintext"      => "PLAINTEXT"
      case "ssl"            => "SSL"
      case "sasl_plaintext" => "SASL_PLAINTEXT"
      case "sasl_ssl"       => "SASL_SSL"
      case other => throw new IllegalArgumentException(s"security protocol $other")
    }
    val sasl =
      if (!proto.startsWith("SASL")) Map.empty[String, String]
      else p.saslMechanism.toUpperCase match {
        case "PLAIN" => Map(
          "kafka.sasl.mechanism" -> "PLAIN",
          "kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
             s"""username="${p.username}" password="${p.password}";"""))
        case "GSSAPI" => Map(
          "kafka.sasl.mechanism" -> "GSSAPI",
          "kafka.sasl.kerberos.service.name" -> p.kerberosServiceName,
          "kafka.sasl.jaas.config" ->
            ("com.sun.security.auth.module.Krb5LoginModule required " +
             s"""useKeyTab=true keyTab="${p.kerberosKeytabPath}" """ +
             s"""principal="${p.kerberosPrincipal}";"""))
        case other => throw new IllegalArgumentException(s"SASL mechanism $other")
      }
    Map("kafka.security.protocol" -> proto) ++ sasl
  }

  /** Key Attribute Encoding / Message Header Encoding
    * (rdkafka_utils.h:32, rdkafka_utils.cpp:158-161): UTF8 passes the
    * bytes through as text, HEX renders uppercase hex. */
  def encoded(c: Column, encoding: String): Column =
    encoding.toUpperCase match {
      case "UTF8" | "UTF-8" => c.cast("string")
      case "HEX"            => upper(hex(c.cast("binary")))
      case other => throw new IllegalArgumentException(s"encoding $other")
    }

  /**
   * Project the Kafka record envelope into FlowFile attributes
   * (ConsumeKafka.cpp:248-259 addAttributesToSingleMessageFlowFile):
   * kafka.count = 1, key per Key Attribute Encoding, topic, partition,
   * offset, timestamp.
   */
  def envelopeAttrs(df: DataFrame, keyEncoding: String = "UTF8"): DataFrame = df
    .withColumn("kafka.count", lit("1"))
    .withColumn("kafka.key", encoded(col("key"), keyEncoding))
    .withColumn("kafka.topic", col("topic"))
    .withColumn("kafka.partition", col("partition").cast("string"))
    .withColumn("kafka.offset", col("offset").cast("string"))
    .withColumn("kafka.timestamp", col("timestamp").cast("string"))

  /**
   * Headers To Add As Attributes (ConsumeKafka.h:176-196): the connector
   * exposes `headers` as ARRAY<STRUCT<key,value>>; pick the named headers
   * with the Duplicate Header Handling policy — KEEP_FIRST, KEEP_LATEST
   * (reference default) or COMMA_SEPARATED_MERGE — then apply Message
   * Header Encoding to the RESOLVED value (the reference encodes after
   * the merge, ConsumeKafka.cpp:242).
   */
  def headerAttr(headersCol: Column, name: String,
                 policy: String = "KEEP_LATEST",
                 encoding: String = "UTF8"): Column = {
    val matching = filter(headersCol, h => h.getField("key") === name)
    val values = transform(matching, h => h.getField("value").cast("string"))
    // try_element_at: an absent header is null, not an ANSI index error
    val resolved = policy match {
      case "KEEP_FIRST"            => try_element_at(values, lit(1))
      case "KEEP_LATEST"           => try_element_at(values, lit(-1))
      case "COMMA_SEPARATED_MERGE" => when(size(values) > 0, array_join(values, ", "))
      case other => throw new IllegalArgumentException(s"header policy $other")
    }
    encoded(resolved, encoding)
  }

  /** All configured headers as one attribute map (the per-FlowFile
    * attribute stamping loop, ConsumeKafka.cpp:236-246): absent headers
    * contribute no entry. */
  def headersAsAttrs(headersCol: Column, names: Seq[String],
                     policy: String = "KEEP_LATEST",
                     encoding: String = "UTF8"): Column =
    map_filter(
      map_from_arrays(
        array(names.map(lit(_)): _*),
        array(names.map(headerAttr(headersCol, _, policy, encoding)): _*)),
      (_, v) => v.isNotNull)

  /**
   * Message Demarcator (ConsumeKafka.h:156-166 + MessageBundle assembly,
   * ConsumeKafka.cpp:262-268): one output per (topic, partition) poll
   * bundle — contents joined by the demarcator in offset order,
   * kafka.count = bundle size, kafka.offset = LARGEST offset in the
   * bundle (the commit point), no header attributes (the reference only
   * stamps headers on single-message FlowFiles). Map-side scale shape:
   * one hash-agg keyed by (topic, partition).
   */
  def demarcate(df: DataFrame, demarcator: String): DataFrame = df
    .groupBy(col("topic"), col("partition"))
    .agg(
      count(lit(1)).cast("string").as("kafka.count"),
      max(col("offset")).cast("string").as("kafka.offset"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("offset"),
            col("value").cast("string").as("v")))),
          s => s.getField("v")),
        demarcator).as("content"))
    .withColumn("kafka.topic", col("topic"))
    .withColumn("kafka.partition", col("partition").cast("string"))

  /** PublishKafka "Attributes to Send as Headers" (PublishKafka.h:125):
    * build the connector's headers array from the attribute map for the
    * names matching the given list. */
  def attrsToHeaders(attrsMap: Column, names: Seq[String]): Column =
    filter(
      array(names.map(n => struct(
        lit(n).as("key"),
        element_at(attrsMap, n).cast("binary").as("value"))): _*),
      h => h.getField("value").isNotNull)

  /**
   * PublishKafka producer-record assembly plane
   * (PublishKafka.cpp:653-726 onTrigger per-FlowFile loop + the
   * ReadCallback at PublishKafka.cpp:153-295): one FlowFrame row becomes
   * the producer records the reference enqueues —
   *  - Topic and Kafka Key are EL-evaluated per FlowFile; a missing Kafka
   *    Key property defaults to the FlowFile id (PublishKafka.cpp:676)
   *  - headers are the attributes whose NAME matches "Attributes to Send
   *    as Headers" (make_headers, PublishKafka.cpp:162-178); the
   *    reference iterates a std::map, so they are key-sorted — rendered
   *    here as a canonical "k=v" comma join; no regex → no headers
   *  - content splits into ceil(size / Max Flow Segment Size) segments
   *    (0 = whole content as one message), every segment carrying the
   *    SAME key and headers (ReadCallback::operator(), :254-283)
   *  - partition is RD_KAFKA_PARTITION_UA (:210) — placement belongs to
   *    the key partitioner, so the envelope has no partition field
   *  - an empty FlowFile still produces one empty-value message unless
   *    Fail Empty Flow Files (:269-271), in which case it produces none
   *    and the FlowFile routes failure
   * Map-side scale shape: pure per-row projection + a bounded explode
   * (segments of one FlowFile) — no shuffle at any scale.
   */
  /** Long position → int with an explicit analysis-time error instead of
    * a silent wrap past 2 GiB (segment arithmetic guard). */
  private def checkedIntPos(pos: Column): Column =
    when(pos <= Int.MaxValue.toLong, pos)
      .otherwise(raise_error(lit(
        "publishRecords: segment position exceeds Int.MaxValue")).cast("long"))
      .cast("int")

  def publishRecords(ff: DataFrame, topicEl: String,
                     kafkaKeyEl: Option[String] = None,
                     attributeNameRegex: Option[String] = None,
                     maxSegSizeBytes: Long = 0L,
                     failEmptyFlowFiles: Boolean = false): DataFrame = {
    import graft.core.FlowFrame
    import graft.el.ElCompiler
    val topic = ElCompiler.template(topicEl)
    val key = kafkaKeyEl.map(el => ElCompiler.template(el))
      .getOrElse(col(FlowFrame.Uuid).cast("string"))
    val headers = attributeNameRegex match {
      // FULL-match like the reference's make_headers (utils::regexMatch =
      // std::regex_match, RegexUtils.cpp:250): an unanchored "lang" must
      // not also select "language"
      case Some(re) => array_join(
        transform(
          array_sort(map_entries(map_filter(col(FlowFrame.Attributes),
            (k, _) => k.rlike(graft.el.ElCompiler.anchor(re))))),
          e => concat(e.getField("key"), lit("="), e.getField("value"))),
        ",")
      case None => lit("")
    }
    val bytes = col(FlowFrame.Content).cast("binary")
    val size = length(bytes).cast("long")
    // max_seg_size_ = (max == 0 || size < max) ? size : max
    val seg =
      if (maxSegSizeBytes == 0L) size else least(size, lit(maxSegSizeBytes))
    val nSegs = when(size === 0, lit(if (failEmptyFlowFiles) 0 else 1))
      .otherwise(floor((size - 1).cast("double") / seg).cast("int") + 1)
    ff.select(
      col(FlowFrame.Uuid).cast("string").as("uuid"),
      topic.as("topic"), key.as("key"), headers.as("headers"),
      bytes.as("bytes"), seg.as("seg"),
      explode(when(nSegs > 0, sequence(lit(0), nSegs - 1))
        .otherwise(array().cast("array<int>"))).as("segment"))
      .select(col("uuid"), col("topic"), col("key"), col("segment"),
        // positions stay int-safe structurally (a JVM binary cell caps at
        // Int.MaxValue bytes, and (nSegs-1)*seg < size), but assert rather
        // than silently wrap if that invariant ever breaks
        col("bytes").substr(checkedIntPos(
          col("segment").cast("long") * col("seg") + 1),
          col("seg").cast("int")).as("value"),
        col("headers"))
  }
}
