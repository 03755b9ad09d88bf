package graft.flow

import scala.jdk.CollectionConverters._

/**
 * Flow configuration model + parsers — SURVEY §3.1 (the reference's user
 * API: a YAML "MiNiFi Config Version: 3" document or the JSON `rootGroup`
 * schema describing processors and connections; examples/
 * getfile_putfile_config.{yml,json}, parser
 * libminifi/src/core/flow/FlowSchema.cpp).
 *
 * The model is engine-neutral: a processor is (class, properties,
 * auto-terminated relationships); a connection is (source id,
 * selected relationships, destination id). FlowRunner maps this onto
 * DataFrame assembly.
 */
case class ProcessorDef(
    id: String,
    name: String,
    clazz: String,
    schedulingStrategy: String,
    schedulingPeriod: String,
    autoTerminated: Set[String],
    properties: Map[String, String]) {
  /** Bare class name: the reference accepts several package spellings of
    * the same processor (org.apache.nifi.processors.standard.X,
    * org.apache.nifi.minifi.processors.X); behavior keys off the suffix. */
  def kind: String = clazz.substring(clazz.lastIndexOf('.') + 1)
}

/**
 * Connection queue limits — the StructuredConnectionParser surface
 * (libminifi/src/core/flow/StructuredConnectionParser.cpp:74-205).
 * Every accessor there is LENIENT for backward compatibility: an invalid
 * value logs and falls back to the default instead of failing the flow
 * load (YamlConnectionParserTest.cpp "values of incorrect format" /
 * "known incorrect formats" sections) — the parse helpers in [[Units]]
 * mirror that with Option-returning variants.
 */
case class ConnectionDef(
    id: String,
    name: String,
    sourceId: String,
    relationships: Seq[String],
    destinationId: String,
    expirationMs: Option[Long],
    // "max work queue size": plain integral only ("2 KB" is INVALID here
    // and falls back — parseIntegral, StructuredConnectionParser.cpp:77)
    maxQueueSize: Long = ConnectionDef.DefaultQueueSize,
    // "max work queue data size": data-size parse (binary units; a bare
    // number is bytes), default 100_MB = 100,000,000 (decimal literal,
    // Connection.h:45 — the default and the unit parse intentionally
    // disagree about what "MB" means, preserved as-is)
    maxQueueDataSize: Long = ConnectionDef.DefaultQueueDataSize,
    // "swap threshold": data-size parse, default 0 (no swap)
    swapThreshold: Long = 0L,
    // "drop empty": toBool.value_or(false) — "sup"/"NULL" are false
    dropEmpty: Boolean = false)

object ConnectionDef {
  /** Connection.h:44-45. */
  val DefaultQueueSize: Long = 2000L
  val DefaultQueueDataSize: Long = 100000000L
}

/** Controller service (SSL contexts, record readers/writers, cluster
  * clients — FlowSchema.cpp controller service plane). Parsed so
  * processors can resolve service-typed properties by id/name. */
case class ServiceDef(
    id: String,
    name: String,
    clazz: String,
    properties: Map[String, String])

/** One parameter of a parameter context (FlowSchema parameters plane).
  * Sensitive values arrive property-encrypted in the reference and are
  * decrypted with the configured cipher; this engine has no config
  * cipher, so the value is carried as-is and the sensitive flag only
  * drives the reference's reference-rules (a sensitive parameter cannot
  * feed a non-sensitive property — ParameterTokenParser.cpp:101-106). */
case class ParameterDef(name: String, value: String,
                        sensitive: Boolean = false)

/** A named parameter context with ordered inheritance
  * (ParameterContext.cpp:29-40: own parameters first, then the inherited
  * contexts in declaration order, depth-first). */
case class ParameterContextDef(name: String, parameters: Seq[ParameterDef],
                               inherits: Seq[String] = Nil)

case class FlowDef(
    name: String,
    processors: Seq[ProcessorDef],
    connections: Seq[ConnectionDef],
    services: Seq[ServiceDef] = Nil) {
  def processor(id: String): ProcessorDef =
    processors.find(p => p.id == id || p.name == id).getOrElse(
      throw new IllegalArgumentException(s"no processor with id/name '$id'"))
  def service(id: String): ServiceDef =
    services.find(s => s.id == id || s.name == id).getOrElse(
      throw new IllegalArgumentException(s"no controller service '$id'"))
}

object FlowConfig {

  /** Parse the YAML "MiNiFi Config Version: 3" document. Child process
    * groups ("Process Groups") flatten into the root — connections may
    * cross group boundaries by id, exactly as the reference resolves them
    * after load. Standalone "Funnels" entries become Funnel processors. */
  def parseYaml(text: String): FlowDef = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](text)
    val m = root.asScala
    val name = m.get("Flow Controller").flatMap(Option(_)).map(asMap)
      .flatMap(_.get("name")).flatMap(Option(_)).map(_.toString)
      .getOrElse("MiNiFi Flow")
    val groups = flattenGroups(m.toMap, "Process Groups")
    val procs = groups.flatMap(g =>
      asList(g.getOrElse("Processors", null)) ++
        asList(g.getOrElse("Funnels", null)).map(funnelAsProcessor))
      .map { p0 =>
      val p = asMap(p0)
      ProcessorDef(
        id = str(p, "id", str(p, "name", "")),
        name = str(p, "name", str(p, "id", "")),
        clazz = str(p, "class", ""),
        schedulingStrategy = str(p, "scheduling strategy", "TIMER_DRIVEN"),
        schedulingPeriod = str(p, "scheduling period", "1 sec"),
        autoTerminated = asList(p.getOrElse(
          "auto-terminated relationships list", null)).map(_.toString).toSet,
        properties = opt(p.getOrElse("Properties", null))
          .map(asMap(_).map { case (k, v) =>
            k -> (if (v == null) "" else v.toString) }.toMap)
          .getOrElse(Map.empty))
    }
    val conns = groups.flatMap(g => asList(g.getOrElse("Connections", null)))
      .map { c0 =>
      val c = asMap(c0)
      // v3 spells either "source relationship names" (list OR bare
      // scalar, both occur in the reference examples) or
      // "source relationship name" (single)
      val rels =
        if (c.contains("source relationship names"))
          (c("source relationship names") match {
            case l: java.util.List[_] => asList(l.asInstanceOf[Object])
            case scalar               => Seq(scalar)
          }).map(_.toString)
        else opt(c.getOrElse("source relationship name", null))
          .map(_.toString).toSeq
      ConnectionDef(
        id = str(c, "id", ""),
        name = str(c, "name", ""),
        sourceId = str(c, "source id", str(c, "source name", "")),
        relationships = rels,
        destinationId = str(c, "destination id", str(c, "destination name", "")),
        // lenient like getFlowFileExpiration (a unitless "12" or "0"
        // parses to 0 = never expire, it does not fail the load)
        expirationMs = opt(c.getOrElse("flowfile expiration", null))
          .flatMap(v => Units.parseDurationMsOpt(v.toString)).filter(_ > 0),
        maxQueueSize = opt(c.getOrElse("max work queue size", null))
          .flatMap(v => Units.parseIntegralOpt(v.toString))
          .getOrElse(ConnectionDef.DefaultQueueSize),
        maxQueueDataSize = opt(c.getOrElse("max work queue data size", null))
          .flatMap(v => Units.parseBytesOpt(v.toString))
          .getOrElse(ConnectionDef.DefaultQueueDataSize),
        swapThreshold = opt(c.getOrElse("swap threshold", null))
          .flatMap(v => Units.parseBytesOpt(v.toString)).getOrElse(0L),
        dropEmpty = opt(c.getOrElse("drop empty", null))
          .flatMap(v => Units.parseBoolOpt(v.toString)).getOrElse(false))
    }
    val svcs = groups.flatMap(g =>
      asList(g.getOrElse("Controller Services", null))).map { s0 =>
      val s = asMap(s0)
      ServiceDef(
        id = str(s, "id", str(s, "name", "")),
        name = str(s, "name", str(s, "id", "")),
        clazz = str(s, "class", str(s, "type", "")),
        properties = opt(s.getOrElse("Properties", null))
          .map(asMap(_).map { case (k, v) =>
            k -> (if (v == null) "" else v.toString) }.toMap)
          .getOrElse(Map.empty))
    }
    FlowDef(name, procs, conns, svcs)
  }

  /** Parse the JSON `rootGroup` schema (the examples' .json configs). */
  def parseJson(text: String): FlowDef = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // a couple of the reference's shipped configs carry trailing commas;
    // its rapidjson parse is permissive there, so be equally lenient
    mapper.configure(
      com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_TRAILING_COMMA, true)
    mapper.configure(
      com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_COMMENTS, true)
    val root = mapper.readValue(text, classOf[java.util.Map[String, Object]])
      .asScala
    val rg = asMap(root.getOrElse("rootGroup",
      throw new IllegalArgumentException("missing rootGroup")))
    val jgroups = flattenGroups(rg.toMap, "processGroups")
    val procs = jgroups.flatMap(g =>
      asList(g.getOrElse("processors", null)) ++
        asList(g.getOrElse("funnels", null)).map(funnelAsProcessor))
      .map { p0 =>
      val p = asMap(p0)
      ProcessorDef(
        id = str(p, "identifier", str(p, "name", "")),
        name = str(p, "name", str(p, "identifier", "")),
        clazz = str(p, "type", ""),
        schedulingStrategy = str(p, "schedulingStrategy", "TIMER_DRIVEN"),
        schedulingPeriod = str(p, "schedulingPeriod", "1 sec"),
        autoTerminated = asList(p.getOrElse("autoTerminatedRelationships",
          null)).map(_.toString).toSet,
        properties = opt(p.getOrElse("properties", null))
          .map(asMap(_).map { case (k, v) =>
            k -> (if (v == null) "" else v.toString) }.toMap)
          .getOrElse(Map.empty))
    }
    val conns = jgroups.flatMap(g => asList(g.getOrElse("connections", null)))
      .map { c0 =>
      val c = asMap(c0)
      ConnectionDef(
        id = str(c, "identifier", ""),
        name = str(c, "name", ""),
        sourceId = str(asMap(c.getOrElse("source", null)), "id", ""),
        relationships = asList(c.getOrElse("selectedRelationships", null))
          .map(_.toString),
        destinationId = str(asMap(c.getOrElse("destination", null)), "id", ""),
        expirationMs = opt(c.getOrElse("flowFileExpiration", null))
          .flatMap(v => Units.parseDurationMsOpt(v.toString)).filter(_ > 0),
        // JSON schema spellings (FlowSchema.cpp:115-124); the JSON plane
        // has no swap-threshold key
        maxQueueSize = opt(c.getOrElse("backPressureObjectThreshold", null))
          .flatMap(v => Units.parseIntegralOpt(v.toString))
          .getOrElse(ConnectionDef.DefaultQueueSize),
        maxQueueDataSize = opt(c.getOrElse("backPressureDataSizeThreshold", null))
          .flatMap(v => Units.parseBytesOpt(v.toString))
          .getOrElse(ConnectionDef.DefaultQueueDataSize),
        dropEmpty = opt(c.getOrElse("dropEmpty", null))
          .flatMap(v => Units.parseBoolOpt(v.toString)).getOrElse(false))
    }
    val svcs = jgroups.flatMap(g =>
      asList(g.getOrElse("controllerServices", null))).map { s0 =>
      val s = asMap(s0)
      ServiceDef(
        id = str(s, "identifier", str(s, "name", "")),
        name = str(s, "name", str(s, "identifier", "")),
        clazz = str(s, "type", ""),
        properties = opt(s.getOrElse("properties", null))
          .map(asMap(_).map { case (k, v) =>
            k -> (if (v == null) "" else v.toString) }.toMap)
          .getOrElse(Map.empty))
    }
    FlowDef(str(rg, "name", "MiNiFi Flow"), procs, conns, svcs)
  }

  /** Sniff YAML vs JSON by the first non-space character. */
  def parse(text: String): FlowDef =
    if (text.dropWhile(_.isWhitespace).startsWith("{")) parseJson(text)
    else parseYaml(text)

  /** Root group + all transitively nested child groups. */
  private def flattenGroups(root: scala.collection.Map[String, Object],
                            childKey: String): Seq[scala.collection.Map[String, Object]] =
    root +: asList(root.getOrElse(childKey, null))
      .flatMap(g => flattenGroups(asMap(g), childKey))

  /** A standalone funnel entry (id/name only) as a Funnel processor. */
  private def funnelAsProcessor(f0: Object): Object = {
    val f = asMap(f0)
    val m = new java.util.HashMap[String, Object]()
    val id = f.get("id").orElse(f.get("identifier")).map(_.toString)
      .getOrElse("")
    m.put("id", id); m.put("identifier", id)
    m.put("name", f.get("name").map(_.toString).getOrElse(id))
    m.put("class", "Funnel"); m.put("type", "Funnel")
    m
  }

  private def opt(v: Object): Option[Object] = Option(v)
  private def str(m: scala.collection.Map[String, Object], k: String,
                  default: String): String =
    m.get(k).flatMap(Option(_)).map(_.toString).getOrElse(default)
  private def asMap(v: Object): scala.collection.Map[String, Object] = v match {
    case null => Map.empty[String, Object]
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }
    case other =>
      throw new IllegalArgumentException(s"expected mapping, got $other")
  }
  private def asList(v: Object): Seq[Object] = v match {
    case null => Nil
    case l: java.util.List[_] => l.asScala.toSeq.map(_.asInstanceOf[Object])
    case other =>
      throw new IllegalArgumentException(s"expected list, got $other")
  }
}

/** Property unit parsers: "10 MB" data sizes and "1000 ms"/"2 sec"
  * periods (core-framework property parsing). */
object Units {
  private val Size = """(?i)\s*(\d+)\s*([kmgt]?i?b?)\s*""".r
  def parseBytes(s: String): Long = s match {
    case Size(n, u) =>
      val mult = u.toLowerCase.stripSuffix("ib").stripSuffix("b") match {
        case ""  => 1L
        case "k" => 1L << 10
        case "m" => 1L << 20
        case "g" => 1L << 30
        case "t" => 1L << 40
      }
      n.toLong * mult
    case other => throw new IllegalArgumentException(s"bad data size '$other'")
  }

  private val Dur = """(?i)\s*(\d+)\s*(ms|msec|millis(?:econds?)?|s|sec(?:onds?)?|m|min(?:utes?)?|h|hours?|d|days?)\s*""".r
  def parseDurationMs(s: String): Long = s match {
    case Dur(n, u) =>
      val mult = u.toLowerCase match {
        case "ms" | "msec" | "millis" | "millisecond" | "milliseconds" => 1L
        case "s" | "sec" | "second" | "seconds" => 1000L
        case "m" | "min" | "minute" | "minutes" => 60000L
        case "h" | "hour" | "hours" => 3600000L
        case "d" | "day" | "days" => 86400000L
      }
      n.toLong * mult
    case other => throw new IllegalArgumentException(s"bad duration '$other'")
  }

  def parseBool(s: String): Boolean = s.trim.equalsIgnoreCase("true")

  // ---- lenient variants (StructuredConnectionParser backward-compat
  // contract: invalid values fall back instead of failing the load) ----

  /** parseDataSize: None on any format the strict parser rejects
    * ("10 Incorrect", "2 Baby Pandas (img, 20 MB) that are …"). A bare
    * number is bytes. */
  def parseBytesOpt(s: String): Option[Long] =
    try Some(parseBytes(s)) catch { case _: IllegalArgumentException => None }

  /** parseIntegral: digits only — "2 KB" is invalid for a COUNT field
    * (StructuredConnectionParser.cpp:77). */
  def parseIntegralOpt(s: String): Option[Long] = s.trim.toLongOption

  /** StringToDuration: None on a unitless "12"/"0" (the reference logs
    * and treats it as 0 — "we should throw here, but we do not",
    * StructuredConnectionParser.cpp:186-193). */
  def parseDurationMsOpt(s: String): Option[Long] =
    try Some(parseDurationMs(s)) catch { case _: IllegalArgumentException => None }

  /** utils::string::toBool: case-insensitive true/false, None otherwise
    * ("sup", "NULL" → caller's value_or). */
  def parseBoolOpt(s: String): Option[Boolean] = s.trim.toLowerCase match {
    case "true" => Some(true)
    case "false" => Some(false)
    case _ => None
  }
}
