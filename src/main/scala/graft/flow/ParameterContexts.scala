package graft.flow

/**
 * Parameter-context plane: `#{param}` token parsing and substitution in
 * flow-config property values — the reference's ParameterTokenParser
 * (libminifi/src/core/ParameterTokenParser.cpp:26-99) and ParameterContext
 * (libminifi/src/core/ParameterContext.cpp:22-40), validated exactly like
 * StructuredConfiguration::parseParameterContexts
 * (libminifi/src/core/flow/StructuredConfiguration.cpp:150-295).
 *
 * Substitution happens once at config-load time (driver-side, bounded by
 * config size), never per-row — the substituted property strings are what
 * the flow assembly compiles into Catalyst plans, so this plane has no
 * 100 TB cost at all.
 */

/** The reference's ParameterException carries a "Parameter Operation: "
  * category prefix in its what() (test strings assert it verbatim). */
class ParameterException(msg: String)
    extends IllegalArgumentException("Parameter Operation: " + msg)

sealed trait ParamToken {
  def start: Int
  def size: Int
}
/** An even run of '#' before `{...}`: half the hashmarks plus the literal
  * `{name}` survive, nothing is substituted (ParameterTokenParser.cpp:49). */
final case class EscapedToken(start: Int, size: Int, literal: String)
    extends ParamToken
/** An odd run of '#': the token substitutes to (hashmarks-1)/2 literal '#'
  * plus the parameter value (ParameterTokenParser.cpp:56,94). */
final case class ReplaceableToken(name: String, extraHashmarks: Int,
                                  start: Int, size: Int) extends ParamToken

/** One parameter context with resolved inheritance links. Lookup is own
  * parameters first, then each inherited context depth-first in declaration
  * order (ParameterContext.cpp:29-40). */
final class ResolvedParameterContext(
    val name: String,
    params: Map[String, ParameterDef],
    inherited: () => Seq[ResolvedParameterContext]) {
  def getParameter(pname: String): Option[ParameterDef] = {
    params.get(pname).orElse(
      inherited().iterator.flatMap(_.getParameter(pname)).nextOption())
  }
}

object ParameterTokens {
  // token-name charset (ParameterTokenParser.cpp:27): full match required
  private val NameRe = "[-a-zA-Z0-9_. ]+".r

  /** Exact port of ParameterTokenParser::parse (cpp:26-70): a run of '#'
    * immediately followed by `{name}`; '{' without a leading hash run and
    * '}' outside a token are literal; an unfinished `#{name` is no token. */
  def parse(input: String): Seq[ParamToken] = {
    val tokens = Seq.newBuilder[ParamToken]
    var state = 0 // 0 = outside, 1 = in hashmark run, 2 = in token
    var tokenStart = 0
    var hashmarks = 0
    var i = 0
    while (i < input.length) {
      input.charAt(i) match {
        case '#' =>
          if (state == 0) state = 1
          if (state != 2) hashmarks += 1
        case '{' =>
          if (state == 1) { tokenStart = i - hashmarks; state = 2 }
        case '}' =>
          if (state == 2) {
            state = 0
            if (hashmarks % 2 == 0) {
              // even # count: escaped — keep half the hashes + "{name}"
              tokens += EscapedToken(tokenStart, i - tokenStart + 1,
                input.substring(tokenStart + hashmarks / 2, i + 1))
            } else {
              val name =
                input.substring(tokenStart + hashmarks + 1, i)
              if (name.isEmpty || !NameRe.matches(name))
                throw new ParameterException(s"Invalid token name: '$name'. " +
                  "Only alpha-numeric characters (a-z, A-Z, 0-9), hyphens " +
                  "( - ), underscores ( _ ), periods ( . ), and spaces are " +
                  "allowed in token name.")
              tokens += ReplaceableToken(name, (hashmarks - 1) / 2,
                tokenStart, i - tokenStart + 1)
            }
          } else state = 0
          hashmarks = 0
        case _ =>
          if (state != 2) { state = 0; hashmarks = 0 }
      }
      i += 1
    }
    tokens.result()
  }

  /** ParameterTokenParser::replaceParameters (cpp:72-113). `sensitive` is
    * the PROPERTY's sensitivity: a sensitive property may only reference
    * sensitive parameters and vice versa (cpp:101-113). The reference
    * decrypts sensitive values with the config cipher; this engine has no
    * cipher, so values are carried as-is (documented divergence). */
  def substitute(input: String, ctx: Option[ResolvedParameterContext],
                 sensitive: Boolean): String = {
    val tokens = parse(input)
    if (tokens.isEmpty) return input
    val sb = new StringBuilder
    var lastEnd = 0
    tokens.foreach { t =>
      sb.append(input.substring(lastEnd, t.start))
      t match {
        case EscapedToken(_, _, literal) => sb.append(literal)
        case ReplaceableToken(name, extra, _, _) =>
          val c = ctx.getOrElse(throw new ParameterException(
            "Property references a parameter in its value, but no " +
              "parameter context was provided."))
          val p = c.getParameter(name).getOrElse(
            throw new ParameterException(s"Parameter '$name' not found"))
          if (sensitive && !p.sensitive)
            throw new ParameterException(s"Non-sensitive parameter '$name' " +
              "cannot be referenced in a sensitive property")
          if (!sensitive && p.sensitive)
            throw new ParameterException(s"Sensitive parameter '$name' " +
              "cannot be referenced in a non-sensitive property")
          sb.append("#" * extra).append(p.value)
      }
      lastEnd = t.start + t.size
    }
    sb.append(input.substring(lastEnd))
    sb.toString
  }
}

object ParameterContexts {

  /** Build the validated name→context map: unique context names
    * (StructuredConfiguration.cpp:191), unique parameter names within a
    * context (ParameterContext.cpp:22-27), inherited contexts must exist,
    * differ from the owner, and form no cycle (cpp:280,285,177). */
  def build(defs: Seq[ParameterContextDef]): Map[String, ResolvedParameterContext] = {
    val byName = collection.mutable.LinkedHashMap[String, ResolvedParameterContext]()
    defs.foreach { d =>
      if (byName.contains(d.name))
        throw new IllegalArgumentException(s"Parameter context name " +
          s"'${d.name}' already exists, parameter context names must be unique!")
      val params = collection.mutable.LinkedHashMap[String, ParameterDef]()
      d.parameters.foreach { p =>
        if (params.contains(p.name))
          throw new ParameterException(s"Parameter name '${p.name}' already " +
            "exists, parameter names must be unique within a parameter context!")
        params(p.name) = p
      }
      // inherited contexts resolve lazily: contexts may inherit from ones
      // declared later in the document (inheritance is wired in a second
      // pass in the reference, StructuredConfiguration.cpp:270-295)
      byName(d.name) = new ResolvedParameterContext(d.name, params.toMap,
        () => d.inherits.map(byName(_)))
    }
    // second pass: inheritance validation
    defs.foreach { d =>
      d.inherits.foreach { inh =>
        if (!byName.contains(inh))
          throw new IllegalArgumentException(
            s"Inherited parameter context '$inh' does not exist!")
        if (inh == d.name)
          throw new IllegalArgumentException(s"Inherited parameter context " +
            s"'$inh' cannot be the same as the parameter context!")
      }
    }
    // cycle detection (DFS with a visited set across roots, cpp:150-180)
    val visited = collection.mutable.Set[String]()
    def hasCycle(name: String, stack: Set[String]): Boolean = {
      if (stack.contains(name)) return true
      if (visited.contains(name)) return false
      visited += name
      defs.find(_.name == name).toSeq.flatMap(_.inherits)
        .exists(hasCycle(_, stack + name))
    }
    defs.foreach { d =>
      if (hasCycle(d.name, Set.empty))
        throw new IllegalArgumentException("Circular references in Parameter " +
          "Context inheritance are not allowed. Inheritance cycle was " +
          s"detected in parameter context '${d.name}'")
    }
    byName.toMap
  }

  /** Property sensitivity is scoped to each component class's DECLARED
    * properties: the reference reads it off `getSupportedProperty`
    * (StructuredConfiguration.cpp:896-912), so a property the class does
    * not declare — a dynamic property like a RouteOnAttribute rule, even
    * one named "Password" — is NEVER sensitive
    * (StructuredConfiguration.cpp:819-828, parsePropertyValueSequence's
    * valueOrElse(false)). The table mirrors every `isSensitive(true)`
    * declaration in the reference, with base-class declarations
    * (KafkaProcessorBase.h:87, AbstractMQTTProcessor.h:153+169,
    * SFTPProcessorBase.h, AwsProcessor.h, SplunkHECProcessor.h:52,
    * AzureBlobStorageProcessorBase.h) expanded to their concrete
    * processors. */
  private val KafkaSensitive = Set("Password")
  private val MqttSensitive = Set("Password", "Security Pass Phrase")
  private val SftpSensitive =
    Set("Password", "Private Key Passphrase", "Http Proxy Password")
  private val AwsSensitive = Set("Secret Key", "Proxy Password")
  private val AzureBlobSensitive =
    Set("Storage Account Key", "SAS Token", "Managed Identity Client ID")
  private val SplunkSensitive = Set("Token")
  private val GcsSensitive = Set("Server Side Encryption Key")
  private val OpcSensitive = Set("Password")

  val SensitiveByClass: Map[String, Set[String]] = Map(
    "InvokeHTTP" -> Set("Proxy Password"),                 // InvokeHTTP.h:193
    "PublishKafka" -> (KafkaSensitive + "Security Pass Phrase"), // PublishKafka.h:192
    "ConsumeKafka" -> KafkaSensitive,
    "PublishMQTT" -> MqttSensitive, "ConsumeMQTT" -> MqttSensitive,
    "PutSplunkHTTP" -> SplunkSensitive,
    "QuerySplunkIndexingStatus" -> SplunkSensitive,
    "PushGrafanaLokiREST" -> Set("Password"),              // PushGrafanaLokiREST.h
    "PutSFTP" -> SftpSensitive, "FetchSFTP" -> SftpSensitive,
    "ListSFTP" -> SftpSensitive,
    "PutS3Object" -> AwsSensitive, "DeleteS3Object" -> AwsSensitive,
    "FetchS3Object" -> AwsSensitive, "ListS3" -> AwsSensitive,
    "PutKinesisStream" -> AwsSensitive,
    "PutAzureBlobStorage" -> AzureBlobSensitive,
    "DeleteAzureBlobStorage" -> AzureBlobSensitive,
    "FetchAzureBlobStorage" -> AzureBlobSensitive,
    "ListAzureBlobStorage" -> AzureBlobSensitive,
    "PutGCSObject" -> GcsSensitive, "FetchGCSObject" -> GcsSensitive,
    "PutOPCProcessor" -> OpcSensitive, "FetchOPCProcessor" -> OpcSensitive,
    // controller services
    "SSLContextService" -> Set("Passphrase"),              // SSLContextService.h:141
    "ElasticsearchCredentialsControllerService" -> Set("Password", "API Key"),
    "CouchbaseClusterService" -> Set("User Password"),
    "ProxyConfigurationService" -> Set("Proxy User Password"),
    "AWSCredentialsService" -> Set("Secret Key"),
    "AzureStorageCredentialsService" -> AzureBlobSensitive,
    "GCPCredentialsControllerService" -> Set("Service Account JSON"),
    "SmbConnectionControllerService" -> Set("Password"),
    "ODBCService" -> Set("Connection String"))             // DatabaseService.h

  /** componentClass may be fully qualified (org.apache.nifi.minifi.* —
    * the last dotted segment is the class). */
  def isSensitiveProperty(componentClass: String, name: String): Boolean = {
    val kind = componentClass.substring(componentClass.lastIndexOf('.') + 1)
    SensitiveByClass.getOrElse(kind, Set.empty).contains(name)
  }
}
