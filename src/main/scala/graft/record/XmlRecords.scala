package graft.record

import java.io.StringReader
import java.time.format.DateTimeFormatter
import java.time.{Instant, OffsetDateTime, ZoneOffset}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Schema-inferring XML record reader — the reference's XMLReader controller
 * service (extensions/standard-processors/controllers/XMLReader.cpp:100-170),
 * which has no Spark analogue: `from_xml` needs a schema up front, while the
 * reference infers per-leaf types from tag content and coalesces repeated
 * sibling tags into arrays dynamically. Records are emitted as canonical
 * JSON strings (document order, which makes the output deterministic where
 * the reference's unordered_map iteration is not), so the existing JSON
 * record machinery and the DuckDB oracle consume them directly.
 *
 * Semantics mirrored from XMLReader.cpp:
 *  - unparseable / empty content → null (read failure routing);
 *  - root with no children → empty record set; otherwise the root is ONE
 *    record, or with `recordsAsArray` each child of the root is a record
 *    (parseRecordsFromXml, XMLReader.cpp:146-166);
 *  - leaf typing: "true"/"false" → bool, then "%Y-%m-%dT%H:%M:%SZ" / RFC3339
 *    → timestamp (re-rendered at second precision per RecordField.cpp:42-44),
 *    then all-digit → unsigned integer, -digit → signed integer, then a
 *    C-strtod-style numeric *prefix* → double, else string
 *    (writeRecordField, XMLReader.cpp:56-100);
 *  - repeated sibling names append into an array
 *    (addRecordFieldToObject, XMLReader.cpp:37-53);
 *  - mixed text is concatenated under the content field name; nodes or
 *    attributes that clash with the content field name are dropped
 *    (parseXmlNode, XMLReader.cpp:123-137);
 *  - `parseAttributes` lifts XML attributes to fields under `attrPrefix`,
 *    forcing the element into object form (parseNodeElement, :102-121);
 *  - whitespace-only text nodes do not exist (pugixml parses with
 *    parse_ws_pcdata off), and CDATA is visible only through child_value()
 *    on childless elements, never accumulated as mixed content.
 *
 * This is a deliberate UDF: dynamic per-row schema inference cannot be a
 * Catalyst expression tree over a fixed schema. It is a narrow projection
 * (one string in, one array of strings out), so it rides inside the scan
 * stage with no shuffle implications at any scale.
 */
object XmlRecords {

  // -- typed leaf encoding -------------------------------------------------

  private val StrictUtc = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(ZoneOffset.UTC)
  // C strtod accepts an optional sign, digits with optional fraction, and
  // an optional exponent as a *prefix* of the string ("42abc" → 42.0)
  private val StrtodPrefix: Regex =
    """^[ \t\n\r\f]*[+-]?(?:\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)""".r
  private val Uint64Max = BigInt("18446744073709551615")

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      // rapidjson's Writer emits UPPERCASE hex for control chars (\u001B),
        // so byte-level equivalence against the reference holds (r18 ADVICE)
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04X")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def parseTimestamp(s: String): Option[Instant] = {
    val strict =
      try Some(Instant.from(StrictUtc.parse(s)))
      catch { case _: Exception => None }
    strict.orElse {
      // RFC3339: offset forms, optional fraction, case-insensitive T/Z
      try Some(OffsetDateTime.parse(s.toUpperCase, DateTimeFormatter.ISO_OFFSET_DATE_TIME).toInstant)
      catch { case _: Exception => None }
    }
  }

  private def renderTimestamp(i: Instant): String =
    "\"" + StrictUtc.format(i.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)) + "\""

  /** Leaf value → its JSON encoding per the reference's inference order. */
  private[graft] def typedLeafJson(value: String): String = {
    if (value == "true" || value == "false") return value
    parseTimestamp(value) match {
      case Some(i) => return renderTimestamp(i)
      case None    =>
    }
    if (value.nonEmpty && value.forall(_.isDigit)) {
      val b = BigInt(value)
      if (b <= Uint64Max) return b.toString
      // uint64 overflow falls through to the double path (stoull throws)
    }
    if (value.length > 1 && value.head == '-' && value.tail.forall(_.isDigit)) {
      try return java.lang.Long.parseLong(value).toString
      catch { case _: NumberFormatException => } // int64 overflow → double path
    }
    StrtodPrefix.findFirstIn(value) match {
      case Some(prefix) =>
        val d = java.lang.Double.parseDouble(prefix.trim)
        // rapidjson renders integral doubles with a trailing ".0" like Java
        d.toString
      case None => "\"" + jsonEscape(value) + "\""
    }
  }

  // -- dynamic record tree -------------------------------------------------

  private sealed trait RVal
  private final case class Leaf(json: String) extends RVal
  private final case class Arr(buf: mutable.ArrayBuffer[RVal]) extends RVal
  private final case class Obj(m: mutable.LinkedHashMap[String, RVal]) extends RVal

  private def addField(obj: Obj, name: String, v: RVal): Unit =
    obj.m.get(name) match {
      case Some(Arr(buf)) => buf += v
      case Some(prev)     => obj.m(name) = Arr(mutable.ArrayBuffer(prev, v))
      case None           => obj.m(name) = v
    }

  private def render(v: RVal): String = v match {
    case Leaf(j)  => j
    case Arr(buf) => buf.map(render).mkString("[", ",", "]")
    case Obj(m)   =>
      m.iterator.map { case (k, fv) => "\"" + jsonEscape(k) + "\":" + render(fv) }
        .mkString("{", ",", "}")
  }

  // -- XML tree (StAX: attributes stay in DOCUMENT order like pugixml;
  //    Xerces DOM NamedNodeMaps sort them alphabetically) -------------------

  private sealed trait XChild
  private final case class XText(text: String, cdata: Boolean) extends XChild
  private final case class XElem(name: String, attrs: Seq[(String, String)],
                                 children: mutable.ArrayBuffer[XChild]) extends XChild

  private lazy val staxFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, false)
    f
  }

  private def qname(prefix: String, local: String): String =
    if (prefix == null || prefix.isEmpty) local else prefix + ":" + local

  /** Merge adjacent same-kind text chunks (StAX may split at entity
    * boundaries; pugi stores contiguous pcdata as one node). */
  private def addText(el: XElem, t: String, cdata: Boolean): Unit =
    el.children.lastOption match {
      case Some(XText(prev, c)) if c == cdata =>
        el.children(el.children.size - 1) = XText(prev + t, cdata)
      case _ => el.children += XText(t, cdata)
    }

  private def parseTree(xml: String): Option[XElem] =
    try {
      val r = staxFactory.createXMLStreamReader(new StringReader(xml))
      var root: XElem = null
      val stack = mutable.Stack.empty[XElem]
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              val el = XElem(
                qname(r.getPrefix, r.getLocalName),
                (0 until r.getAttributeCount).map(i =>
                  qname(r.getAttributePrefix(i), r.getAttributeLocalName(i)) ->
                    r.getAttributeValue(i)),
                mutable.ArrayBuffer.empty)
              if (stack.nonEmpty) stack.top.children += el
              if (root == null) root = el
              stack.push(el)
            case XMLStreamConstants.END_ELEMENT => stack.pop()
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.SPACE =>
              if (stack.nonEmpty) addText(stack.top, r.getText, cdata = false)
            case XMLStreamConstants.CDATA =>
              if (stack.nonEmpty) addText(stack.top, r.getText, cdata = true)
            case _ => ()
          }
        }
      } finally r.close()
      Option(root)
    } catch { case _: Exception => None }

  /** pugi materializes element children, cdata, and only NON-whitespace
    * pcdata (parse_ws_pcdata is off by default). */
  private def pugiChildren(el: XElem): Seq[XChild] = el.children.toSeq.filter {
    case _: XElem        => true
    case XText(_, true)  => true
    case XText(t, false) => !t.forall(_.isWhitespace)
  }

  /** pugi node.child_value(): the first pcdata/cdata child's text. */
  private def childValue(el: XElem): String =
    pugiChildren(el).collectFirst { case XText(t, _) => t }.getOrElse("")

  private final class Walker(contentField: String, parseAttributes: Boolean,
                             attrPrefix: String) {

    private def writeField(obj: Obj, name: String, value: String,
                           pcdata: Boolean = false): Unit = {
      if (!pcdata && name == contentField) return
      addField(obj, name, Leaf(typedLeafJson(value)))
    }

    private def parseNodeElement(obj: Obj, el: XElem): Unit = {
      if (parseAttributes && el.attrs.nonEmpty) {
        val child = Obj(mutable.LinkedHashMap.empty)
        el.attrs.foreach { case (n, v) => writeField(child, attrPrefix + n, v) }
        parseXmlNode(child, el)
        addField(obj, el.name, child)
      } else if (el.children.exists(_.isInstanceOf[XElem])) {
        val child = Obj(mutable.LinkedHashMap.empty)
        parseXmlNode(child, el)
        addField(obj, el.name, child)
      } else {
        writeField(obj, el.name, childValue(el))
      }
    }

    def parseXmlNode(obj: Obj, node: XElem): Unit = {
      val pc = new StringBuilder
      node.children.foreach {
        case el: XElem                                       => parseNodeElement(obj, el)
        case XText(_, true)                                  => // pcdata only, never cdata
        case XText(t, false) if !t.forall(_.isWhitespace)    => pc.append(t)
        case _                                               =>
      }
      if (pc.nonEmpty) writeField(obj, contentField, pc.toString, pcdata = true)
    }

    def recordFromNode(node: XChild): String = node match {
      case el: XElem =>
        val obj = Obj(mutable.LinkedHashMap.empty)
        parseXmlNode(obj, el)
        render(obj)
      // a bare text node between records walks as a childless node: {}
      case _: XText => "{}"
    }
  }

  // -- entry points --------------------------------------------------------

  /**
   * Parse one FlowFile's XML content into its record set (JSON strings).
   * Returns None on a parse failure (→ failure routing), Some(Nil) for a
   * childless root ("does not contain any records").
   */
  def parseRecords(xml: String, contentField: String = "value",
                   parseAttributes: Boolean = false, attrPrefix: String = "",
                   recordsAsArray: Boolean = false): Option[Seq[String]] = {
    if (xml == null) return None
    parseTree(xml).map { root =>
      val w = new Walker(contentField, parseAttributes, attrPrefix)
      if (recordsAsArray) pugiChildren(root).map(w.recordFromNode)
      else if (pugiChildren(root).isEmpty) Nil
      else Seq(w.recordFromNode(root))
    }
  }

  /** Column form: array<string> of per-record JSON, null on parse failure. */
  def xmlRecords(content: Column, contentField: String = "value",
                 parseAttributes: Boolean = false, attrPrefix: String = "",
                 recordsAsArray: Boolean = false): Column = {
    val fn = udf { (xml: String) =>
      parseRecords(xml, contentField, parseAttributes, attrPrefix,
        recordsAsArray).map(_.toArray).orNull
    }
    fn(content)
  }

  // -- XMLRecordSetWriter --------------------------------------------------

  /**
   * XMLRecordSetWriter configuration — the controller's full property
   * surface (XMLRecordSetWriter.h; semantics XMLRecordSetWriter.cpp:27-64).
   * `validated()` applies the reference's onEnable rules with its exact
   * error texts: record/root tag required, the two array-wrap modes
   * require Array Tag Name, unknown wrap values rejected.
   */
  case class XmlWriterOptions(
      recordTag: String,
      rootTag: String,
      wrapElementsOfArrays: String = "No Wrapping",
      arrayTagName: String = "",
      omitXmlDeclaration: Boolean = false,
      prettyPrint: Boolean = false) {
    def validated(): XmlWriterOptions = {
      val wrapValues =
        Set("No Wrapping", "Use Property as Wrapper", "Use Property for Elements")
      if (!wrapValues(wrapElementsOfArrays))
        throw new IllegalArgumentException(
          s"Invalid value for Wrap Elements of Arrays property: $wrapElementsOfArrays")
      if (arrayTagName.isEmpty && wrapElementsOfArrays != "No Wrapping")
        throw new IllegalArgumentException(
          "Array Tag Name property must be set when Wrap Elements of Arrays " +
          "is set to Use Property as Wrapper or Use Property for Elements")
      if (recordTag.isEmpty)
        throw new IllegalArgumentException("Name of Record Tag property must be set")
      if (rootTag.isEmpty)
        throw new IllegalArgumentException("Name of Root Tag property must be set")
      this
    }
  }

  private sealed trait WNode
  private final case class WElem(name: String, children: Seq[WElem],
                                 text: Option[String]) extends WNode

  /** fmt "{:g}" (XMLRecordSetWriter.cpp:117): %g with trailing zeros and a
    * bare trailing dot stripped from the mantissa; inf/nan lowercase. */
  private def gFormat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    val s = String.format(java.util.Locale.ROOT, "%g", Double.box(d))
    val i = s.indexWhere(c => c == 'e' || c == 'E')
    val (m, e) = if (i < 0) (s, "") else (s.substring(0, i), s.substring(i))
    val m2 =
      if (m.contains('.')) m.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else m
    m2 + e
  }

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  private def leafText(v: Any): String = v match {
    case b: Boolean => if (b) "true" else "false"
    case d: Double  => gFormat(d)
    case f: Float   => gFormat(f.toDouble)
    case t: java.sql.Timestamp =>
      StrictUtc.format(t.toInstant) // second precision, like getDateTimeStr
    case i: Instant => StrictUtc.format(i)
    case other      => other.toString
  }

  /** convertRecordField / convertRecordArrayField
    * (XMLRecordSetWriter.cpp:82-136): arrays dispatch on the wrap mode —
    * wrapper = one Array-Tag node holding field-named elements; elements =
    * one field-named node holding Array-Tag elements; no wrapping =
    * repeated field-named siblings. Null fields emit nothing. */
  private def fieldNodes(name: String, v: Any,
                         o: XmlWriterOptions): Seq[WElem] = v match {
    case null => Nil
    case arr: scala.collection.Seq[_] => o.wrapElementsOfArrays match {
      case "Use Property as Wrapper" =>
        Seq(WElem(o.arrayTagName,
          arr.toSeq.flatMap(fieldNodes(name, _, o)), None))
      case "Use Property for Elements" =>
        Seq(WElem(name,
          arr.toSeq.flatMap(fieldNodes(o.arrayTagName, _, o)), None))
      case _ =>
        arr.toSeq.flatMap(fieldNodes(name, _, o))
    }
    case r: org.apache.spark.sql.Row =>
      Seq(WElem(name, rowNodes(r, o), None))
    case other => Seq(WElem(name, Nil, Some(leafText(other))))
  }

  private def rowNodes(r: org.apache.spark.sql.Row,
                       o: XmlWriterOptions): Seq[WElem] =
    r.schema.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
      fieldNodes(f.name, if (r.isNullAt(i)) null else r.get(i), o)
    }

  /** pugixml save with format_indent ("  ") or format_raw, optional
    * declaration (formatXmlOutput, XMLRecordSetWriter.cpp:66-80):
    * childless elements self-close, text-only elements stay inline,
    * pretty output ends with a newline. */
  private def serialize(root: WElem, o: XmlWriterOptions): String = {
    val sb = new StringBuilder
    if (!o.omitXmlDeclaration) {
      sb.append("<?xml version=\"1.0\"?>")
      if (o.prettyPrint) sb.append('\n')
    }
    def ser(e: WElem, depth: Int): Unit = {
      if (o.prettyPrint) sb.append("  " * depth)
      sb.append('<').append(e.name)
      if (e.children.isEmpty && e.text.isEmpty) sb.append("/>")
      else if (e.children.isEmpty) {
        sb.append('>').append(xmlEscape(e.text.get))
          .append("</").append(e.name).append('>')
      } else {
        sb.append('>')
        if (o.prettyPrint) sb.append('\n')
        e.children.foreach { k =>
          ser(k, depth + 1)
          if (o.prettyPrint) sb.append('\n')
        }
        if (o.prettyPrint) sb.append("  " * depth)
        sb.append("</").append(e.name).append('>')
      }
    }
    ser(root, 0)
    if (o.prettyPrint) sb.append('\n')
    sb.toString
  }

  /** Render one record set (a Seq of record Rows) as the reference's XML
    * document: root tag wrapping one record-tag node per record
    * (convertRecordSetToXml, XMLRecordSetWriter.cpp:138-151). */
  def recordSetToXml(records: scala.collection.Seq[org.apache.spark.sql.Row],
                     opts: XmlWriterOptions): String = {
    val o = opts.validated()
    val root = WElem(o.rootTag,
      Option(records).getOrElse(Nil).toSeq
        .map(r => WElem(o.recordTag, rowNodes(r, o), None)),
      None)
    serialize(root, o)
  }

  /** Column form: ARRAY<STRUCT<...>> record set → XML string. Options are
    * validated at plan build (schedule time), exactly like onEnable. */
  def recordSetXml(recordsCol: Column, opts: XmlWriterOptions): Column = {
    val o = opts.validated()
    val fn = udf(
      new org.apache.spark.sql.api.java.UDF1[
          scala.collection.Seq[org.apache.spark.sql.Row], String] {
        override def call(rows: scala.collection.Seq[org.apache.spark.sql.Row])
            : String = recordSetToXml(rows, o)
      },
      org.apache.spark.sql.types.StringType)
    fn(recordsCol)
  }
}
