package graft.ops

import scala.collection.immutable.TreeMap
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, NullNode, ObjectNode, TextNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Jolt Shiftr — full wildcard/template engine re-deriving the reference's
 * custom Jolt implementation (extensions/standard-processors/utils/
 * JoltUtils.cpp, ~1.1k lines; semantics traced from JoltUtils.cpp:1001-1140
 * process/processMember/putValue and the parse family at :380-700):
 *
 *  - literal keys (checked first, in spec order), `a|b` alternatives
 *    (reference extension, parseMap JoltUtils.cpp:615-662), `\\`-escapes;
 *  - `&`, `&n`, `&(n,m)` templates in keys, destinations, and paths —
 *    n = levels up the match-context chain, m = wildcard submatch index;
 *  - `*` wildcards (`*a*` patterns; submatches feed `&(n,m)`), matched
 *    after literals and templates, both in canonical-string order
 *    (std::map ordering, JoltUtils.h:190-192 — the "matches are correctly
 *    ordered" reference test);
 *  - `@`, `@n`, `@(n,path)` value references (write an ancestor's value);
 *  - `$`, `$n`, `$(n,m)` key access (write the matched KEY);
 *  - `#literal` defaults (write a literal string);
 *  - destinations: dot paths, `[n]` array writes (null-padded), `[]`
 *    append, `[#n]` match-count index, `[&(n,m)]` evaluated index,
 *    multi-destinations (array of strings), and the automatic-array rule
 *    (second write to one slot wraps it into an array, putValue tail
 *    JoltUtils.cpp:938-948);
 *  - arrays processed as maps with numeric keys; scalar inputs matched as
 *    keys with a null member value.
 *
 * Runs as a String→String UDF over Jackson trees: Jolt's output keys are
 * data-dependent, so a static Catalyst projection cannot express the
 * general transform (the codegen-friendly subset lives in
 * Content.joltShift). The spec compiles ONCE at plan build; per row only
 * the tree walk runs.
 */
object JoltShift {

  private val F = JsonNodeFactory.instance

  sealed trait MemberType
  case object Field extends MemberType
  case object Index extends MemberType

  private val SpecialChars = Set('.', '[', ']', '$', '&', '@', '#', '*')

  /** Match-context frame: one per matched spec level (JoltUtils.h:42-83).
    * `matches` = full match + wildcard submatches; `node` = matched input
    * subtree (null for key-only frames); `matchCount` = successful member
    * matches so far at this level (feeds `[#n]`). */
  final class Ctx(val parent: Ctx, val matches: Vector[String],
                  val node: JsonNode, var matchCount: Int = 0) {
    def find(idx: Int): Ctx =
      if (idx == 0) this else if (parent != null) parent.find(idx - 1) else null
    def extend(subMatches: Vector[String], subNode: JsonNode): Ctx =
      new Ctx(this, subMatches, subNode)
    /** processObject/processArray's local copy: same parent/matches/node,
      * fresh member-match counter (JoltUtils.cpp:1042,1062). */
    def shallowCopy: Ctx = new Ctx(parent, matches, node)
  }

  /** `a&(n,m)b` key/destination template (JoltUtils.h:85-133). */
  final case class Template(fragments: Vector[String], refs: Vector[(Int, Int)]) {
    val full: String = {
      val sb = new StringBuilder(fragments.head)
      refs.indices.foreach { i =>
        sb.append("&(").append(refs(i)._1).append(",").append(refs(i)._2)
          .append(")").append(fragments(i + 1))
      }
      sb.toString
    }
    def isEmpty: Boolean = fragments.size == 1 && fragments.head.isEmpty
    def eval(ctx: Ctx): String = {
      val sb = new StringBuilder
      refs.indices.foreach { i =>
        sb.append(fragments(i))
        val (lvl, m) = refs(i)
        val target = ctx.find(lvl)
        if (target == null)
          throw new IllegalArgumentException(s"invalid reference to level $lvl")
        if (target.matches.size <= m)
          throw new IllegalArgumentException(
            s"no match $m in '${target.matches.head}'")
        sb.append(target.matches(m))
      }
      sb.append(fragments.last)
      sb.toString
    }
  }

  /** `*`-wildcard pattern; submatches are the between-fragment spans
    * (JoltUtils.cpp:276-330). */
  final case class Wildcard(fragments: Vector[String]) {
    val full: String = fragments.mkString("*")
    def matchKey(s: String): Option[Vector[String]] = {
      if (fragments.size == 1)
        return if (s == fragments.head) Some(Vector(s)) else None
      if (!s.startsWith(fragments.head)) return None
      val out = Vector.newBuilder[String]
      out += s
      var pos = fragments.head.length
      var i = 1
      while (i + 1 < fragments.size) {
        val frag = fragments(i)
        val next = if (frag.isEmpty) s.length else s.indexOf(frag, pos)
        if (next < 0) return None
        out += s.substring(pos, next)
        pos = next + frag.length
        i += 1
      }
      val last = fragments.last
      if (s.length - pos < last.length) return None
      if (!s.endsWith(last)) return None
      out += s.substring(pos, s.length - last.length)
      Some(out.result())
    }
  }

  type Path = Vector[(Template, MemberType)]
  /** `@(idx, path)` value reference. */
  final case class ValueRef(idx: Int, path: Path)

  sealed trait DestSeg { def mtype: MemberType }
  final case class TemplateSeg(t: Template, mtype: MemberType) extends DestSeg
  final case class ValueRefSeg(ref: ValueRef, mtype: MemberType) extends DestSeg
  final case class MatchIdxSeg(level: Int, mtype: MemberType) extends DestSeg

  type Destination = Vector[DestSeg]
  type Destinations = Vector[Destination]

  /** One spec level: classification per parseMember (JoltUtils.cpp:533-610). */
  final class Pattern(
      val literals: Vector[(String, Option[Int], Either[Pattern, Destinations])],
      val literalIdx: Map[String, Int],
      val templates: TreeMap[String, (Template, Either[Pattern, Destinations])],
      val wildcards: TreeMap[String, (Wildcard, Either[Pattern, Destinations])],
      val values: Vector[(ValueRef, Either[Pattern, Destinations])],
      val keys: TreeMap[(Int, Int), Destinations],
      val defaults: TreeMap[String, Destinations]) extends Serializable

  // ---------------- parsing ----------------

  private final class Cursor(val s: String, var i: Int) {
    def done: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
  }

  /** Template.parse (JoltUtils.cpp:44-190): consumes until an unescaped
    * `.`/`[`/`]`/`)` terminator. */
  private def parseTemplate(c: Cursor): Template = {
    val frags = Vector.newBuilder[String]
    val refs = Vector.newBuilder[(Int, Int)]
    val cur = new StringBuilder
    def flush(): Unit = { frags += cur.toString; cur.clear() }
    while (!c.done && !".[])".contains(c.peek)) {
      c.peek match {
        case '\\' =>
          c.i += 1
          if (c.done) throw new IllegalArgumentException("unterminated escape")
          val ch = c.peek
          if (ch != '\\' && !SpecialChars.contains(ch))
            throw new IllegalArgumentException(s"unknown escape \\$ch")
          cur.append(ch); c.i += 1
        case '&' =>
          flush()
          c.i += 1
          if (!c.done && c.peek == '(') {
            c.i += 1
            val n = parseInt(c)
            if (c.done) throw new IllegalArgumentException("unterminated &(")
            if (c.peek == ',') {
              c.i += 1
              val m = parseInt(c)
              expect(c, ')')
              refs += ((n, m))
            } else { expect(c, ')'); refs += ((n, 0)) }
          } else if (!c.done && c.peek.isDigit) {
            refs += ((parseInt(c), 0))
          } else refs += ((0, 0))
        case ch => cur.append(ch); c.i += 1
      }
    }
    flush()
    Template(frags.result(), refs.result())
  }

  private def parseInt(c: Cursor): Int = {
    val start = c.i
    while (!c.done && c.peek.isDigit) c.i += 1
    if (c.i == start) throw new IllegalArgumentException("expected digits")
    c.s.substring(start, c.i).toInt
  }

  private def expect(c: Cursor, ch: Char): Unit = {
    if (c.done || c.peek != ch)
      throw new IllegalArgumentException(s"expected '$ch'")
    c.i += 1
  }

  /** Wildcard / literal parse with escapes (JoltUtils.cpp:216-274,425-460). */
  private def splitUnescaped(s: String, sep: Char): Vector[Vector[String]] = {
    // outer split on unescaped '|', keeping escapes for inner parsing
    val alts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length && s.charAt(i + 1) == '|' =>
          cur.append('|'); i += 2
        case '\\' =>
          cur.append('\\')
          if (i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 2 }
          else throw new IllegalArgumentException("unterminated escape")
        case `sep` => alts += cur.toString; cur.clear(); i += 1
        case ch    => cur.append(ch); i += 1
      }
    }
    alts += cur.toString
    Vector(alts.result())
  }

  private def hasUnescaped(s: String, ch: Char): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\') i += 2
      else if (s.charAt(i) == ch) return true
      else i += 1
    }
    false
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\') {
        if (i + 1 >= s.length)
          throw new IllegalArgumentException("unterminated escape")
        val ch = s.charAt(i + 1)
        if (ch != '\\' && !SpecialChars.contains(ch))
          throw new IllegalArgumentException(s"unknown escape \\$ch")
        sb.append(ch); i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def parseWildcard(s: String): Wildcard = {
    val frags = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' =>
          if (i + 1 >= s.length)
            throw new IllegalArgumentException("unterminated escape")
          val ch = s.charAt(i + 1)
          if (ch != '\\' && !SpecialChars.contains(ch))
            throw new IllegalArgumentException(s"unknown escape \\$ch")
          cur.append(ch); i += 2
        case '*' => frags += cur.toString; cur.clear(); i += 1
        case ch  => cur.append(ch); i += 1
      }
    }
    frags += cur.toString
    Wildcard(frags.result())
  }

  /** `$`, `$n`, `$(n,m)` (parseKeyAccess, JoltUtils.cpp:335-425). */
  private def parseKeyAccess(s: String): (Int, Int) = {
    require(s.startsWith("$"))
    if (s == "$") (0, 0)
    else if (s.charAt(1) == '(') {
      val c = new Cursor(s, 2)
      val n = parseInt(c)
      if (!c.done && c.peek == ',') {
        c.i += 1
        val m = parseInt(c)
        expect(c, ')')
        (n, m)
      } else { expect(c, ')'); (n, 0) }
    } else (s.substring(1).toInt, 0)
  }

  /** `@`, `@n`, `@path`, `@(n)`, `@(n,path)` (parseValueReference,
    * JoltUtils.cpp:478-532). */
  private def parseValueRef(c: Cursor, greedyPath: Boolean): ValueRef = {
    expect(c, '@')
    if (c.done) return ValueRef(0, Vector.empty)
    if (c.peek != '(') {
      if (c.peek.isDigit) return ValueRef(c.s.substring({
        val st = c.i; while (!c.done && c.peek.isDigit) c.i += 1; st
      }, c.i).toInt, Vector.empty)
      if (greedyPath) ValueRef(0, parsePath(c))
      else {
        val t = parseTemplate(c)
        ValueRef(0, Vector((t, Field)))
      }
    } else {
      c.i += 1
      var idx = 0
      if (!c.done && c.peek.isDigit) {
        idx = parseInt(c)
        if (c.done) throw new IllegalArgumentException("expected ')'")
        if (c.peek == ')') { c.i += 1; return ValueRef(idx, Vector.empty) }
        expect(c, ',')
      }
      val p = parsePath(c)
      expect(c, ')')
      ValueRef(idx, p)
    }
  }

  /** Dot/bracket path of pure templates (parsePath, JoltUtils.cpp:462-477). */
  private def parsePath(c: Cursor): Path = {
    parseDestination(c).map {
      case TemplateSeg(t, m) => (t, m)
      case _ => throw new IllegalArgumentException(
        "value reference path cannot nest value references")
    }
  }

  /** One destination: dot fields and `[...]` indices (parseDestination,
    * JoltUtils.cpp:681-738). */
  private def parseDestination(c: Cursor): Destination = {
    val out = Vector.newBuilder[DestSeg]
    var mtype: MemberType = Field
    def atEnd: Boolean = c.done || c.peek == ')'
    while (!atEnd) {
      if (!c.done && c.peek == '#' && mtype != Index)
        throw new IllegalArgumentException(
          "matching index can only be used in index context")
      if (!c.done && c.peek == '#' && mtype == Index) {
        c.i += 1
        val lvl = { val st = c.i; while (!c.done && c.peek.isDigit) c.i += 1
          if (c.i == st) 0 else c.s.substring(st, c.i).toInt }
        out += MatchIdxSeg(lvl, Index)
      } else if (!c.done && c.peek == '@') {
        out += ValueRefSeg(parseValueRef(c, greedyPath = false), mtype)
      } else {
        out += TemplateSeg(parseTemplate(c), mtype)
      }
      if (mtype == Index) expect(c, ']')
      if (!atEnd) {
        c.peek match {
          case '.' => mtype = Field; c.i += 1
          case '[' => mtype = Index; c.i += 1
          case ch  => throw new IllegalArgumentException(s"unexpected '$ch'")
        }
        if (c.done) throw new IllegalArgumentException("unterminated member")
      }
    }
    out.result()
  }

  private def parseDestinations(v: JsonNode): Destinations = {
    if (v == null || v.isNull) return Vector.empty
    def one(s: String): Destination = {
      val c = new Cursor(s, 0)
      val d = parseDestination(c)
      if (!c.done) throw new IllegalArgumentException(
        s"failed to fully parse destination '$s'")
      d
    }
    if (v.isArray) {
      val it = v.elements()
      val out = Vector.newBuilder[Destination]
      while (it.hasNext) {
        val e = it.next()
        if (!e.isTextual) throw new IllegalArgumentException(
          "expected a string or array of strings")
        out += one(e.asText())
      }
      out.result()
    } else if (v.isTextual) Vector(one(v.asText()))
    else throw new IllegalArgumentException("expected a string or array of strings")
  }

  private def parseValue(v: JsonNode): Either[Pattern, Destinations] =
    if (v.isObject) Left(parseMap(v)) else Right(parseDestinations(v))

  /** Spec-object parse with `|` alternatives (parseMap JoltUtils.cpp:613-662,
    * parseMember :533-610). */
  private def parseMap(v: JsonNode): Pattern = {
    if (!v.isObject) throw new IllegalArgumentException("expected a map")
    var literals = Vector.empty[(String, Option[Int], Either[Pattern, Destinations])]
    var literalIdx = Map.empty[String, Int]
    var templates = TreeMap.empty[String, (Template, Either[Pattern, Destinations])]
    var wildcards = TreeMap.empty[String, (Wildcard, Either[Pattern, Destinations])]
    var values = Vector.empty[(ValueRef, Either[Pattern, Destinations])]
    var keys = TreeMap.empty[(Int, Int), Destinations]
    var defaults = TreeMap.empty[String, Destinations]

    val fields = v.fields()
    while (fields.hasNext) {
      val e = fields.next()
      val member = e.getValue
      splitUnescaped(e.getKey, '|').head.foreach { name =>
        if (name.startsWith("@")) {
          val c = new Cursor(name, 0)
          val ref = parseValueRef(c, greedyPath = true)
          if (!c.done) throw new IllegalArgumentException(
            "failed to fully parse value reference")
          values :+= ((ref, parseValue(member)))
        } else if (name.startsWith("$")) {
          keys += parseKeyAccess(name) -> parseDestinations(member)
        } else if (name.startsWith("#")) {
          defaults += name.substring(1) -> parseDestinations(member)
        } else {
          val isTemplate = hasUnescaped(name, '&')
          val isWildcard = hasUnescaped(name, '*')
          if (isTemplate && isWildcard) throw new IllegalArgumentException(
            "pattern cannot contain both & and *")
          if (isTemplate) {
            val c = new Cursor(name, 0)
            val t = parseTemplate(c)
            if (!c.done) throw new IllegalArgumentException(
              s"failed to parse template '$name'")
            templates += t.full -> ((t, parseValue(member)))
          } else if (isWildcard) {
            val w = parseWildcard(name)
            wildcards += w.full -> ((w, parseValue(member)))
          } else {
            val lit = unescape(name)
            literalIdx += lit -> literals.size
            val numeric = if (lit.nonEmpty && lit.forall(_.isDigit))
              Some(lit.toInt) else None
            literals :+= ((lit, numeric, parseValue(member)))
          }
        }
      }
    }
    new Pattern(literals, literalIdx, templates, wildcards, values, keys, defaults)
  }

  /** Parse a full spec document. */
  def parseSpec(specJson: String): Pattern = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    parseMap(mapper.readTree(specJson))
  }

  // ---------------- processing ----------------

  /** Output root: starts null, first write decides object vs array. */
  private final class Holder { var root: JsonNode = NullNode.instance }

  private sealed trait Slot { def get: JsonNode; def set(n: JsonNode): Unit }
  private final class RootSlot(h: Holder) extends Slot {
    def get: JsonNode = h.root; def set(n: JsonNode): Unit = h.root = n
  }
  private final class ObjSlot(o: ObjectNode, k: String) extends Slot {
    def get: JsonNode = o.get(k); def set(n: JsonNode): Unit = { o.set(k, n); () }
  }
  private final class ArrSlot(a: ArrayNode, i: Int) extends Slot {
    def get: JsonNode = a.get(i); def set(n: JsonNode): Unit = { a.set(i, n); () }
  }

  /** FIELD-position value stringification (jsonValueToString,
    * JoltUtils.cpp:778-795; double truncates to int64 as upstream). */
  private def valueToString(v: JsonNode): Option[String] =
    if (v.isTextual) Some(v.asText())
    else if (v.isIntegralNumber) Some(v.asLong().toString)
    else if (v.isDouble || v.isFloat) Some(v.asDouble().toLong.toString)
    else if (v.isBoolean) Some(if (v.asBoolean()) "true" else "false")
    else None

  /** resolvePath (JoltUtils.cpp:955-985): walk a template path inside a node. */
  private def resolvePath(ctx: Ctx, root: JsonNode, path: Path): Option[JsonNode] = {
    var cur = root
    path.foreach { case (templ, mtype) =>
      val member = templ.eval(ctx)
      mtype match {
        case Field =>
          if (cur == null || !cur.isObject || !cur.has(member)) return None
          cur = cur.get(member)
        case Index =>
          val idx = try member.toInt catch { case _: Exception => return None }
          if (cur == null || !cur.isArray || cur.size() <= idx) return None
          cur = cur.get(idx)
      }
    }
    Option(cur)
  }

  /** putValue (JoltUtils.cpp:819-948). */
  private def putValue(ctx: Ctx, dest: Destination, value: JsonNode,
                       out: Holder): Unit = {
    // 1. evaluate segments; unresolvable references silently skip the write
    val evaled = Vector.newBuilder[(String, MemberType)]
    dest.foreach {
      case ValueRefSeg(ref, mtype) =>
        val root = ctx.find(ref.idx)
        if (root == null) throw new IllegalArgumentException(
          s"could not find ancestor at ${ref.idx}")
        if (root.node == null) return
        val member = resolvePath(ctx, root.node, ref.path) match {
          case Some(m) => m
          case None    => return
        }
        mtype match {
          case Index =>
            val idx: Long =
              if (member.isIntegralNumber) {
                val l = member.asLong(); if (l < 0) return else l
              } else if (member.isDouble || member.isFloat) {
                val d = member.asDouble(); if (d < 0) return else d.toLong
              } else if (member.isTextual &&
                         member.asText().nonEmpty &&
                         member.asText().forall(_.isDigit)) {
                member.asText().toLong
              } else return
            evaled += ((idx.toString, Index))
          case Field =>
            valueToString(member) match {
              case Some(s) => evaled += ((s, Field))
              case None    => return
            }
        }
      case MatchIdxSeg(level, mtype) =>
        val target = ctx.find(level)
        if (target == null) throw new IllegalArgumentException(
          s"could not find ancestor at $level")
        evaled += ((target.matchCount.toString, mtype))
      case TemplateSeg(t, Field) if t.isEmpty => // a..b == a.b self-reference
      case TemplateSeg(t, mtype) => evaled += ((t.eval(ctx), mtype))
    }
    // 2. walk/construct the output tree
    var slot: Slot = new RootSlot(out)
    evaled.result().foreach { case (member, mtype) =>
      mtype match {
        case Index =>
          val cur = slot.get
          val arr: ArrayNode =
            if (cur == null || cur.isNull) { val a = F.arrayNode(); slot.set(a); a }
            else if (cur.isArray) cur.asInstanceOf[ArrayNode]
            else throw new IllegalArgumentException(
              "cannot write based on index into non-array")
          val idx = if (member.isEmpty) arr.size() else member.toInt
          while (arr.size() <= idx) arr.addNull()
          slot = new ArrSlot(arr, idx)
        case Field =>
          val cur = slot.get
          val obj: ObjectNode =
            if (cur == null || cur.isNull) { val o = F.objectNode(); slot.set(o); o }
            else if (cur.isObject) cur.asInstanceOf[ObjectNode]
            else throw new IllegalArgumentException(
              "cannot write member into non-object")
          if (!obj.has(member)) obj.set(member, NullNode.instance)
          slot = new ObjSlot(obj, member)
      }
    }
    // 3. write; occupied slot converts to an array and appends
    val existing = slot.get
    if (existing != null && !existing.isNull) {
      val arr = if (existing.isArray) existing.asInstanceOf[ArrayNode]
      else { val a = F.arrayNode(); a.add(existing); slot.set(a); a }
      arr.add(value.deepCopy[JsonNode]())
    } else slot.set(value.deepCopy[JsonNode]())
  }

  private def putValueAll(ctx: Ctx, dests: Destinations, value: JsonNode,
                          out: Holder): Unit =
    dests.foreach(d => putValue(ctx, d, value, out))

  private def processValue(value: Either[Pattern, Destinations], ctx: Ctx,
                           input: JsonNode, out: Holder): Unit = value match {
    case Left(p)  => process(p, ctx, input, out)
    case Right(d) => putValueAll(ctx, d, input, out)
  }

  /** processMember (JoltUtils.cpp:1011-1038): literal → template (canonical
    * order) → wildcard (canonical order); first match wins. */
  private def processMember(p: Pattern, ctx: Ctx, name: String,
                            member: JsonNode, out: Holder): Boolean = {
    p.literalIdx.get(name) match {
      case Some(i) =>
        processValue(p.literals(i)._3, ctx.extend(Vector(name), member), member, out)
        return true
      case None =>
    }
    p.templates.valuesIterator.foreach { case (t, v) =>
      if (t.eval(ctx) == name) {
        processValue(v, ctx.extend(Vector(name), member), member, out)
        return true
      }
    }
    p.wildcards.valuesIterator.foreach { case (w, v) =>
      w.matchKey(name) match {
        case Some(matches) =>
          processValue(v, ctx.extend(matches, member), member, out)
          return true
        case None =>
      }
    }
    false
  }

  /** Pattern::process (JoltUtils.cpp:1080-1130). */
  private def process(p: Pattern, ctx: Ctx, input: JsonNode, out: Holder): Unit = {
    // '@' value references
    p.values.foreach { case (ref, value) =>
      val target = ctx.find(ref.idx)
      if (target == null) throw new IllegalArgumentException(
        s"could not find parent at ${ref.idx}")
      if (target.node == null) return
      resolvePath(ctx, target.node, ref.path) match {
        case Some(v) =>
          processValue(value, ctx.extend(ctx.matches, ctx.node), v, out)
        case None => // non-existent member is not an error
      }
    }
    // '$' matched-key writes
    p.keys.foreach { case ((lvl, m), dests) =>
      val target = ctx.find(lvl)
      if (target == null || target.matches.size <= m)
        throw new IllegalArgumentException(s"invalid key access $$($lvl,$m)")
      val keyStr = target.matches(m)
      putValueAll(ctx.extend(Vector(keyStr), null), dests,
        TextNode.valueOf(keyStr), out)
    }
    // '#' literal defaults
    p.defaults.foreach { case (value, dests) =>
      putValueAll(ctx.extend(Vector(value), null), dests,
        TextNode.valueOf(value), out)
    }
    if (input == null) return
    if (input.isArray) {
      val sub = ctx.shallowCopy
      p.literals.foreach { case (key, numeric, _) =>
        numeric.filter(_ < input.size()).foreach { n =>
          if (processMember(p, sub, key, input.get(n), out)) sub.matchCount += 1
        }
      }
      (0 until input.size()).foreach { i =>
        if (!p.literalIdx.contains(i.toString)) {
          if (processMember(p, sub, i.toString, input.get(i), out))
            sub.matchCount += 1
        }
      }
    } else if (input.isObject) {
      val sub = ctx.shallowCopy
      p.literals.foreach { case (key, _, _) =>
        if (input.has(key)) {
          if (processMember(p, sub, key, input.get(key), out)) sub.matchCount += 1
        }
      }
      val names = input.fields()
      while (names.hasNext) {
        val e = names.next()
        if (!p.literalIdx.contains(e.getKey)) {
          if (processMember(p, sub, e.getKey, e.getValue, out)) sub.matchCount += 1
        }
      }
    } else {
      // scalars match as keys with a null member (JoltUtils.cpp:1119-1129);
      // double renders like std::to_string (6 decimals)
      val name =
        if (input.isTextual) input.asText()
        else if (input.isIntegralNumber) input.asLong().toString
        else if (input.isDouble || input.isFloat) "%.6f".format(input.asDouble())
        else if (input.isBoolean) { if (input.asBoolean()) "true" else "false" }
        else return
      processMember(p, ctx, name, null, out)
    }
  }

  /** Run a parsed spec over one JSON document; None = transform error (the
    * operator's `failure` relationship, JoltTransformJSON.cpp onTrigger). */
  def processDocument(spec: Pattern, inputJson: String): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      val input = mapper.readTree(inputJson)
      val out = new Holder
      process(spec, new Ctx(null, Vector("root"), input), input, out)
      Some(mapper.writeValueAsString(out.root))
    } catch { case _: Exception => None }
  }

  /**
   * Shift as a column transform: returns struct(content, relationship) —
   * failed transforms keep the input and route to `failure`
   * (JoltTransformJSON.cpp onTrigger routing). The spec is parsed once on
   * the driver; executors reuse the compiled Pattern.
   */
  def shift(specJson: String, contentCol: Column): Column = {
    val spec = parseSpec(specJson)
    val f = udf { (in: String) =>
      if (in == null) ("", "failure")
      else processDocument(spec, in) match {
        case Some(outJson) => (outJson, "success")
        case None          => (in, "failure")
      }
    }
    f(contentCol)
  }
}
