package graft

import org.apache.spark.sql.functions._
import graft.el.{ElAst, ElCompiler}

/**
 * EL parser + compiler tests — assertions ported from the reference suite
 * (libminifi/test/unit/ExpressionLanguageTests.cpp, line refs inline).
 */
class ElSpec extends SparkSpec {

  /** Evaluate an EL template against one attribute map. */
  private def eval(template: String, attrs: Map[String, String]): String = {
    val df = flowFrame(Seq(("", attrs)))
    val r = df.select(ElCompiler.template(template).cast("string").as("v"))
      .collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  // --- parser ---

  test("parser: trivial text and escaped dollar") {
    assert(ElAst.parse("plain").parts === Seq(Left("plain")))
    assert(ElAst.parse("a$$b").parts === Seq(Left("a$b")))
  }

  test("parser: chained calls with args") {
    val t = ElAst.parse("${filename:toUpper():append('.bak')}")
    val Right(ElAst.Chain(ElAst.AttrRef("filename"), calls)) = t.parts.head
    assert(calls.map(_.name) === Seq("toUpper", "append"))
  }

  test("parser: number grammar matches reference lexer") {
    assert(ElAst.parse("${x:plus(1e-5)}").isSingleExpr)
    assert(ElAst.parse("${x:plus(-3.25)}").isSingleExpr)
    intercept[ElAst.ElParseException](ElAst.parse("${x:plus(1e)}"))
  }

  test("parser: quoted escapes limited to quote/backslash (Parser.yy)") {
    val t = ElAst.parse("""${attr:matches('\d+')}""")
    val Right(ElAst.Chain(_, Seq(ElAst.Call("matches", Seq(ElAst.StrLit(p)))))) = t.parts
      .head
    assert(p === """\d+""") // backslash preserved, not stripped
  }

  // --- compiler vs reference expectations ---

  test("toUpper with surrounding text (ExpressionLanguageTests.cpp:154-160)") {
    assert(eval("text_before${attr_a:toUpper()}text_after",
      Map("attr_a" -> "__flow_a_attr_value_a__")) ===
      "text_before__FLOW_A_ATTR_VALUE_A__text_after")
  }

  test("substring 2-arg / 1-arg (ExpressionLanguageTests.cpp:179-194)") {
    val attrs = Map("attr" -> "__flow_a_attr_value_a__")
    assert(eval("${attr:substring(6, 8)}", attrs) === "_a_attr_")
    assert(eval("${attr:substring(6)}", attrs) === "_a_attr_value_a__")
  }

  test("substringBefore/After first+last (ExpressionLanguageTests.cpp:196-225)") {
    val attrs = Map("attr" -> "__flow_a_attr_value_a__")
    assert(eval("${attr:substringBefore('attr_value_a__')}", attrs) === "__flow_a_")
    assert(eval("${attr:substringBeforeLast('_a')}", attrs) === "__flow_a_attr_value")
    assert(eval("${attr:substringAfter('__flow_a')}", attrs) === "_attr_value_a__")
    assert(eval("${attr:substringAfterLast('_a')}", attrs) === "__")
  }

  test("getDelimitedField basic (ExpressionLanguageTests.cpp:229-246)") {
    val attrs = Map("attr" -> "\"Jacobson, John\", 32, Mr.")
    assert(eval("${attr:getDelimitedField(2)}", attrs) === " 32")
    assert(eval("${attr:getDelimitedField(1)}", attrs) === "\"Jacobson, John\"")
  }

  test("startsWith is case-sensitive (ExpressionLanguageTests.cpp:255-270)") {
    assert(eval("${attr:startsWith('a brand')}", Map("attr" -> "A BRAND TEST")) === "false")
    assert(eval("${attr:startsWith('a brand')}", Map("attr" -> "a brand new TEST")) === "true")
  }

  test("indexOf / lastIndexOf (ExpressionLanguageTests.cpp:468-524)") {
    val attrs = Map("attr" -> "a brand new filename.txt")
    assert(eval("${attr:indexOf('a.*txt')}", attrs) === "-1") // literal, not regex
    assert(eval("${attr:indexOf('.')}", attrs) === "20")
    assert(eval("${attr:indexOf('a')}", attrs) === "0")
    assert(eval("${attr:lastIndexOf('a')}", attrs) === "17")
    assert(eval("${attr:lastIndexOf(' ')}", attrs) === "11")
  }

  test("replace family") {
    val attrs = Map("f" -> "a.file.txt")
    assert(eval("${f:replace('.', '_')}", attrs) === "a_file_txt")
    assert(eval("${f:replaceAll('\\.txt$', '')}", attrs) === "a.file")
    assert(eval("${f:replaceFirst('a', 'X')}", attrs) === "X.file.txt")
    assert(eval("${missing:replaceNull('gone')}", attrs) === "gone")
  }

  test("math with NiFi coercions") {
    val attrs = Map("n" -> "7", "d" -> "2.5")
    assert(eval("${n:plus(3)}", attrs).toDouble === 10.0)
    assert(eval("${n:mod(4)}", attrs).toDouble === 3.0)
    assert(eval("${d:multiply(2)}", attrs).toDouble === 5.0)
    assert(eval("${n:toRadix(16)}", attrs) === "7")
    assert(eval("${n:gt(6):ifElse('big','small')}", attrs) === "big")
  }

  test("multi-attribute quantifiers (Expression.cpp:1051-1311)") {
    val attrs = Map("a1" -> "hello", "a2" -> "hell no", "b" -> "x")
    assert(eval("${allAttributes('a1','a2'):contains('hell')}", attrs) === "true")
    assert(eval("${allAttributes('a1','b'):contains('hell')}", attrs) === "false")
    assert(eval("${anyAttribute('a1','b'):contains('hell')}", attrs) === "true")
    assert(eval("${allMatchingAttributes('a.*'):contains('hell')}", attrs) === "true")
    assert(eval("${allAttributes('a1','a2','b'):contains('hell'):count()}", attrs) === "2")
    assert(eval("${allAttributes('a1','b'):join('-')}", attrs) === "hello-x")
  }

  test("delineated values") {
    val attrs = Map("csv" -> "apple,banana,cherry")
    assert(eval("${anyDelineatedValue(${csv}, ','):equals('banana')}", attrs) === "true")
    assert(eval("${allDelineatedValues(${csv}, ','):length():gt(4)}", attrs) === "true")
    assert(eval("${allDelineatedValues(${csv}, ','):startsWith('a')}", attrs) === "false")
  }

  test("base64 / url / json escapes") {
    val attrs = Map("s" -> "a b&c", "j" -> "say \"hi\"\n")
    assert(eval("${s:base64Encode():base64Decode()}", attrs) === "a b&c")
    assert(eval("${s:urlEncode()}", attrs) === "a+b%26c")
    assert(eval("${j:escapeJson()}", attrs) === "say \\\"hi\\\"\\n")
    assert(eval("${s:escapeXml()}", attrs) === "a b&amp;c")
  }

  test("isEmpty / isNull / equalsIgnoreCase") {
    val attrs = Map("e" -> "  ", "s" -> "MiXeD")
    assert(eval("${e:isEmpty()}", attrs) === "true")
    assert(eval("${missing:isNull()}", attrs) === "true")
    assert(eval("${s:equalsIgnoreCase('mixed')}", attrs) === "true")
  }

  test("contains / in / endsWith (ExpressionLanguageTests.cpp:267-313)") {
    val attrs = Map("attr" -> "a brand new filename.txt")
    assert(eval("${attr:contains('new')}", attrs) === "true")
    assert(eval("${attr:contains('NEW')}", attrs) === "false")
    assert(eval("${attr:endsWith('txt')}", attrs) === "true")
    assert(eval("${attr:endsWith('TXT')}", attrs) === "false")
    val names = Map("attr" -> "JOHN")
    assert(eval("${attr:in('PAUL', 'JOHN', 'MIKE')}", names) === "true")
    assert(eval("${attr:in('RED', 'GREEN', 'BLUE')}", names) === "false")
  }

  test("find anchors at the start (ExpressionLanguageTests.cpp:443-465)") {
    val attrs = Map("attr" -> "a brand new filename.txt")
    assert(eval("${attr:find('a [Bb]rand [Nn]ew')}", attrs) === "true")
    assert(eval("${attr:find('Brand.*')}", attrs) === "false")
    assert(eval("${attr:find('brand')}", attrs) === "true")
  }

  test("minus / divide coercions (ExpressionLanguageTests.cpp:563-610)") {
    assert(eval("${attr:minus(13)}", Map("attr" -> "11")) === "-2")
    assert(math.abs(eval("${attr:minus(-13.34567)}", Map("attr" -> "11.1"))
      .toDouble - 24.44567) < 1e-9)
    assert(math.abs(eval("${attr:divide(13)}", Map("attr" -> "11"))
      .toDouble - 11.0 / 13.0) < 1e-12)
  }

  test("fromRadix incl. negative and padding " +
       "(ExpressionLanguageTests.cpp:635-658)") {
    assert(eval("${attr:fromRadix(2)}", Map("attr" -> "0000000000001010")) === "10")
    assert(eval("${attr:fromRadix(16)}", Map("attr" -> "d")) === "13")
    assert(eval("${attr:fromRadix(23)}", Map("attr" -> "-000004a1")) === "-2347")
  }

  test("format date with timezone arg (ExpressionLanguageTests.cpp:1283-1291)") {
    val attrs = Map("trillion_milliseconds" -> "1000000000000")
    assert(eval("${trillion_milliseconds:format('yyyy/MM/dd HH:mm:ss', 'UTC')}",
      attrs) === "2001/09/09 01:46:40")
    assert(eval("${trillion_milliseconds:format('yyyy/MM/dd HH:mm:ss', 'Europe/Paris')}",
      attrs) === "2001/09/09 03:46:40")
    assert(eval("${trillion_milliseconds:format('yyyy/MM/dd HH:mm:ss', 'America/Los_Angeles')}",
      attrs) === "2001/09/08 18:46:40")
    // round trip through the same zone restores the epoch
    assert(eval("${trillion_milliseconds:format('yyyy/MM/dd HH:mm:ss', 'Europe/Paris')" +
      ":toDate('yyyy/MM/dd HH:mm:ss', 'Europe/Paris')}", attrs) === "1000000000000")
  }

  test("CSV escape round trip (ExpressionLanguageTests.cpp:1112-1135)") {
    val msg = Map("message" -> "Zero > One < \"two!\" & 'true'")
    assert(eval("${message:escapeCsv()}", msg) ===
      "\"Zero > One < \"\"two!\"\" & 'true'\"")
    assert(eval("${message:unescapeCsv()}",
      Map("message" -> "\"Zero > One < \"\"two!\"\" & 'true'\"")) ===
      "Zero > One < \"two!\" & 'true'")
    assert(eval("${message:escapeCsv():unescapeCsv()}", msg) === msg("message"))
  }

  test("XML escape round trip (ExpressionLanguageTests.cpp:1040-1062)") {
    val msg = Map("message" -> "Zero > One < \"two!\" & 'true'")
    assert(eval("${message:escapeXml()}", msg) ===
      "Zero &gt; One &lt; &quot;two!&quot; &amp; &apos;true&apos;")
    assert(eval("${message:unescapeXml()}",
      Map("message" -> "Zero &gt; One &lt; &quot;two!&quot; &amp; &apos;true&apos;")) ===
      "Zero > One < \"two!\" & 'true'")
    assert(eval("${message:escapeXml():unescapeXml()}", msg) === msg("message"))
  }

  test("HTML3/4 escape: full entity tables incl. punctuation and Greek " +
       "(ExpressionLanguageTests.cpp:1064-1110, Expression.cpp:468-558)") {
    assert(eval("${m:escapeHtml3()}", Map("m" -> "¥ & < «")) ===
      "&yen; &amp; &lt; &laquo;")
    assert(eval("${m:unescapeHtml3()}",
      Map("m" -> "&yen; &amp; &lt; &laquo;")) === "¥ & < «")
    // escape-then-unescape round-trips entity-shaped input: the escape pass
    // rewrites & and ; so the produced text decodes back exactly
    assert(eval("${m:escapeHtml3():unescapeHtml3()}",
      Map("m" -> "&yen; &amp; &lt; &laquo;")) === "&yen; &amp; &lt; &laquo;")
    // html4 adds the Greek block; html3 leaves it alone
    assert(eval("${m:escapeHtml4()}", Map("m" -> "¥ & Φ < «")) ===
      "&yen; &amp; &Phi; &lt; &laquo;")
    assert(eval("${m:escapeHtml3()}", Map("m" -> "Φ")) === "Φ")
    assert(eval("${m:unescapeHtml4()}",
      Map("m" -> "&yen; &iota; &amp; &lt; &laquo;")) ===
      "¥ ι & < «")
    assert(eval("${m:escapeHtml4():unescapeHtml4()}",
      Map("m" -> "&yen; &amp; &lt; &Pi; &laquo;")) ===
      "&yen; &amp; &lt; &Pi; &laquo;")
    // reference quirks reproduced: brkbar for U+00A6, doubled-semicolon
    // raquo (Expression.cpp:470 tables); first-insert-wins duplicate keys
    assert(eval("${m:escapeHtml3()}", Map("m" -> "¦")) === "&brkbar;")
    assert(eval("${m:escapeHtml3()}", Map("m" -> "»")) === "&raquo;;")
    assert(eval("${m:unescapeHtml4()}", Map("m" -> "&circ;&tilde;")) === "^~")
  }

  test("resolve_user_id: uid 0 -> root, unresolvable passes through " +
       "(Expression.cpp:111-121)") {
    assert(eval("${resolve_user_id('0')}", Map.empty) === "root")
    assert(eval("${resolve_user_id('99999')}", Map.empty) === "99999")
  }

  test("reverseDnsLookup resolves loopback, empty on garbage " +
       "(Expression.cpp:191-207)") {
    // loopback resolves without the network; exact name is host-dependent
    val loop = eval("${reverseDnsLookup(${literal('127.0.0.1')})}", Map.empty)
    assert(loop != null && loop.nonEmpty)
    // unresolvable input falls back to the input or empty, never throws
    val bad = eval("${reverseDnsLookup(${literal('256.1.1.1')})}", Map.empty)
    assert(bad != null)
  }
}
