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

  test("getDelimitedField 5-arg strip mode and the reference's escape " +
       "fall-through quirk (ExpressionLanguageTests.cpp Get Delimited 2/3, " +
       "Expression.cpp:309-326)") {
    // Get Delimited 3: explicit delim/quote/escape + strip_chars=true
    // unquotes the field ('\"' and '\\' are quoted-text escapes in the
    // grammar, Parser.yy:146-148)
    val attrs = Map("attr" -> "\"Jacobson, John\", 32, Mr.")
    assert(eval("""${attr:getDelimitedField(1, ',', '\"', '\\', 'true')}""",
      attrs) === "Jacobson, John")
    assert(eval("""${attr:getDelimitedField(3, ',', '\"', '\\', 'true')}""",
      attrs) === " Mr.")
    // the reference escape branch has NO continue: the escape char emits
    // itself (when not stripping) and the NEXT char keeps its special
    // meaning — an escaped delimiter still splits the field...
    assert(eval("${attr:getDelimitedField(1)}",
      Map("attr" -> "a\\,b,c")) === "a\\")
    assert(eval("${attr:getDelimitedField(2)}",
      Map("attr" -> "a\\,b,c")) === "b")
    // ...and an escaped quote still opens a quoted region, swallowing the
    // delimiter after 'b' into field 1
    assert(eval("${attr:getDelimitedField(1)}",
      Map("attr" -> "a\\\"b,c")) === "a\\\"b,c")
    assert(eval("""${attr:getDelimitedField(1, ',', '\"', '\\', 'true')}""",
      Map("attr" -> "a\\\"b,c")) === "ab,c")
    // trailing escape at end-of-input: emitted (not stripping), nothing
    // follows (Expression.cpp:320-325 break)
    assert(eval("${attr:getDelimitedField(1)}",
      Map("attr" -> "ab\\")) === "ab\\")
  }

  test("getDelimitedField index is the stoull-prefix plane and an empty " +
       "delimiter is asString()[0] = NUL (Expression.cpp:271,274-286, " +
       "Value.h:89-100)") {
    val attrs = Map("attr" -> "one,two,three", "idx" -> "2junk",
      "neg" -> "-1", "zero" -> "0", "blank" -> "", "junk" -> "junk")
    // asUnsignedLong = std::stoull prefix: "2junk" → 2, so a junk DYNAMIC
    // index extracts field 2 in the reference — and must not ANSI-throw here
    assert(eval("${attr:getDelimitedField(${idx})}", attrs) === "two")
    // "" → strParse's 0 default, "0" → 0, "-1" → wraps to 2⁶⁴-1; each then
    // has 1 subtracted mod 2⁶⁴, landing on a uint64 no field count reaches
    assert(eval("${attr:getDelimitedField(${blank})}", attrs) === "")
    assert(eval("${attr:getDelimitedField(${zero})}", attrs) === "")
    assert(eval("${attr:getDelimitedField(${neg})}", attrs) === "")
    // no digit prefix at all → strParse invalid_argument (throw → null)
    assert(eval("${attr:getDelimitedField(${junk})}", attrs) === null)
    // an EXPLICIT empty delimiter arg is asString()[0] on an empty
    // std::string = '\0' — the subject never splits (field 1 is the whole
    // string, field 2 empty); same for an empty quote arg (never opens)
    assert(eval("${attr:getDelimitedField(1, '')}", attrs) === "one,two,three")
    assert(eval("${attr:getDelimitedField(2, '')}", attrs) === "")
    assert(eval("${attr:getDelimitedField(1, ',', '')}",
      Map("attr" -> "\"a,b\",c")) === "\"a")
    // strip_chars is toBool: trimmed + case-insensitive (StringUtils.cpp:27)
    assert(eval("""${attr:getDelimitedField(1, ',', '\"', '\\', 'TRUE')}""",
      Map("attr" -> "\"a,b\",c")) === "a,b")
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
    // width-padded toRadix — the numeric-format width edges
    // (ExpressionLanguageTests.cpp:611-617 'To Radix', :627-633
    // 'To Radix 3': the pad applies to the MAGNITUDE, sign re-prefixed)
    val radix = Map("ten" -> "10", "neg" -> "-2347")
    assert(eval("${ten:toRadix(2,16)}", radix) === "0000000000001010")
    assert(eval("${neg:toRadix(23,8)}", radix) === "-000004a1")
    assert(eval("${ten:toRadix(16,1)}", radix) === "a") // pad below width
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
    assert(eval("${s:urlEncode()}", attrs) === "a%20b%26c")
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

  test("exponent literals, trim, length " +
       "(ExpressionLanguageTests.cpp 'Plus Exponent'/'Trim'/'Length')") {
    // Plus Exponent: integer attr + scientific literal
    assert(math.abs(eval("${attr:plus(10e+6)}", Map("attr" -> "11"))
      .toDouble - 10000011.0) < 1e-6)
    // Plus Exponent 2: decimal attr keeps its fraction through the sum
    assert(math.abs(eval("${attr:plus(10e+6)}",
      Map("attr" -> "11.345678901234")).toDouble - 10000011.345678901234) < 1e-6)
    assert(eval("${message:trim()}", Map("message" -> " 1 2 3 ")) === "1 2 3")
    assert(eval("${message:length()}",
      Map("message" -> "a brand new filename.txt")) === "24")
    // unparseable comparison operands are the EL error/false convention
    // (GT4 'Value parsing errors' throws in the reference; here the
    // predicate is false, never a poisoned row)
    assert(eval("${attr:gt(5)}", Map("attr" -> "banana1337")) !== "true")
    assert(eval("${attr:gt(5)}",
      Map("attr" -> "18446744073709551616")) !== null) // no crash
  }

  test("fromRadix incl. negative and padding " +
       "(ExpressionLanguageTests.cpp:635-658)") {
    assert(eval("${attr:fromRadix(2)}", Map("attr" -> "0000000000001010")) === "10")
    assert(eval("${attr:fromRadix(16)}", Map("attr" -> "d")) === "13")
    assert(eval("${attr:fromRadix(23)}", Map("attr" -> "-000004a1")) === "-2347")
  }

  test("fromRadix std::stoll semantics: 0x prefix at radix 16, longest " +
       "prefix, whitespace+sign, no-digits and int64 overflow are errors " +
       "(Expression.cpp:903-911)") {
    // stoll(s, nullptr, 16) consumes an optional 0x/0X prefix
    assert(eval("${attr:fromRadix(16)}", Map("attr" -> "0xff")) === "255")
    assert(eval("${attr:fromRadix(16)}", Map("attr" -> "0XFF")) === "255")
    // "0x" NOT followed by a hex digit: only the 0 parses
    assert(eval("${attr:fromRadix(16)}", Map("attr" -> "0xzz")) === "0")
    // longest-valid-prefix parse stops at the first invalid digit
    assert(eval("${attr:fromRadix(10)}", Map("attr" -> "12z9")) === "12")
    assert(eval("${attr:fromRadix(2)}", Map("attr" -> "1012")) === "5")
    // leading whitespace + sign, like stoll
    assert(eval("${attr:fromRadix(10)}", Map("attr" -> "  +42")) === "42")
    // the reference throws invalid_argument on no digits and
    // out_of_range past int64 — the EL error convention here is null
    assert(eval("${attr:fromRadix(10)}", Map("attr" -> "zzz")) === null)
    assert(eval("${attr:fromRadix(16)}",
      Map("attr" -> "ffffffffffffffffff")) === null)   // > 2^63-1
    assert(eval("${attr:fromRadix(10)}",
      Map("attr" -> "9223372036854775807")) === "9223372036854775807")
    assert(eval("${attr:fromRadix(10)}",
      Map("attr" -> "-9223372036854775808")) === "-9223372036854775808")
    assert(eval("${attr:fromRadix(10)}",
      Map("attr" -> "9223372036854775808")) === null)  // one past max
  }

  test("toRadix digit-loop edges: value 0 yields NO digits, the subject " +
       "coerces with stoll prefix semantics, LLONG_MIN renders " +
       "(Expression.cpp:865-901)") {
    // while (value) never runs for 0 → empty string unpadded, pad zeros
    // only when a width is given
    assert(eval("${attr:toRadix(16)}", Map("attr" -> "0")) === "")
    assert(eval("${attr:toRadix(2,4)}", Map("attr" -> "0")) === "0000")
    // asSignedLong prefix coercion on the subject
    assert(eval("${attr:toRadix(16)}", Map("attr" -> "10abc")) === "a")
    assert(eval("${attr:toRadix(16)}", Map("attr" -> "")) === "")  // 0 → no digits
    // LLONG_MIN: the reference never negates the whole value
    assert(eval("${attr:toRadix(16)}",
      Map("attr" -> "-9223372036854775808")) === "-8000000000000000")
  }

  test("radix outside [2,36] is the EL error convention, not NUL garbage " +
       "(the reference throws runtime_error, Expression.cpp:869-871)") {
    assert(eval("${attr:toRadix(1)}", Map("attr" -> "10")) === null)
    assert(eval("${attr:toRadix(37)}", Map("attr" -> "10")) === null)
    assert(eval("${attr:toRadix(0,4)}", Map("attr" -> "10")) === null)
    assert(eval("${attr:fromRadix(1)}", Map("attr" -> "101")) === null)
    assert(eval("${attr:fromRadix(37)}", Map("attr" -> "z1")) === null)
    // boundary radices still work
    assert(eval("${attr:toRadix(36)}", Map("attr" -> "35")) === "z")
    assert(eval("${attr:fromRadix(36)}", Map("attr" -> "z")) === "35")
  }

  test("arithmetic stoll/stold prefix coercion (expr_binary_op " +
       "Expression.cpp:833-863 over Value.h:48-131 strParse)") {
    // int path parses the longest digit prefix like stoll
    assert(eval("${attr:plus(2)}", Map("attr" -> "11abc")) === "13")
    assert(eval("${attr:multiply(3)}", Map("attr" -> "7seven")) === "21")
    // strParse's empty-string default is 0, not an error
    assert(eval("${attr:plus(5)}", Map("attr" -> "")) === "5")
    assert(eval("${attr:minus(5)}", Map("attr" -> "")) === "-5")
    // ONE decimal-syntax side forces the long-double path (Value.h
    // isDecimal), which carries stold prefix semantics
    assert(eval("${attr:plus(1.5)}", Map("attr" -> "11abc")) === "12.5")
    assert(eval("${attr:multiply(2)}", Map("attr" -> "3.5junk")) === "7")
    assert(eval("${attr:divide(2)}", Map("attr" -> "11junk")) === "5.5")
    // no parsable prefix: the reference catches the stoll throw into an
    // empty result — null renders the same
    assert(eval("${attr:plus(2)}", Map("attr" -> "abc")) === null)
    // stoll skips leading whitespace and reads the sign
    assert(eval("${attr:plus(1)}", Map("attr" -> "  +41")) === "42")
    // 0x is NOT hex at base 10: stoll consumes just the leading 0
    assert(eval("${attr:plus(1)}", Map("attr" -> "0x1A")) === "1")
  }

  test("arithmetic never poisons a task: int64 overflow and mod-by-zero " +
       "are per-row nulls (the reference's behavior there is C++ UB — " +
       "signed wrap / SIGFPE; try_* ops under Spark's ANSI default)") {
    assert(eval("${attr:plus(1)}",
      Map("attr" -> "9223372036854775807")) === null)
    assert(eval("${attr:minus(1)}",
      Map("attr" -> "-9223372036854775808")) === null)
    assert(eval("${attr:multiply(3)}",
      Map("attr" -> "5000000000000000000")) === null)
    assert(eval("${attr:mod(0)}", Map("attr" -> "11")) === null)
    // ...but the DECIMAL path's fmod(x, 0) is IEEE NaN, not an error
    assert(eval("${attr:mod(0)}", Map("attr" -> "11.5")) === "nan")
    // the long-double path saturates like the reference's stream prints:
    // x/0 is inf, 0/0 is nan (Value.h asString via fixed<<setprecision)
    assert(eval("${attr:divide(0)}", Map("attr" -> "11")) === "inf")
    assert(eval("${attr:divide(0)}", Map("attr" -> "-11")) === "-inf")
    assert(eval("${attr:divide(0)}", Map("attr" -> "0")) === "nan")
    // IEEE x/±0 takes its sign from BOTH operands: Spark's `=== 0.0` also
    // matches -0.0, so the divisor's stold sign prefix decides (r18 ADVICE)
    assert(eval("${attr:divide(-0.0)}", Map("attr" -> "5")) === "-inf")
    assert(eval("${attr:divide(-0.0)}", Map("attr" -> "-5")) === "inf")
    assert(eval("${attr:divide(-0.0)}", Map("attr" -> "0")) === "nan")
    assert(eval("${den}", Map("den" -> "-0.0")) === "-0.0") // sanity: raw attr
    assert(eval("${attr:divide(${den})}",
      Map("attr" -> "7", "den" -> "  -0junk")) === "-inf")
    // near-max values that do NOT overflow stay exact on the int path
    assert(eval("${attr:plus(0)}",
      Map("attr" -> "9223372036854775807")) === "9223372036854775807")
  }

  test("DOCUMENTED DIVERGENCE — decimal path past 2^53: the reference's " +
       "long double (Value.h:115-128, 64-bit mantissa on x86) holds " +
       "9007199254740993 exactly; the engine's float64 (and the DuckDB " +
       "oracle's DOUBLE) cannot represent it, so the engine rounds to the " +
       "nearest even double. Pinned here so the divergence is a recorded " +
       "contract, not an accident (r19 verdict #5 probe)") {
    // int path is exact to the full int64 range on BOTH sides — no
    // divergence below the decimal-syntax trigger
    assert(eval("${attr:plus(0)}",
      Map("attr" -> "9007199254740993")) === "9007199254740993")
    // one decimal-syntax side forces the floating path: 2^53+1 is not a
    // double; x86 long double would print ...93, float64 prints ...92
    assert(eval("${attr:plus(0.0)}",
      Map("attr" -> "9007199254740993")) === "9007199254740992")
    // boundary case both representations agree on: 2^53 itself
    assert(eval("${attr:plus(1.0)}",
      Map("attr" -> "9007199254740991")) === "9007199254740992")
  }

  test("DOCUMENTED DIVERGENCE — divide by a float64-underflowing divisor: " +
       "the engine's stold replay parses \"1e-400\" to +0.0 (double has no " +
       "such subnormal) and the zero-divisor branch yields inf, where the " +
       "reference's 80-bit long double (min subnormal ~3.6e-4951) keeps it " +
       "finite and divides through (~5e+400, beyond double). The r18 " +
       "sign-recovery path extends the same pre-existing long-double range " +
       "gap to the inf-sign plane; recorded, not accidental (r19 ADVICE)") {
    assert(eval("${attr:divide('1e-400')}", Map("attr" -> "5")) === "inf")
    // sign recovery still keys on the SOURCE '-' prefix at underflow
    assert(eval("${attr:divide('-1e-400')}", Map("attr" -> "5")) === "-inf")
    // an exactly-representable small divisor agrees on both sides
    assert(eval("${attr:divide('0.25')}", Map("attr" -> "5")) === "20")
  }

  test("format subject coerces with stoull prefix semantics (r19 mining: " +
       "expr_format Expression.cpp:639 via Value.h asUnsignedLong) — " +
       "junk-stop, empty→epoch 0, '-' double-wrap, out_of_range→null") {
    // longest digit prefix like stoull; junk suffix stops the parse
    assert(eval("${attr:format('ss.SSS', 'UTC')}",
      Map("attr" -> "123abc")) === "00.123")
    assert(eval("${attr:format('%S', 'UTC')}",
      Map("attr" -> "123abc")) === "00.123")
    // strParse's empty default is 0 → the epoch, not null
    assert(eval("${attr:format('yyyy-MM-dd', 'UTC')}",
      Map("attr" -> "")) === "1970-01-01")
    // stoull ACCEPTS '-' (wraps mod 2^64), then the milliseconds
    // construction narrows uint64→int64 — the double wrap lands on -1 ms
    assert(eval("${attr:format('%Y-%m-%d %T', 'UTC')}",
      Map("attr" -> "-1")) === "1969-12-31 23:59:59.999")
    assert(eval("${attr:format('%Y', 'UTC')}",
      Map("attr" -> "18446744073709551615")) === "1969")
    // past uint64 range stoull throws out_of_range → the null convention
    assert(eval("${attr:format('%Y', 'UTC')}",
      Map("attr" -> "18446744073709551616")) === null)
    // no parsable prefix → invalid_argument → null
    assert(eval("${attr:format('%Y', 'UTC')}", Map("attr" -> "abc")) === null)
  }

  test("substring offset/count coerce like asUnsignedLong (r19 mining: " +
       "expr_substring Expression.cpp:226-235) — stoull prefix, '' -> 0, " +
       "offset past the end throws out_of_range -> null, count clamps") {
    val h = Map("attr" -> "hello")
    // dynamic args get the stoull prefix parse, never an ANSI cast throw
    assert(eval("${attr:substring(${o})}", h + ("o" -> "1")) === "ello")
    assert(eval("${attr:substring(${o})}", h + ("o" -> "1junk")) === "ello")
    assert(eval("${attr:substring(${o})}", h + ("o" -> "")) === "hello")
    // offset == size is legal ("" result); offset > size THROWS in the
    // reference (std::string::substr out_of_range) -> null
    assert(eval("${attr:substring(${o})}", h + ("o" -> "5")) === "")
    assert(eval("${attr:substring(${o})}", h + ("o" -> "6")) === null)
    // '-1' wraps mod 2^64 into a huge offset -> out_of_range -> null
    assert(eval("${attr:substring(${o})}", h + ("o" -> "-1")) === null)
    // no parsable prefix -> invalid_argument -> null
    assert(eval("${attr:substring(${o})}", h + ("o" -> "junk")) === null)
    // count: prefix parse, huge/wrapped counts CLAMP (substr's count
    // never throws), empty is the 0 default
    assert(eval("${attr:substring(1, ${c})}", h + ("c" -> "2junk")) === "el")
    assert(eval("${attr:substring(1, ${c})}", h + ("c" -> "-1")) === "ello")
    assert(eval("${attr:substring(1, ${c})}", h + ("c" -> "")) === "")
    assert(eval("${attr:substring(1, ${c})}", h + ("c" -> "junk")) === null)
    // literal args unchanged (ExpressionLanguageTests.cpp:180-195)
    assert(eval("${attr:substring(1, 3)}", h) === "ell")
    // DOCUMENTED DIVERGENCE (pre-existing, now explicit): the reference's
    // std::string indexes BYTES while the engine indexes CHARACTERS, so
    // on multibyte text both the offsets and the out_of_range boundary
    // are character-based here ("é" is 1 unit, not 2)
    assert(eval("${attr:substring(1)}", Map("attr" -> "é!")) === "!")
    assert(eval("${attr:substring(${o})}",
      Map("attr" -> "é", "o" -> "2")) === null) // byte-indexed substr(2) = ""
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
    // Decode CSV 2 (cpp:1128-1135): a quoted field whose content never
    // NEEDED quoting (no interior quote, no \r/\n/,) stays quoted — the
    // reference's quote_required check in expr_unescapeCsv
    assert(eval("${message:unescapeCsv()}",
      Map("message" -> "\"quoted\"")) === "\"quoted\"")
    // ...while a quoted field with a comma does unquote
    assert(eval("${message:unescapeCsv()}",
      Map("message" -> "\"a,b\"")) === "a,b")
    // escapeCsv leaves a plain value untouched (expr_escapeCsv)
    assert(eval("${message:escapeCsv()}",
      Map("message" -> "plain value")) === "plain value")
  }

  test("variable registry: blacklisted names invisible, plain variables " +
       "resolve, FlowFile attributes shadow variables " +
       "(ExpressionLanguageTests.cpp:1659-1683)") {
    val registry = ElCompiler.registryFromProperties(Map(
      "foo" -> "foo_val",
      "minifi.variable.registry.blacklist" -> "foo",
      "bar" -> "bar_val",
      "baz" -> "baz_val"))
    ElCompiler.withVariables(registry) {
      val attrs = Map("baz" -> "ff_baz")
      assert(eval("${foo}", attrs) === null)          // blacklisted
      assert(eval("${bar}", attrs) === "bar_val")     // registry constant
      assert(eval("${baz}", attrs) === "ff_baz")      // attribute shadows
    }
  }

  test("now()/random() evaluate per the reference surface " +
       "(ExpressionLanguageTests.cpp:659-665 Random, 1216-1224 Now Date)") {
    // ${now():format('%Y')} prints the current year
    val year = java.time.Year.now(java.time.ZoneOffset.UTC).getValue
    assert(eval("${now():format('%Y', 'UTC')}", Map()).toInt === year)
    // random() yields a positive signed long
    assert(eval("${random()}", Map()).toLong > 0L)
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

  // --- bulk battery ported from the remaining reference cases ---

  test("text plumbing: whitespace in refs, special chars, UTF-8, quoted " +
       "attr names (ExpressionLanguageTests.cpp:94-140)") {
    val a = Map("attr_a" -> "__flow_a_attr_value_a__")
    // whitespace inside ${ } around the attribute name
    assert(eval("text_before${\n\tattr_a \r}text_after", a) ===
      "text_before__flow_a_attr_value_a__text_after")
    // special characters around the expression survive verbatim
    assert(eval("text_before|{}()[],:;\\/*#'\" \t\r\n${attr_a}}()text_after", a) ===
      "text_before|{}()[],:;\\/*#'\" \t\r\n__flow_a_attr_value_a__}()text_after")
    // UTF-8 in template and in attribute value
    assert(eval("text_before\u00a5\u00a3\u20ac\u20a1${attr_a}text_after", a) ===
      "text_before\u00a5\u00a3\u20ac\u20a1__flow_a_attr_value_a__text_after")
    assert(eval("text_before${attr_a}text_after",
      Map("attr_a" -> "__\u00a5\u20ac\u20b9__")) ===
      "text_before__\u00a5\u20ac\u20b9__text_after")
    // single- and double-quoted attribute names with every special char
    val weird = "|{}()[],:;\\/*# \t\r\n$"
    val wk = Map(weird -> "__flow_a_attr_value_a__")
    assert(eval("text_before${'|{}()[],:;\\\\/*# \t\r\n$'}text_after", wk) ===
      "text_before__flow_a_attr_value_a__text_after")
    assert(eval("text_before${\"|{}()[],:;\\\\/*# \t\r\n$\"}text_after", wk) ===
      "text_before__flow_a_attr_value_a__text_after")
  }

  test("replaceFirst regex / replaceAll captures / replaceEmpty " +
       "(ExpressionLanguageTests.cpp:347-418)") {
    val a = Map("attr" -> "a brand new filename.txt")
    assert(eval("${attr:replaceFirst('[br]', 'g')}", a) ===
      "a grand new filename.txt")
    assert(eval("${attr:replaceAll('\\\\..*', '')}", a) === "a brand new filename")
    assert(eval("${attr:replaceAll('a brand (new)', '$1')}", a) ===
      "new filename.txt")
    assert(eval("${attr:replaceAll('XYZ', 'ZZZ')}", a) ===
      "a brand new filename.txt")
    assert(eval("${attr:replaceEmpty('abc')}", a) === "a brand new filename.txt")
    assert(eval("${attr:replaceEmpty('abc')}", Map("attr" -> "  \t  \r  \n  ")) ===
      "abc")
    assert(eval("${attr:replaceEmpty('abc')}", Map("attr2" -> "test")) === "abc")
  }

  test("matches is fully anchored (ExpressionLanguageTests.cpp:419-441)") {
    assert(eval("${attr:matches('^(Ct|Bt|At):.*t$')}", Map("attr" -> "At:est")) === "true")
    assert(eval("${attr:matches('^(Ct|Bt|At):.*t$')}", Map("attr" -> "At:something")) === "false")
    assert(eval("${attr:matches('(Ct|Bt|At):.*t')}", Map("attr" -> " At:est")) === "false")
  }

  test("integer-preserving chains and nested expression args " +
       "(ExpressionLanguageTests.cpp:531-558,667-688)") {
    assert(eval("${attr:plus(13)}", Map("attr" -> "11")) === "24")
    assert(eval("${attr:plus(10e+6)}", Map("attr" -> "11")) === "10000011")
    assert(eval("${attr:multiply(13)}", Map("attr" -> "11")) === "143")
    assert(eval("${attr:multiply(3):plus(1)}", Map("attr" -> "7")) === "22")
    assert(eval("${literal(10):multiply(2):plus(1):multiply(2)}", Map()) === "42")
    assert(eval("${literal(10):multiply(2):plus(${attr:multiply(2)}):multiply(${attr})}",
      Map("attr" -> "7")) === "238")
    assert(eval("${attr:toRadix(2,16)}", Map("attr" -> "10")) === "0000000000001010")
    assert(eval("${attr:toRadix(23,8)}", Map("attr" -> "-2347")) === "-000004a1")
  }

  test("boolean literals, chained numeric equals, comparison battery " +
       "(ExpressionLanguageTests.cpp:690-951)") {
    val one = Map("attr" -> "1")
    assert(eval("${literal(true)}", Map()) === "true")
    assert(eval("${literal(false)}", Map()) === "false")
    assert(eval("${attr:plus(5):equals(6)}", one) === "true")
    assert(eval("${attr:plus(5):equalsIgnoreCase(6)}", one) === "true")
    assert(eval("${attr:plus(5):gt(5)}", one) === "true")
    assert(eval("${attr:plus(5.1):gt(6.05)}", one) === "true")
    assert(eval("${attr:plus(5.1):gt(6.15)}", one) === "false")
    assert(eval("${attr:plus(5):ge(6)}", one) === "true")
    assert(eval("${attr:plus(5.1):ge(6.05)}", one) === "true")
    assert(eval("${attr:plus(5.1):ge(6.15)}", one) === "false")
    assert(eval("${attr:plus(5):lt(5)}", one) === "false")
    assert(eval("${attr:plus(5.1):lt(6.05)}", one) === "false")
    assert(eval("${attr:plus(5.1):lt(6.15)}", one) === "true")
    assert(eval("${attr:plus(5):le(6)}", one) === "true")
    assert(eval("${attr:plus(5.1):le(6.05)}", one) === "false")
    assert(eval("${attr:plus(5.1):le(6.15)}", one) === "true")
    // " \t\r\n a \t\r\n " has content -> not empty
    assert(eval("${attr:isEmpty()}", Map("attr" -> " \t\r\n a \t\r\n ")) === "false")
  }

  test("comparison coercion is the reference's two-path rule: int64 with " +
       "stoll truncation unless BOTH sides carry decimal syntax " +
       "(Expression.cpp:993-1040, Value.h:48-131; GT4 battery " +
       "ExpressionLanguageTests.cpp:843-879 — garbage keeps the " +
       "documented null-not-throw deviation)") {
    // int64 path is EXACT above 2^53 — an all-double compare ties these
    assert(eval("${attr:gt(9007199254740992)}",
      Map("attr" -> "9007199254740993")) === "true")
    assert(eval("${attr:lt(9007199254740993)}",
      Map("attr" -> "9007199254740992")) === "true")
    // one side non-decimal → BOTH truncate toward zero (asSignedLong):
    // gt(13.37) over "13" is 13 > 13 = false, exactly like the reference
    assert(eval("${attr:gt(13.37)}", Map("attr" -> "13")) === "false")
    assert(eval("${attr:ge(13.37)}", Map("attr" -> "13")) === "true")
    assert(eval("${attr:gt(13.37)}", Map("attr" -> "14")) === "true")
    // both decimal syntax → long-double path (13.9 > 13.37)
    assert(eval("${attr:gt(13.37)}", Map("attr" -> "13.9")) === "true")
    // stoll prefix-parse: "-13.37" truncates to -13 on the int path
    assert(eval("${attr:lt(0)}", Map("attr" -> "-13.37")) === "true")
    // empty string parses as strParse's default 0
    assert(eval("${attr:ge(0)}", Map("attr" -> "")) === "true")
    assert(eval("${attr:gt(0)}", Map("attr" -> "")) === "false")
    // GT4's garbage sections: the reference throws invalid_argument per
    // FlowFile; the documented deviation here is null-not-throw (a
    // poisoned task would kill a 100 TB job for one bad row). The
    // out_of_range sections keep the OTHER documented deviation (double
    // magnitude) — pinned in the binary-op coercion test below.
    for (bad <- Seq("banana1337", "app.le+1337"))
      assert(eval("${attr:gt(13.37)}", Map("attr" -> bad)) !== "true")
  }

  test("and/or/not/ifElse with whitespace-padded nested args " +
       "(ExpressionLanguageTests.cpp:952-1014)") {
    val f = Map("filename" -> "an example file.txt")
    val fUp = Map("filename" -> "An example file.txt")
    assert(eval("${filename:toLower():equals( ${filename} ):and(${filename:substring(0, 2):equals('an')})}", f) === "true")
    assert(eval("${filename:toLower():equals( ${filename} ):and(${filename:substring(0, 2):equals('ab')})}", f) === "false")
    assert(eval("${filename:toLower():equals( ${filename} ):or(${filename:substring(0, 2):equals('an')})}", f) === "true")
    assert(eval("${filename:toLower():equals( ${filename} ):or(${filename:substring(0, 2):equals('ab')})}", f) === "true")
    assert(eval("${filename:toLower():equals( ${filename} ):and(${filename:substring(0, 2):equals('an')}):not()}", f) === "false")
    assert(eval("${filename:toLower():equals( ${filename} ):and(${filename:substring(0, 2):equals('ab')}):not()}", f) === "true")
    assert(eval("${filename:toLower():equals( ${filename}):ifElse('yes', 'no')}", f) === "yes")
    assert(eval("${filename:toLower():equals( ${filename}):ifElse('yes', 'no')}", fUp) === "no")
  }

  test("quantifier count/join composition (ExpressionLanguageTests.cpp:1591-1637)") {
    val ab = Map("a" -> "hello", "b" -> "mello")
    assert(eval("${allAttributes('a', 'b'):contains('hello'):count()}",
      Map("a" -> "hello 1", "b" -> "mello 2")) === "1")
    assert(eval("${allAttributes('a', 'b'):contains('mello'):count()}",
      Map("a" -> "mello 1", "b" -> "mello 2", "c" -> "hello 3")) === "2")
    assert(eval("abc${allAttributes('a', 'b'):contains('mello'):count()}xyz",
      Map("a" -> "mello 1", "b" -> "mello 2", "c" -> "hello 3")) === "abc2xyz")
    // per-element prepend/append BEFORE join vs on the joined string AFTER
    assert(eval("abc_${allAttributes('a', 'b'):prepend('def_'):append('_ghi'):join(\"|\")}_xyz", ab) ===
      "abc_def_hello_ghi|def_mello_ghi_xyz")
    assert(eval("abc_${allAttributes('a', 'b'):join(\"|\"):prepend('def_'):append('_ghi')}_xyz", ab) ===
      "abc_def_hello|mello_ghi_xyz")
  }

  test("toDate with a pattern nulls on unparseable input instead of " +
       "throwing (the documented throw-to-null convention; raw " +
       "to_timestamp would poison the task under ANSI)") {
    assert(eval("${attr:toDate('%Y/%m/%d', 'UTC')}",
      Map("attr" -> "garbage")) === null)
    assert(eval("${attr:toDate('%Y/%m/%d', 'UTC'):format('%m-%d-%Y', 'UTC')}",
      Map("attr" -> "2014/03/14")) === "03-14-2014") // valid still parses
  }

  test("toDate() no-arg parses RFC3339 variants, truncates to millis, " +
       "rejects offset-less and padded inputs " +
       "(ExpressionLanguageTests.cpp:1226-1280)") {
    val ms = "1677697495000"; val msFrac = "1677697495190"
    def d(litVal: String): String =
      eval("${literal('" + litVal + "'):toDate()}", Map())
    assert(d("2023-03-01T19:04:55Z") === ms)
    assert(d("2023-03-01T19:04:55.190Z") === msFrac)
    assert(d("2023-03-01T19:04:55.190999Z") === msFrac)  // truncate, not round
    // variable fraction widths (cpp:1233-1239): one digit = tenths, two =
    // hundredths — NOT left-padded milli digits
    assert(d("2023-03-01T19:04:55.1Z") === "1677697495100")
    assert(d("2023-03-01T19:04:55.19Z") === msFrac)
    assert(d("2023-03-01 20:04:55.1+01:00") === "1677697495100")
    assert(d("2023-03-01 20:04:55.19+01:00") === msFrac)
    assert(d("2023-03-01t19:04:55z") === ms)
    assert(d("2023-03-01 19:04:55Z") === ms)
    assert(d("2023-03-01_19:04:55Z") === ms)
    assert(d("2023-03-01T20:04:55+01:00") === ms)
    assert(d("2023-03-01T18:04:55-01:00") === ms)
    assert(d("2023-03-02T03:49:55+08:45") === ms)   // odd-minute offset
    assert(d("2023-03-01 19:04:55-00:00") === ms)
    // invalid inputs -> null (the reference throws; null is the EL error
    // convention here)
    assert(d("2023-03-01T19:04:55") === null)        // offset required
    assert(d("2023-03-01T19:04:55Zbanana") === null)
    assert(d(" 2023-03-01T19:04:55Z") === null)
    assert(d("2023-03-01T19:04:55Z ") === null)
    assert(d("2023-03-01") === null)
  }

  test("strftime-dialect date patterns work verbatim " +
       "(ExpressionLanguageTests.cpp:1168-1215,1283-1298 Parse/Reformat/" +
       "Format Date)") {
    // Format Date battery — %S prints milliseconds like the reference's
    // millisecond-precision time_point; the trailing Z is literal
    val tril = Map("trillion_milliseconds" -> "1000000000000")
    assert(eval("${trillion_milliseconds:format('%Y/%m/%d %H:%M:%SZ', 'UTC')}",
      tril) === "2001/09/09 01:46:40.000Z")
    assert(eval("${trillion_milliseconds:format('%Y/%m/%d %H:%M:%SZ', 'Europe/Paris')}",
      tril) === "2001/09/09 03:46:40.000Z")
    assert(eval("${trillion_milliseconds:format('%Y/%m/%d %H:%M:%SZ', 'America/Los_Angeles')}",
      tril) === "2001/09/08 18:46:40.000Z")
    // Parse Date: timezone-aware epoch
    assert(eval("${message:toDate('%Y/%m/%d', 'America/Los_Angeles')}",
      Map("message" -> "2014/04/30")) === "1398841200000")
    assert(eval("${trillion_utc:toDate('%Y/%m/%d %H:%M:%SZ', 'UTC')}",
      Map("trillion_utc" -> "2001/09/09 01:46:40.000Z")) === "1000000000000")
    assert(eval("${trillion_paris:toDate('%Y/%m/%d %H:%M:%SZ', 'Europe/Paris')}",
      Map("trillion_paris" -> "2001/09/09 03:46:40.000Z")) === "1000000000000")
    // Reformat Date: parse in UTC, print in another zone
    assert(eval("${message:toDate('%Y/%m/%d', 'UTC'):format('%m-%d-%Y', 'America/New_York')}",
      Map("message" -> "2014/03/14")) === "03-13-2014")
    assert(eval("${blue:toDate('%Y%m%d%H%M%S', 'UTC'):format('%Y/%m/%d %H:%M:%SZ', 'Europe/Paris')}",
      Map("blue" -> "20130917162643")) === "2013/09/17 18:26:43.000Z")
    assert(eval("${blue:toDate('%Y%m%d%H%M%S', 'UTC'):format('%Y/%m/%d %H:%M:%SZ', 'America/Los_Angeles')}",
      Map("blue" -> "20130917162643")) === "2013/09/17 09:26:43.000Z")
    // %FT%T%Ez consumes the embedded zone offset, incl. the odd-minute
    // +08:45 form; %T carries the fraction like %S (cpp:1183-1195)
    assert(eval("${ts:toDate('%FT%T%Ez', 'UTC')}",
      Map("ts" -> "2023-03-02T03:49:55.190+08:45")) === "1677697495190")
    // the strftime fraction is VARIABLE width too (date.h %T parses to
    // the stream's precision): .19 = 190 ms, .1 = 100 ms
    assert(eval("${ts:toDate('%FT%T%Ez', 'UTC')}",
      Map("ts" -> "2023-03-02T03:49:55.19+08:45")) === "1677697495190")
    assert(eval("${ts:toDate('%FT%T%Ez', 'UTC')}",
      Map("ts" -> "2023-03-02T03:49:55.1+08:45")) === "1677697495100")
    // padded inputs fail the parse (the reference throws; null here)
    assert(eval("${ts:toDate('%FT%T%Ez', 'UTC')}",
      Map("ts" -> " 2023-03-02T03:49:55.190+08:45")) === null)
    assert(eval("${ts:toDate('%FT%T%Ez', 'UTC')}",
      Map("ts" -> "2023-03-02T03:49:55.190+08:45 ")) === null)
    // the third invalid_timestamp case (cpp:1190-1196): a space where
    // %FT demands the literal 'T' is rejected too
    assert(eval("${ts:toDate('%FT%T%Ez', 'UTC')}",
      Map("ts" -> "2023-03-02 03:49:55.190+08:45 ")) === null)
  }

  test("toDate PARSE side replays date.h from_stream (r20 mining): 1-2 " +
       "digit numeric fields, 0+-whitespace format spaces, POSIX %y " +
       "pivot, literal invalid-modifier matching, ymd-required " +
       "resolution, trailing junk-vs-NUL stream state " +
       "(date.h:6566-7902, Expression.cpp:660-672)") {
    def p(in: String, fmt: String): String =
      eval("${a:toDate('" + fmt + "')}", Map("a" -> in))
    val base = "1704164645000" // 2024-01-02 03:04:05 UTC
    assert(p("2024-01-02 03:04:05", "%Y-%m-%d %H:%M:%S") === base)
    // ru{x, 1, 2}: every numeric field accepts 1..2 digits — a JVM
    // "MM"/"dd"/"HH" pattern would reject all of these
    assert(p("2024-1-2 3:4:5", "%Y-%m-%d %H:%M:%S") === base)
    // a format space is the ws manipulator: matches 0+ whitespace
    assert(p("2024-01-02  03:04:05", "%Y-%m-%d %H:%M:%S") === base)
    assert(p("2024-01-02\t03:04:05", "%Y-%m-%d %H:%M:%S") === base)
    assert(p("2024-01-0203:04:05", "%Y-%m-%d %H:%M:%S") === base)
    // trailing junk throws (null) — but everything at and after a NUL is
    // ignored: expr_toDate's peek() returns '\0' which is falsy
    assert(p("2024-01-02 03:04:05x", "%Y-%m-%d %H:%M:%S") === null)
    assert(p("2024-01-02 03:04:05\u0000junk", "%Y-%m-%d %H:%M:%S") === base)
    // the sys_time overload REQUIRES a complete date (fds.ymd.ok()):
    // time-only fails where Spark would default 1970-01-01; date-only
    // succeeds (has_tod is preset, tod = 0)
    assert(p("03:04:05", "%H:%M:%S") === null)
    assert(p("2024-01-02", "%Y-%m-%d") === "1704153600000")
    // POSIX %y pivot: 69 → 1969 (a JVM 'yy' reduced-value parse → 2069)
    assert(p("69-03-15", "%y-%m-%d") ===
      (java.time.LocalDate.of(1969, 3, 15).toEpochDay * 86400000L).toString)
    assert(p("68-03-15", "%y-%m-%d") ===
      (java.time.LocalDate.of(2068, 3, 15).toEpochDay * 86400000L).toString)
    // %Ey routes to the facet whose C-locale read keeps the same pivot
    assert(p("69-03-15", "%Ey-%m-%d") ===
      (java.time.LocalDate.of(1969, 3, 15).toEpochDay * 86400000L).toString)
    // %y + %C combine instead of pivoting
    assert(p("19 69-03-15", "%C %y-%m-%d") ===
      (java.time.LocalDate.of(1969, 3, 15).toEpochDay * 86400000L).toString)
    // INVALID modified commands match the literal "%<mod><cmd>" INPUT
    // text (read(is, '%', width, modified, *fmt)) — the read-side mirror
    // of the r19 format-side literal passthrough
    assert(p("2024-01-02 %Ed", "%Y-%m-%d %Ed") === "1704153600000")
    assert(p("2024-01-02 x", "%Y-%m-%d %Ed") === null)
    // conventional-range rejection happens at RESOLUTION (the read
    // itself accepts any 2-digit value)
    assert(p("2024-01-02 25:00:00", "%Y-%m-%d %H:%M:%S") === null)
    assert(p("2024-02-31 00:00:00", "%Y-%m-%d %H:%M:%S") === null)
    // checked_set: a re-parsed field must agree
    assert(p("2024-01-02 2024", "%Y-%m-%d %Y") === "1704153600000")
    assert(p("2024-01-02 2025", "%Y-%m-%d %Y") === null)
    // %j resolves month/day from Y-01-01 + (j-1)
    assert(p("2024 60", "%Y %j") === "1709164800000") // 2024-02-29
    assert(p("2024 60 02-29", "%Y %j %m-%d") === "1709164800000")
    assert(p("2024 60 03-01", "%Y %j %m-%d") === null)
    // Sunday-week resolution: %Y %U %w (2024-01-01 is week 0's Monday)
    assert(p("2024 0 1", "%Y %U %w") === "1704067200000")
    // 12-hour clock: %I needs %p (or a consistent %H) — alone it's
    // ambiguous and BREAKS; with %p it combines
    assert(p("2024-01-02 03:04:05 PM", "%Y-%m-%d %I:%M:%S %p") ===
      "1704207845000")
    assert(p("2024-01-02 12:04:05 AM", "%Y-%m-%d %I:%M:%S %p") ===
      "1704153845000") // 12 AM = 00:04:05
    assert(p("2024-01-02 03:04:05", "%Y-%m-%d %I:%M:%S") === null)
    // %z: sign-optional EXACTLY-2-digit hours + optional COLONLESS
    // 2-digit minutes; the %Ez form takes 1-2-digit hours + ':mm'
    assert(p("2024-01-02 03:04:05+0530", "%Y-%m-%d %H:%M:%S%z") ===
      "1704144845000")
    assert(p("2024-01-02 03:04:05 0530", "%Y-%m-%d %H:%M:%S %z") ===
      "1704144845000") // no sign at all
    assert(p("2024-01-02 03:04:05+05:30", "%Y-%m-%d %H:%M:%S%z") === null)
    assert(p("2024-01-02 03:04:05+5:30", "%Y-%m-%d %H:%M:%S%Ez") ===
      "1704144845000")
    assert(p("2024-01-02 03:04:05+05", "%Y-%m-%d %H:%M:%S%Ez") ===
      "1704146645000") // hour-only offset
    // %S consumes ≤ 2+1+3 chars with HALF-EVEN rounding at ms precision;
    // %OS is the facet WHOLE-second read (a fraction is trailing junk)
    assert(p("2024-01-02 03:04:05.5", "%Y-%m-%d %H:%M:%S") ===
      "1704164645500")
    assert(p("2024-01-02 03:04:5.1235", "%Y-%m-%d %H:%M:%S") ===
      "1704164645124") // 6-char budget, .1235 → half-even 124
    assert(p("2024-01-02 03:04:05.1235", "%Y-%m-%d %H:%M:%S") === null)
    assert(p("2024-01-02 03:04:05", "%Y-%m-%d %H:%M:%OS") === base)
    assert(p("2024-01-02 03:04:05.5", "%Y-%m-%d %H:%M:%OS") === null)
    // unknown command = literal "%<c>" match; %% = literal %
    assert(p("2024-01-02 %q", "%Y-%m-%d %q") === "1704153600000")
    assert(p("2024-01-02 %", "%Y-%m-%d %%") === "1704153600000")
    // month/weekday names: date.h scan_keyword — case-insensitive,
    // full-then-abbreviated, and a dead-ended longer-name prefix FAILS
    // rather than falling back to the abbreviation it passed through
    assert(p("Jan 2 2024", "%b %d %Y") === "1704153600000")
    assert(p("JANUARY 2 2024", "%b %d %Y") === "1704153600000")
    assert(p("Janu 2 2024", "%b %d %Y") === null)
    // weekday consistency: 2024-01-02 is a Tuesday
    assert(p("Tue 2024-01-02", "%a %Y-%m-%d") === "1704153600000")
    assert(p("Wed 2024-01-02", "%a %Y-%m-%d") === null)
    // facet-routed composite parses, C-locale expansions (the read-side
    // mirror of the r19 whole-second format facet):
    // %c = "%a %b %e %H:%M:%S %Y" — the double space before a
    // space-padded single-digit day is one ws() skip
    assert(p("Tue Jan  2 03:04:05 2024", "%c") === base)
    assert(p("Wed Jan  2 03:04:05 2024", "%c") === null) // wd conflict
    // %x = "%m/%d/%y" (2-digit year through the POSIX pivot)
    assert(p("01/02/24", "%x") === "1704153600000")
    // %X = "%H:%M:%S" whole-second (a fraction is trailing junk)
    assert(p("2024-01-02 03:04:05", "%F %X") === base)
    assert(p("2024-01-02 03:04:05.5", "%F %X") === null)
    // %r = "%I:%M:%S %p" whole-second, combined to a 24h hour
    assert(p("2024-01-02 03:04:05 PM", "%F %r") === "1704207845000")
    assert(p("2024-01-02 13:04:05 PM", "%F %r") === null) // %I range
    // format→parse roundtrip through the facet pair: what the r19
    // whole-second renderer emits, the parse side must consume
    assert(eval("${ms:format('%c', 'UTC'):toDate('%c')}",
      Map("ms" -> "1704164645000")) === base)
    assert(eval("${ms:format('%x', 'UTC'):toDate('%x')}",
      Map("ms" -> "1704164645000")) === "1704153600000")
    assert(eval("${ms:format('%F %r', 'UTC'):toDate('%F %r')}",
      Map("ms" -> "1704207845000")) === "1704207845000")
  }

  test("format-side unknown commands are literal %<c> and %n/%t emit the " +
       "control char (to_stream default date.h:6105-6117, n/t cases " +
       ":5524,5689) — the fast date_format path, not the renderer") {
    val ms = Map("ms" -> "1704164645000")
    // unknown letter: date.h prints '%' then the char; the old fast path
    // dropped the '%' and a JVM-meaningful letter would even format
    assert(eval("${ms:format('%q', 'UTC')}", ms) === "%q")
    // a digit clears the command, so the whole "%4Y" is literal
    assert(eval("${ms:format('%4Y', 'UTC')}", ms) === "%4Y")
    // %n/%t emit the control characters themselves
    assert(eval("${ms:format('%H%n%M%t%S', 'UTC')}", ms) === "03\n04\t05.000")
    // the renderer path (week-based letters present) agrees on the same
    // unknown-command contract
    assert(eval("${ms:format('%G %q', 'UTC')}", ms) === "2024 %q")
  }

  test("from_stream remaining specifier table: explicit widths, ISO-week " +
       "and week-number trials, %Z consumption, %n/%t, %D/%R composites " +
       "(date.h:6566-7902; direct parser calls)") {
    import graft.el.ElFromStream.toDateMs
    val base = 1704164645000L // 2024-01-02 03:04:05 UTC
    // explicit width overrides the per-command digit budget
    assert(toDateMs("2024-01-02", "%4Y-%m-%d") === 1704153600000L)
    assert(toDateMs("20240102", "%4Y%2m%2d") === 1704153600000L)
    // 2024-01-02 is ISO 2024-W01-2: %G/%V/%u resolve through the
    // ISO-week trial (computed path)
    assert(toDateMs("2024 1 2", "%G %V %u") === 1704153600000L)
    // non-computed consistency: an explicit date must AGREE with a
    // parsed %V (and reject a wrong one)
    assert(toDateMs("2024-01-02 1", "%Y-%m-%d %V") === 1704153600000L)
    assert(toDateMs("2024-01-02 2", "%Y-%m-%d %V") === null)
    // %U (Sunday-start) for the same date is week 0
    assert(toDateMs("2024-01-02 0", "%Y-%m-%d %U") === 1704153600000L)
    // %Z consumes a zone token (alnum/_//-+) and DISCARDS it (the
    // sys_time overload passes no abbrev sink); an empty token fails
    assert(toDateMs("2024-01-02 03:04:05 UTC", "%F %T %Z") === base)
    assert(toDateMs("2024-01-02 03:04:05 America/New_York", "%F %T %Z") === base)
    assert(toDateMs("2024-01-02 03:04:05 ", "%F %T %Z") === null)
    // %n = exactly one whitespace, %t = zero or one
    assert(toDateMs("2024-01-02\t03:04:05", "%F%n%T") === base)
    assert(toDateMs("2024-01-0203:04:05", "%F%n%T") === null)
    assert(toDateMs("2024-01-0203:04:05", "%F%t%T") === base)
    assert(toDateMs("2024-01-02 03:04:05", "%F%t%T") === base)
    // %D = %m/%d/%y, %R = %H:%M
    assert(toDateMs("01/02/24 03:04", "%D %R") === 1704164640000L)
    // unknown command with width/modifier matches its full literal text
    assert(toDateMs("2024-01-02 %3k", "%Y-%m-%d %3k") === 1704153600000L)
  }

  test("property net: ElFromStream.toDateMs inverts java.time formatting " +
       "on 300 random instants across 1900-2199 and six format shapes") {
    import java.time.format.DateTimeFormatter
    import java.time.{Instant, ZoneOffset}
    val cases = Seq(
      ("%Y-%m-%d %H:%M:%S", "uuuu-MM-dd HH:mm:ss", 1000L),
      ("%F %T", "uuuu-MM-dd HH:mm:ss.SSS", 1L),
      ("%d/%m/%Y %H:%M", "dd/MM/uuuu HH:mm", 60000L),
      ("%Y%m%d%H%M%S", "uuuuMMddHHmmss", 1000L),
      ("%a %b %e %H:%M:%S %Y", "EEE MMM ppd HH:mm:ss uuuu", 1000L),
      ("%Y-%j %H", "uuuu-DDD HH", 3600000L))
    val fmts = cases.map { case (el, jvm, g) =>
      (el, DateTimeFormatter.ofPattern(jvm).withLocale(java.util.Locale.ROOT)
        .withZone(ZoneOffset.UTC), g) }
    val rnd = new scala.util.Random(42)
    val lo = -2208988800000L                 // 1900-01-01
    val span = 300L * 365 * 86400 * 1000     // ~2199
    for (_ <- 0 until 300; (elFmt, jvmFmt, grain) <- fmts) {
      val raw = lo + math.floorMod(rnd.nextLong(), span)
      val t = raw - math.floorMod(raw, grain)
      val input = jvmFmt.format(Instant.ofEpochMilli(t))
      assert(graft.el.ElFromStream.toDateMs(input, elFmt) === t,
        s"input '$input' fmt '$elFmt'")
    }
  }

  test("toDate() no-arg RFC3339 corners beyond the r-battery: 1-2-digit " +
       "fields, hour-only offset, colonless-minute rejection, the " +
       "duration-overload hour overflow, the ends_with-Z branch dispatch " +
       "(TimeUtil.cpp:85-115)") {
    def d(in: String): String = eval("${a:toDate()}", Map("a" -> in))
    val base = "1704164645000" // 2024-01-02T03:04:05Z
    // %F/%T read 1-2 digit fields like any from_stream numeric
    assert(d("2024-1-2t3:4:5z") === base)
    // offset: hour-only "+05" is valid %Ez; colonless "+0530" is NOT
    assert(d("2024-01-02T08:04:05+05") === base)
    assert(d("2024-01-02T08:34:05+05:30") === base)
    assert(d("2024-01-02T08:34:05+0530") === null)
    // the duration overload has NO conventional-range check — hour 25
    // folds into the next day (sys_days + 25h)
    assert(d("2024-01-02T25:04:05Z") === "1704243845000")
    // branch dispatch keys on str.ends_with('Z'/'z'): junk after Z falls
    // to the OFFSET branch and fails AT the 'Z'; the trailing-NUL
    // acceptance therefore exists only on the offset form
    assert(d("2024-01-02T03:04:05Zx") === null)
    assert(d("2024-01-02T03:04:05Z\u0000x") === null)
    assert(d("2024-01-02T08:34:05+05:30\u0000x") === base)
    // fraction: ≤ 9 ns digits read (12-char %T seconds budget), then
    // TRUNCATED to ms; a 10th digit is trailing junk
    assert(d("2024-01-02T03:04:05.123456789Z") === "1704164645123")
    assert(d("2024-01-02T03:04:05.1234567899Z") === null)
  }

  test("strftime week/ordinal/padding specifiers format C-faithfully — " +
       "%G/%V/%u crashed Spark's dialect, %e lost its space pad, " +
       "%U/%W/%C/%s printed raw letters (Expression.cpp format via " +
       "date.h strftime flags; r15 UDF path)") {
    // 2021-01-01T00:00:00Z is a Friday, ISO 2020-W53-5 — the classic
    // year-boundary case where the ISO week-based year (%G) differs
    // from %Y. Spark rejects week-based pattern letters at runtime
    // (probed: SparkUpgradeException for the old 'YYYY'/'ww'/'e'
    // translations), so these route through the strftime renderer.
    val ny = Map("ms" -> "1609459200000")
    assert(eval("${ms:format('%G-W%V-%u', 'UTC')}", ny) === "2020-W53-5")
    assert(eval("${ms:format('%g', 'UTC')}", ny) === "20")
    assert(eval("${ms:format('%Y %U %W', 'UTC')}", ny) === "2021 00 00")
    // C pads %e with a SPACE, never zero; %C is the century
    assert(eval("${ms:format('%e|%C|%w', 'UTC')}", ny) === " 1|20|5")
    // the trillion timestamp: 2001-09-09 is a SUNDAY — %U (Sunday-start
    // weeks) and %W (Monday-start) agree at 36, %u is 7, %w is 0
    val tril = Map("ms" -> "1000000000000")
    assert(eval("${ms:format('%V %G %u %U %W %w', 'UTC')}", tril) ===
      "36 2001 7 36 36 0")
    assert(eval("${ms:format('%s', 'UTC')}", tril) === "1000000000")
    // %c / %x / %X / %r route through std::time_put over a WHOLE-SECOND
    // struct tm in the reference's date.h (to_stream c/x/X cases build a
    // tm and call facet.put) — so unlike the natively-rendered %S/%T they
    // carry NO millisecond fraction (r19 mined fix; date.h:5129-5160)
    assert(eval("${ms:format('%c', 'UTC')}", tril) ===
      "Sun Sep  9 01:46:40 2001")
    assert(eval("${ms:format('%x %X', 'UTC')}", tril) ===
      "09/09/01 01:46:40")
    assert(eval("${ms:format('%D %r', 'UTC')}", tril) ===
      "09/09/01 01:46:40 AM")
    // ...while the native %S/%T paths DO print the fraction
    assert(eval("${ms:format('%T', 'UTC')}", tril) === "01:46:40.000")
    // zone rendering: %z is ±hhmm, %Ez is ±hh:mm — and a ZERO offset
    // must print +00:00 like C, never the JVM's 'Z' shorthand
    assert(eval("${ms:format('%z', 'UTC')}", tril) === "+0000")
    assert(eval("${ms:format('%FT%T%Ez', 'UTC')}", tril) ===
      "2001-09-09T01:46:40.000+00:00")
    assert(eval("${ms:format('%FT%T%Ez', 'Asia/Kathmandu')}", tril) ===
      "2001-09-09T07:31:40.000+05:45")  // odd-minute offset zone
    // fast path unaffected: the common specifiers still codegen
    assert(eval("${ms:format('%Y/%m/%d %H:%M:%SZ', 'UTC')}", tril) ===
      "2001/09/09 01:46:40.000Z")
  }

  test("locale-alternate %E/%O modifiers replay date.h to_stream exactly " +
       "(date.h:5129-5400, r19 mining): valid combos fall back to the " +
       "C-locale facet, INVALID combos print as literals — never the " +
       "glibc-style unmodified fallback") {
    val tril = Map("ms" -> "1000000000000") // 2001-09-09T01:46:40Z, Sunday
    // valid %E combos: E{c,C,x,X,y,Y,z} — C locale has no eras, so they
    // render like the unmodified command via the facet (whole seconds)
    assert(eval("${ms:format('%EY %Ey %EC', 'UTC')}", tril) === "2001 01 20")
    assert(eval("${ms:format('%Ec', 'UTC')}", tril) ===
      "Sun Sep  9 01:46:40 2001")
    assert(eval("${ms:format('%Ex %EX', 'UTC')}", tril) === "09/09/01 01:46:40")
    // valid %O combos: O{d,e,H,I,m,M,S,u,U,V,w,W,y,z} — no alternate
    // digits in C, so unmodified renderings; %OS is the facet's WHOLE
    // seconds even though native %S prints the millisecond fraction
    assert(eval("${ms:format('%Od %Oe %OH %OI %Om %OM', 'UTC')}", tril) ===
      "09  9 01 01 09 46")
    assert(eval("${ms:format('%OS', 'UTC')}", tril) === "40")
    assert(eval("${ms:format('%S', 'UTC')}", tril) === "40.000")
    assert(eval("${ms:format('%Ou %OU %OV %Ow %OW %Oy', 'UTC')}", tril) ===
      "7 36 36 0 36 01")
    // both modifiers insert the ':' into the offset (date.h z-case:
    // any non-empty modifier)
    assert(eval("${ms:format('%Oz', 'UTC')}", tril) === "+00:00")
    assert(eval("${ms:format('%Ez', 'Asia/Kathmandu')}", tril) === "+05:45")
    // INVALID combos are literal passthrough in date.h (it never falls
    // back to the unmodified form the way glibc strftime does)
    assert(eval("${ms:format('%EH', 'UTC')}", tril) === "%EH")
    assert(eval("${ms:format('%Ed %ES %Eb', 'UTC')}", tril) === "%Ed %ES %Eb")
    assert(eval("${ms:format('%OY %Oa %OZ %Oc', 'UTC')}", tril) ===
      "%OY %Oa %OZ %Oc")
    // a doubled modifier flushes "%<m1><m2>" and the next char prints raw
    assert(eval("${ms:format('%EOY', 'UTC')}", tril) === "%EOY")
    // %Z prints the zone ABBREVIATION the zoned time carries (date.h
    // streams *abbrev), not the IANA id; modified %Z is literal
    assert(eval("${ms:format('%Z', 'UTC')}", tril) === "UTC")
    assert(eval("${ms:format('%Z', 'America/Los_Angeles')}", tril) === "PDT")
    assert(eval("${ms:format('%EZ', 'UTC')}", tril) === "%EZ")
    // DOCUMENTED DIVERGENCE: for zones whose modern tzdb abbreviation is
    // numeric, date.h streams that numeric form ("+0545") while the JDK
    // still carries a legacy alphabetic short name — pinned so the gap
    // is a recorded contract, not an accident
    assert(eval("${ms:format('%Z', 'Asia/Kathmandu')}", tril) === "NPT")
  }

  test("quantifier Contains battery over multiple / matching / delineated " +
       "attributes (ExpressionLanguageTests.cpp:1443-1589)") {
    // All Contains / All Contains 2 / Any Contains / Any Contains 2
    assert(eval("${allAttributes('a', 'b'):contains('hello')}",
      Map("a" -> "hello 1", "b" -> "hello 2")) === "true")
    assert(eval("${allAttributes('a', 'b'):contains('hello')}",
      Map("a" -> "hello 1", "b" -> "mello 2")) === "false")
    assert(eval("${anyAttribute('a', 'b'):contains('hello')}",
      Map("a" -> "hello 1", "b" -> "mello 2")) === "true")
    assert(eval("${anyAttribute('a', 'b'):contains('hello')}",
      Map("a" -> "mello 1", "b" -> "mello 2")) === "false")
    // All/Any Matching Contains 1-4: the name pattern is a WHOLE-name
    // match; an empty candidate set makes all() false (2) and the
    // matching subset alone decides (3)
    assert(eval("${allMatchingAttributes('xyz_.*'):contains('hello')}",
      Map("xyz_1" -> "hello 1", "xyz_2" -> "hello 2")) === "true")
    assert(eval("${allMatchingAttributes('abc_.*'):contains('hello')}",
      Map("xyz_1" -> "hello 1", "xyz_2" -> "hello 2")) === "false")
    assert(eval("${allMatchingAttributes('abc_.*'):contains('hello')}",
      Map("xyz_1" -> "hello 1", "abc_2" -> "hello 2")) === "true")
    assert(eval("${allMatchingAttributes('xyz_.*'):contains('hello')}",
      Map("xyz_1" -> "hello 1", "xyz_2" -> "2")) === "false")
    assert(eval("${anyMatchingAttribute('xyz_.*'):contains('hello')}",
      Map("xyz_1" -> "hello 1", "xyz_2" -> "mello 2")) === "true")
    assert(eval("${anyMatchingAttribute('abc_.*'):contains('hello')}",
      Map("xyz_1" -> "hello 1", "xyz_2" -> "mello 2")) === "false")
    assert(eval("${anyMatchingAttribute('abc_.*'):contains('hello')}",
      Map("abc_1" -> "hello 1", "xyz_2" -> "mello 2")) === "true")
    assert(eval("${anyMatchingAttribute('abc_.*'):contains('hello')}",
      Map("xyz_1" -> "mello 1", "xyz_2" -> "mello 2")) === "false")
    // All/Any Delineated Contains — incl. the delimiter-not-present case
    // (3): one candidate = the whole value
    val wl = Map("word_list" -> "hello_1,hello_2")
    assert(eval("${allDelineatedValues(${word_list}, ','):contains('hello')}",
      wl) === "true")
    assert(eval("${allDelineatedValues(${word_list}, ','):contains('hello')}",
      Map("word_list" -> "hello_1,mello_2")) === "false")
    assert(eval("${allDelineatedValues(${word_list}, ' '):contains('1,h')}",
      wl) === "true")
    assert(eval("${anyDelineatedValue(${word_list}, ','):contains('hello')}",
      Map("word_list" -> "hello_1,mello_2")) === "true")
    assert(eval("${anyDelineatedValue(${word_list}, ','):contains('hello')}",
      Map("word_list" -> "mello_1,mello_2")) === "false")
  }

  test("JSON / URL / B64 encode-decode reference vectors " +
       "(ExpressionLanguageTests.cpp:1016-1038,1144-1166,1419-1442)") {
    // Encode/Decode/Round-trip JSON
    assert(eval("${message:escapeJson()}",
      Map("message" -> "This is a \"test!\"")) === "This is a \\\"test!\\\"")
    assert(eval("${message:unescapeJson()}",
      Map("message" -> "This is a \\\"test!\\\"")) === "This is a \"test!\"")
    assert(eval("${message:escapeJson():unescapeJson()}",
      Map("message" -> "This is a \"test!\"")) === "This is a \"test!\"")
    // Encode/Decode/Round-trip URL — curl_easy_escape semantics: %20 for
    // space (never '+'), '~' unreserved, '*' escaped, '+' survives decode
    assert(eval("${message:urlEncode()}",
      Map("message" -> "some value with spaces")) ===
      "some%20value%20with%20spaces")
    assert(eval("${message:urlDecode()}",
      Map("message" -> "some%20value%20with%20spaces")) ===
      "some value with spaces")
    assert(eval("${message:urlEncode():urlDecode()}",
      Map("message" -> "some value with spaces")) === "some value with spaces")
    assert(eval("${message:urlEncode()}", Map("message" -> "a~b*c+d")) ===
      "a~b%2Ac%2Bd")
    assert(eval("${message:urlDecode()}", Map("message" -> "a+b%20c")) ===
      "a+b c")
    // Encode/Decode/Round-trip B64
    assert(eval("${message:base64Encode()}",
      Map("message" -> "admin:admin")) === "YWRtaW46YWRtaW4=")
    assert(eval("${message:base64Decode()}",
      Map("message" -> "YWRtaW46YWRtaW4=")) === "admin:admin")
    assert(eval("${message:base64Encode():base64Decode()}",
      Map("message" -> "Zero > One < \"two!\" & 'true'")) ===
      "Zero > One < \"two!\" & 'true'")
  }

  test("binary-op coercion table: int op iff both sides non-decimal, " +
       "divide always decimal, mod both forms (Expression.cpp:833-861)") {
    // both integral → integer op, integer rendering (no trailing .0)
    assert(eval("${attr:plus(2)}", Map("attr" -> "3")) === "5")
    assert(eval("${attr:multiply(-2)}", Map("attr" -> "3")) === "-6")
    assert(eval("${attr:mod(3)}", Map("attr" -> "11")) === "2")
    // either side decimal → long-double path
    assert(eval("${attr:plus(2.5)}", Map("attr" -> "3")) === "5.5")
    assert(eval("${attr:plus(2)}", Map("attr" -> "3.5")) === "5.5")
    assert(math.abs(eval("${attr:mod(2.5)}", Map("attr" -> "11"))
      .toDouble - 1.0) < 1e-9)
    // divide is long_only=true: 11/2 is 5.5, never integer division
    assert(eval("${attr:divide(2)}", Map("attr" -> "11")) === "5.5")
    // GT3: int attr + decimal literal flows decimal through the chain
    assert(eval("${attr:plus(5.1):gt(6.15)}", Map("attr" -> "1")) === "false")
    assert(eval("${attr:plus(5.2):gt(6.15)}", Map("attr" -> "1")) === "true")
    // GT4 'Value parsing errors' corner table: the reference throws
    // per-FlowFile; a columnar engine cannot poison the whole batch
    // (the try_cast design, ElCompiler.num), so the corners resolve:
    //  - genuinely unparseable text -> null operand -> NEVER true, for
    //    both polarities, instead of erroring;
    for (bad <- Seq("banana1337", "app.le+1337")) {
      assert(eval("${attr1:gt(13.37)}", Map("attr1" -> bad)) !== "true")
      assert(eval("${attr1:le(13.37)}", Map("attr1" -> bad)) !== "true")
    }
    //  - out-of-int64/quad-range NUMERIC text (the reference's strtoll/
    //    strtold "out of range" throws) parses on the double path and
    //    compares by magnitude (2^64 and 1.19e4933 -> huge positives).
    for (huge <- Seq("18446744073709551616",
        "1.1897314953572317650857593266280070162e+4933", "1e300")) {
      assert(eval("${attr1:gt(13.37)}", Map("attr1" -> huge)) === "true")
      assert(eval("${attr1:le(13.37)}", Map("attr1" -> huge)) === "false")
    }
  }
}
