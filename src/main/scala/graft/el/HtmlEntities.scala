package graft.el

/**
 * HTML 3/4 named-entity tables for the EL escape family
 * (escapeHtml3/4, unescapeHtml3/4 — Expression.cpp:468-558, behavior of
 * utils::string::replaceMap StringUtils.cpp:197-219: all matches are
 * located against the ORIGINAL string and replaced simultaneously, so
 * produced entities are never re-escaped).
 *
 * The data is the public W3C HTML 3.2 / 4.0 named character entity set
 * (ISO-8859-1 + Greek/symbol/typography blocks), reproduced with the
 * reference's exact quirks for parity: `&brkbar;` for U+00A6 (standard
 * HTML uses `&brvbar;`), and the doubled-semicolon values `&raquo;;` /
 * `&Ugrave;;`. Duplicate keys in the reference initializer lists follow
 * std::map first-insert-wins (`&circ;` -> "^", `&tilde;` -> "~").
 *
 * Escape keys are all single BMP chars -> one-pass StringBuilder scan;
 * unescape goes through one alternation regex (longest key first), both
 * equivalent to the reference's simultaneous replace.
 */
object HtmlEntities {

  val html3Escape: Seq[(String, String)] = Seq(
    "!" -> "&excl;", "\"" -> "&quot;", "#" -> "&num;",
    "$" -> "&dollar;", "%" -> "&percnt;", "&" -> "&amp;",
    "'" -> "&apos;", "(" -> "&lpar;", ")" -> "&rpar;",
    "*" -> "&ast;", "+" -> "&plus;", "," -> "&comma;",
    "-" -> "&minus;", "." -> "&period;", "/" -> "&sol;",
    ":" -> "&colon;", ";" -> "&semi;", "<" -> "&lt;",
    "=" -> "&equals;", ">" -> "&gt;", "?" -> "&quest;",
    "@" -> "&commat;", "[" -> "&lsqb;", "\\" -> "&bsol;",
    "]" -> "&rsqb;", "^" -> "&circ;", "_" -> "&lowbar;",
    "`" -> "&grave;", "{" -> "&lcub;", "|" -> "&verbar;",
    "}" -> "&rcub;", "~" -> "&tilde;", "\u00a1" -> "&iexcl;",
    "\u00a2" -> "&cent;", "\u00a3" -> "&pound;", "\u00a4" -> "&curren;",
    "\u00a5" -> "&yen;", "\u00a6" -> "&brkbar;", "\u00a7" -> "&sect;",
    "\u00a8" -> "&uml;", "\u00a9" -> "&copy;", "\u00aa" -> "&ordf;",
    "\u00ab" -> "&laquo;", "\u00ac" -> "&not;", "\u00ae" -> "&reg;",
    "\u00af" -> "&macr;", "\u00b0" -> "&deg;", "\u00b1" -> "&plusmn;",
    "\u00b2" -> "&sup2;", "\u00b3" -> "&sup3;", "\u00b4" -> "&acute;",
    "\u00b5" -> "&micro;", "\u00b6" -> "&para;", "\u00b7" -> "&middot;",
    "\u00b8" -> "&cedil;", "\u00b9" -> "&sup1;", "\u00ba" -> "&ordm;",
    "\u00bb" -> "&raquo;;", "\u00bc" -> "&frac14;", "\u00bd" -> "&frac12;",
    "\u00be" -> "&frac34;", "\u00bf" -> "&iquest;", "\u00c0" -> "&Agrave;",
    "\u00c1" -> "&Aacute;", "\u00c2" -> "&Acirc;", "\u00c3" -> "&Atilde;",
    "\u00c4" -> "&Auml;", "\u00c5" -> "&Aring;", "\u00c6" -> "&AElig;",
    "\u00c7" -> "&Ccedil;", "\u00c8" -> "&Egrave;", "\u00c9" -> "&Eacute;",
    "\u00ca" -> "&Ecirc;", "\u00cb" -> "&Euml;", "\u00cc" -> "&Igrave;",
    "\u00cd" -> "&Iacute;", "\u00ce" -> "&Icirc;", "\u00cf" -> "&Iuml;",
    "\u00d0" -> "&ETH;", "\u00d1" -> "&Ntilde;", "\u00d2" -> "&Ograve;",
    "\u00d3" -> "&Oacute;", "\u00d4" -> "&Ocirc;", "\u00d5" -> "&Otilde;",
    "\u00d6" -> "&Ouml;", "\u00d7" -> "&times;", "\u00d8" -> "&Oslash;",
    "\u00d9" -> "&Ugrave;;", "\u00da" -> "&Uacute;", "\u00db" -> "&Ucirc;",
    "\u00dc" -> "&Uuml;", "\u00dd" -> "&Yacute;", "\u00de" -> "&THORN;",
    "\u00df" -> "&szlig;", "\u00e0" -> "&agrave;", "\u00e1" -> "&aacute;",
    "\u00e2" -> "&acirc;", "\u00e3" -> "&atilde;", "\u00e4" -> "&auml;",
    "\u00e5" -> "&aring;", "\u00e6" -> "&aelig;", "\u00e7" -> "&ccedil;",
    "\u00e8" -> "&egrave;", "\u00e9" -> "&eacute;", "\u00ea" -> "&ecirc;",
    "\u00eb" -> "&euml;", "\u00ec" -> "&igrave;", "\u00ed" -> "&iacute;",
    "\u00ee" -> "&icirc;", "\u00ef" -> "&iuml;", "\u00f0" -> "&eth;",
    "\u00f1" -> "&ntilde;", "\u00f2" -> "&ograve;", "\u00f3" -> "&oacute;",
    "\u00f4" -> "&ocirc;", "\u00f5" -> "&otilde;", "\u00f6" -> "&ouml;",
    "\u00f7" -> "&divide;", "\u00f8" -> "&oslash;", "\u00f9" -> "&ugrave;",
    "\u00fa" -> "&uacute;", "\u00fb" -> "&ucirc;", "\u00fc" -> "&uuml;",
    "\u00fd" -> "&yacute;", "\u00fe" -> "&thorn;", "\u00ff" -> "&yuml;")

  val html4Escape: Seq[(String, String)] = Seq(
    "!" -> "&excl;", "\"" -> "&quot;", "#" -> "&num;",
    "$" -> "&dollar;", "%" -> "&percnt;", "&" -> "&amp;",
    "'" -> "&apos;", "(" -> "&lpar;", ")" -> "&rpar;",
    "*" -> "&ast;", "+" -> "&plus;", "," -> "&comma;",
    "-" -> "&minus;", "." -> "&period;", "/" -> "&sol;",
    ":" -> "&colon;", ";" -> "&semi;", "<" -> "&lt;",
    "=" -> "&equals;", ">" -> "&gt;", "?" -> "&quest;",
    "@" -> "&commat;", "[" -> "&lsqb;", "\\" -> "&bsol;",
    "]" -> "&rsqb;", "^" -> "&circ;", "_" -> "&lowbar;",
    "`" -> "&grave;", "{" -> "&lcub;", "|" -> "&verbar;",
    "}" -> "&rcub;", "~" -> "&tilde;", "\u00a1" -> "&iexcl;",
    "\u00a2" -> "&cent;", "\u00a3" -> "&pound;", "\u00a4" -> "&curren;",
    "\u00a5" -> "&yen;", "\u00a6" -> "&brkbar;", "\u00a7" -> "&sect;",
    "\u00a8" -> "&uml;", "\u00a9" -> "&copy;", "\u00aa" -> "&ordf;",
    "\u00ab" -> "&laquo;", "\u00ac" -> "&not;", "\u00ae" -> "&reg;",
    "\u00af" -> "&macr;", "\u00b0" -> "&deg;", "\u00b1" -> "&plusmn;",
    "\u00b2" -> "&sup2;", "\u00b3" -> "&sup3;", "\u00b4" -> "&acute;",
    "\u00b5" -> "&micro;", "\u00b6" -> "&para;", "\u00b7" -> "&middot;",
    "\u00b8" -> "&cedil;", "\u00b9" -> "&sup1;", "\u00ba" -> "&ordm;",
    "\u00bb" -> "&raquo;;", "\u00bc" -> "&frac14;", "\u00bd" -> "&frac12;",
    "\u00be" -> "&frac34;", "\u00bf" -> "&iquest;", "\u00c0" -> "&Agrave;",
    "\u00c1" -> "&Aacute;", "\u00c2" -> "&Acirc;", "\u00c3" -> "&Atilde;",
    "\u00c4" -> "&Auml;", "\u00c5" -> "&Aring;", "\u00c6" -> "&AElig;",
    "\u00c7" -> "&Ccedil;", "\u00c8" -> "&Egrave;", "\u00c9" -> "&Eacute;",
    "\u00ca" -> "&Ecirc;", "\u00cb" -> "&Euml;", "\u00cc" -> "&Igrave;",
    "\u00cd" -> "&Iacute;", "\u00ce" -> "&Icirc;", "\u00cf" -> "&Iuml;",
    "\u00d0" -> "&ETH;", "\u00d1" -> "&Ntilde;", "\u00d2" -> "&Ograve;",
    "\u00d3" -> "&Oacute;", "\u00d4" -> "&Ocirc;", "\u00d5" -> "&Otilde;",
    "\u00d6" -> "&Ouml;", "\u00d7" -> "&times;", "\u00d8" -> "&Oslash;",
    "\u00d9" -> "&Ugrave;;", "\u00da" -> "&Uacute;", "\u00db" -> "&Ucirc;",
    "\u00dc" -> "&Uuml;", "\u00dd" -> "&Yacute;", "\u00de" -> "&THORN;",
    "\u00df" -> "&szlig;", "\u00e0" -> "&agrave;", "\u00e1" -> "&aacute;",
    "\u00e2" -> "&acirc;", "\u00e3" -> "&atilde;", "\u00e4" -> "&auml;",
    "\u00e5" -> "&aring;", "\u00e6" -> "&aelig;", "\u00e7" -> "&ccedil;",
    "\u00e8" -> "&egrave;", "\u00e9" -> "&eacute;", "\u00ea" -> "&ecirc;",
    "\u00eb" -> "&euml;", "\u00ec" -> "&igrave;", "\u00ed" -> "&iacute;",
    "\u00ee" -> "&icirc;", "\u00ef" -> "&iuml;", "\u00f0" -> "&eth;",
    "\u00f1" -> "&ntilde;", "\u00f2" -> "&ograve;", "\u00f3" -> "&oacute;",
    "\u00f4" -> "&ocirc;", "\u00f5" -> "&otilde;", "\u00f6" -> "&ouml;",
    "\u00f7" -> "&divide;", "\u00f8" -> "&oslash;", "\u00f9" -> "&ugrave;",
    "\u00fa" -> "&uacute;", "\u00fb" -> "&ucirc;", "\u00fc" -> "&uuml;",
    "\u00fd" -> "&yacute;", "\u00fe" -> "&thorn;", "\u00ff" -> "&yuml;",
    "\u0192" -> "&fnof;", "\u0391" -> "&Alpha;", "\u0392" -> "&Beta;",
    "\u0393" -> "&Gamma;", "\u0394" -> "&Delta;", "\u0395" -> "&Epsilon;",
    "\u0396" -> "&Zeta;", "\u0397" -> "&Eta;", "\u0398" -> "&Theta;",
    "\u0399" -> "&Iota;", "\u039a" -> "&Kappa;", "\u039b" -> "&Lambda;",
    "\u039c" -> "&Mu;", "\u039d" -> "&Nu;", "\u039e" -> "&Xi;",
    "\u039f" -> "&Omicron;", "\u03a0" -> "&Pi;", "\u03a1" -> "&Rho;",
    "\u03a3" -> "&Sigma;", "\u03a4" -> "&Tau;", "\u03a5" -> "&Upsilon;",
    "\u03a6" -> "&Phi;", "\u03a7" -> "&Chi;", "\u03a8" -> "&Psi;",
    "\u03a9" -> "&Omega;", "\u03b1" -> "&alpha;", "\u03b2" -> "&beta;",
    "\u03b3" -> "&gamma;", "\u03b4" -> "&delta;", "\u03b5" -> "&epsilon;",
    "\u03b6" -> "&zeta;", "\u03b7" -> "&eta;", "\u03b8" -> "&theta;",
    "\u03b9" -> "&iota;", "\u03ba" -> "&kappa;", "\u03bb" -> "&lambda;",
    "\u03bc" -> "&mu;", "\u03bd" -> "&nu;", "\u03be" -> "&xi;",
    "\u03bf" -> "&omicron;", "\u03c0" -> "&pi;", "\u03c1" -> "&rho;",
    "\u03c2" -> "&sigmaf;", "\u03c3" -> "&sigma;", "\u03c4" -> "&tau;",
    "\u03c5" -> "&upsilon;", "\u03c6" -> "&phi;", "\u03c7" -> "&chi;",
    "\u03c8" -> "&psi;", "\u03c9" -> "&omega;", "\u03d1" -> "&thetasym;",
    "\u03d2" -> "&upsih;", "\u03d6" -> "&piv;", "\u2022" -> "&bull;",
    "\u2026" -> "&hellip;", "\u2032" -> "&prime;", "\u2033" -> "&Prime;",
    "\u203e" -> "&oline;", "\u2044" -> "&frasl;", "\u2118" -> "&weierp;",
    "\u2111" -> "&image;", "\u211c" -> "&real;", "\u2122" -> "&trade;",
    "\u2135" -> "&alefsym;", "\u2190" -> "&larr;", "\u2191" -> "&uarr;",
    "\u2192" -> "&rarr;", "\u2193" -> "&darr;", "\u2194" -> "&harr;",
    "\u21b5" -> "&crarr;", "\u21d0" -> "&lArr;", "\u21d1" -> "&uArr;",
    "\u21d2" -> "&rArr;", "\u21d3" -> "&dArr;", "\u21d4" -> "&hArr;",
    "\u2200" -> "&forall;", "\u2202" -> "&part;", "\u2203" -> "&exist;",
    "\u2205" -> "&empty;", "\u2207" -> "&nabla;", "\u2208" -> "&isin;",
    "\u2209" -> "&notin;", "\u220b" -> "&ni;", "\u220f" -> "&prod;",
    "\u2211" -> "&sum;", "\u2212" -> "&minus;", "\u2217" -> "&lowast;",
    "\u221a" -> "&radic;", "\u221d" -> "&prop;", "\u221e" -> "&infin;",
    "\u2220" -> "&ang;", "\u2227" -> "&and;", "\u2228" -> "&or;",
    "\u2229" -> "&cap;", "\u222a" -> "&cup;", "\u222b" -> "&int;",
    "\u2234" -> "&there4;", "\u223c" -> "&sim;", "\u2245" -> "&cong;",
    "\u2248" -> "&asymp;", "\u2260" -> "&ne;", "\u2261" -> "&equiv;",
    "\u2264" -> "&le;", "\u2265" -> "&ge;", "\u2282" -> "&sub;",
    "\u2283" -> "&sup;", "\u2284" -> "&nsub;", "\u2286" -> "&sube;",
    "\u2287" -> "&supe;", "\u2295" -> "&oplus;", "\u2297" -> "&otimes;",
    "\u22a5" -> "&perp;", "\u22c5" -> "&sdot;", "\u2308" -> "&lceil;",
    "\u2309" -> "&rceil;", "\u230a" -> "&lfloor;", "\u230b" -> "&rfloor;",
    "\u2329" -> "&lang;", "\u232a" -> "&rang;", "\u25ca" -> "&loz;",
    "\u2660" -> "&spades;", "\u2663" -> "&clubs;", "\u2665" -> "&hearts;",
    "\u2666" -> "&diams;", "\u0152" -> "&OElig;", "\u0153" -> "&oelig;",
    "\u0160" -> "&Scaron;", "\u0161" -> "&scaron;", "\u0178" -> "&Yuml;",
    "\u02c6" -> "&circ;", "\u02dc" -> "&tilde;", "\u2002" -> "&ensp;",
    "\u2003" -> "&emsp;", "\u2009" -> "&thinsp;", "\u200c" -> "&zwnj;",
    "\u200d" -> "&zwj;", "\u200e" -> "&lrm;", "\u200f" -> "&rlm;",
    "\u2013" -> "&ndash;", "\u2014" -> "&mdash;", "\u2018" -> "&lsquo;",
    "\u2019" -> "&rsquo;", "\u201a" -> "&sbquo;", "\u201c" -> "&ldquo;",
    "\u201d" -> "&rdquo;", "\u201e" -> "&bdquo;", "\u2020" -> "&dagger;",
    "\u2021" -> "&Dagger;", "\u2030" -> "&permil;", "\u2039" -> "&lsaquo;",
    "\u203a" -> "&rsaquo;", "\u20ac" -> "&euro;")

  val html3Unescape: Seq[(String, String)] = Seq(
    "&excl;" -> "!", "&quot;" -> "\"", "&num;" -> "#",
    "&dollar;" -> "$", "&percnt;" -> "%", "&amp;" -> "&",
    "&apos;" -> "'", "&lpar;" -> "(", "&rpar;" -> ")",
    "&ast;" -> "*", "&plus;" -> "+", "&comma;" -> ",",
    "&minus;" -> "-", "&period;" -> ".", "&sol;" -> "/",
    "&colon;" -> ":", "&semi;" -> ";", "&lt;" -> "<",
    "&equals;" -> "=", "&gt;" -> ">", "&quest;" -> "?",
    "&commat;" -> "@", "&lsqb;" -> "[", "&bsol;" -> "\\",
    "&rsqb;" -> "]", "&circ;" -> "^", "&lowbar;" -> "_",
    "&grave;" -> "`", "&lcub;" -> "{", "&verbar;" -> "|",
    "&rcub;" -> "}", "&tilde;" -> "~", "&iexcl;" -> "\u00a1",
    "&cent;" -> "\u00a2", "&pound;" -> "\u00a3", "&curren;" -> "\u00a4",
    "&yen;" -> "\u00a5", "&brkbar;" -> "\u00a6", "&sect;" -> "\u00a7",
    "&uml;" -> "\u00a8", "&copy;" -> "\u00a9", "&ordf;" -> "\u00aa",
    "&laquo;" -> "\u00ab", "&not;" -> "\u00ac", "&reg;" -> "\u00ae",
    "&macr;" -> "\u00af", "&deg;" -> "\u00b0", "&plusmn;" -> "\u00b1",
    "&sup2;" -> "\u00b2", "&sup3;" -> "\u00b3", "&acute;" -> "\u00b4",
    "&micro;" -> "\u00b5", "&para;" -> "\u00b6", "&middot;" -> "\u00b7",
    "&cedil;" -> "\u00b8", "&sup1;" -> "\u00b9", "&ordm;" -> "\u00ba",
    "&raquo;;" -> "\u00bb", "&frac14;" -> "\u00bc", "&frac12;" -> "\u00bd",
    "&frac34;" -> "\u00be", "&iquest;" -> "\u00bf", "&Agrave;" -> "\u00c0",
    "&Aacute;" -> "\u00c1", "&Acirc;" -> "\u00c2", "&Atilde;" -> "\u00c3",
    "&Auml;" -> "\u00c4", "&Aring;" -> "\u00c5", "&AElig;" -> "\u00c6",
    "&Ccedil;" -> "\u00c7", "&Egrave;" -> "\u00c8", "&Eacute;" -> "\u00c9",
    "&Ecirc;" -> "\u00ca", "&Euml;" -> "\u00cb", "&Igrave;" -> "\u00cc",
    "&Iacute;" -> "\u00cd", "&Icirc;" -> "\u00ce", "&Iuml;" -> "\u00cf",
    "&ETH;" -> "\u00d0", "&Ntilde;" -> "\u00d1", "&Ograve;" -> "\u00d2",
    "&Oacute;" -> "\u00d3", "&Ocirc;" -> "\u00d4", "&Otilde;" -> "\u00d5",
    "&Ouml;" -> "\u00d6", "&times;" -> "\u00d7", "&Oslash;" -> "\u00d8",
    "&Ugrave;;" -> "\u00d9", "&Uacute;" -> "\u00da", "&Ucirc;" -> "\u00db",
    "&Uuml;" -> "\u00dc", "&Yacute;" -> "\u00dd", "&THORN;" -> "\u00de",
    "&szlig;" -> "\u00df", "&agrave;" -> "\u00e0", "&aacute;" -> "\u00e1",
    "&acirc;" -> "\u00e2", "&atilde;" -> "\u00e3", "&auml;" -> "\u00e4",
    "&aring;" -> "\u00e5", "&aelig;" -> "\u00e6", "&ccedil;" -> "\u00e7",
    "&egrave;" -> "\u00e8", "&eacute;" -> "\u00e9", "&ecirc;" -> "\u00ea",
    "&euml;" -> "\u00eb", "&igrave;" -> "\u00ec", "&iacute;" -> "\u00ed",
    "&icirc;" -> "\u00ee", "&iuml;" -> "\u00ef", "&eth;" -> "\u00f0",
    "&ntilde;" -> "\u00f1", "&ograve;" -> "\u00f2", "&oacute;" -> "\u00f3",
    "&ocirc;" -> "\u00f4", "&otilde;" -> "\u00f5", "&ouml;" -> "\u00f6",
    "&divide;" -> "\u00f7", "&oslash;" -> "\u00f8", "&ugrave;" -> "\u00f9",
    "&uacute;" -> "\u00fa", "&ucirc;" -> "\u00fb", "&uuml;" -> "\u00fc",
    "&yacute;" -> "\u00fd", "&thorn;" -> "\u00fe", "&yuml;" -> "\u00ff")

  val html4Unescape: Seq[(String, String)] = Seq(
    "&excl;" -> "!", "&quot;" -> "\"", "&num;" -> "#",
    "&dollar;" -> "$", "&percnt;" -> "%", "&amp;" -> "&",
    "&apos;" -> "'", "&lpar;" -> "(", "&rpar;" -> ")",
    "&ast;" -> "*", "&plus;" -> "+", "&comma;" -> ",",
    "&minus;" -> "-", "&period;" -> ".", "&sol;" -> "/",
    "&colon;" -> ":", "&semi;" -> ";", "&lt;" -> "<",
    "&equals;" -> "=", "&gt;" -> ">", "&quest;" -> "?",
    "&commat;" -> "@", "&lsqb;" -> "[", "&bsol;" -> "\\",
    "&rsqb;" -> "]", "&circ;" -> "^", "&lowbar;" -> "_",
    "&grave;" -> "`", "&lcub;" -> "{", "&verbar;" -> "|",
    "&rcub;" -> "}", "&tilde;" -> "~", "&iexcl;" -> "\u00a1",
    "&cent;" -> "\u00a2", "&pound;" -> "\u00a3", "&curren;" -> "\u00a4",
    "&yen;" -> "\u00a5", "&brkbar;" -> "\u00a6", "&sect;" -> "\u00a7",
    "&uml;" -> "\u00a8", "&copy;" -> "\u00a9", "&ordf;" -> "\u00aa",
    "&laquo;" -> "\u00ab", "&not;" -> "\u00ac", "&reg;" -> "\u00ae",
    "&macr;" -> "\u00af", "&deg;" -> "\u00b0", "&plusmn;" -> "\u00b1",
    "&sup2;" -> "\u00b2", "&sup3;" -> "\u00b3", "&acute;" -> "\u00b4",
    "&micro;" -> "\u00b5", "&para;" -> "\u00b6", "&middot;" -> "\u00b7",
    "&cedil;" -> "\u00b8", "&sup1;" -> "\u00b9", "&ordm;" -> "\u00ba",
    "&raquo;;" -> "\u00bb", "&frac14;" -> "\u00bc", "&frac12;" -> "\u00bd",
    "&frac34;" -> "\u00be", "&iquest;" -> "\u00bf", "&Agrave;" -> "\u00c0",
    "&Aacute;" -> "\u00c1", "&Acirc;" -> "\u00c2", "&Atilde;" -> "\u00c3",
    "&Auml;" -> "\u00c4", "&Aring;" -> "\u00c5", "&AElig;" -> "\u00c6",
    "&Ccedil;" -> "\u00c7", "&Egrave;" -> "\u00c8", "&Eacute;" -> "\u00c9",
    "&Ecirc;" -> "\u00ca", "&Euml;" -> "\u00cb", "&Igrave;" -> "\u00cc",
    "&Iacute;" -> "\u00cd", "&Icirc;" -> "\u00ce", "&Iuml;" -> "\u00cf",
    "&ETH;" -> "\u00d0", "&Ntilde;" -> "\u00d1", "&Ograve;" -> "\u00d2",
    "&Oacute;" -> "\u00d3", "&Ocirc;" -> "\u00d4", "&Otilde;" -> "\u00d5",
    "&Ouml;" -> "\u00d6", "&times;" -> "\u00d7", "&Oslash;" -> "\u00d8",
    "&Ugrave;;" -> "\u00d9", "&Uacute;" -> "\u00da", "&Ucirc;" -> "\u00db",
    "&Uuml;" -> "\u00dc", "&Yacute;" -> "\u00dd", "&THORN;" -> "\u00de",
    "&szlig;" -> "\u00df", "&agrave;" -> "\u00e0", "&aacute;" -> "\u00e1",
    "&acirc;" -> "\u00e2", "&atilde;" -> "\u00e3", "&auml;" -> "\u00e4",
    "&aring;" -> "\u00e5", "&aelig;" -> "\u00e6", "&ccedil;" -> "\u00e7",
    "&egrave;" -> "\u00e8", "&eacute;" -> "\u00e9", "&ecirc;" -> "\u00ea",
    "&euml;" -> "\u00eb", "&igrave;" -> "\u00ec", "&iacute;" -> "\u00ed",
    "&icirc;" -> "\u00ee", "&iuml;" -> "\u00ef", "&eth;" -> "\u00f0",
    "&ntilde;" -> "\u00f1", "&ograve;" -> "\u00f2", "&oacute;" -> "\u00f3",
    "&ocirc;" -> "\u00f4", "&otilde;" -> "\u00f5", "&ouml;" -> "\u00f6",
    "&divide;" -> "\u00f7", "&oslash;" -> "\u00f8", "&ugrave;" -> "\u00f9",
    "&uacute;" -> "\u00fa", "&ucirc;" -> "\u00fb", "&uuml;" -> "\u00fc",
    "&yacute;" -> "\u00fd", "&thorn;" -> "\u00fe", "&yuml;" -> "\u00ff",
    "&fnof;" -> "\u0192", "&Alpha;" -> "\u0391", "&Beta;" -> "\u0392",
    "&Gamma;" -> "\u0393", "&Delta;" -> "\u0394", "&Epsilon;" -> "\u0395",
    "&Zeta;" -> "\u0396", "&Eta;" -> "\u0397", "&Theta;" -> "\u0398",
    "&Iota;" -> "\u0399", "&Kappa;" -> "\u039a", "&Lambda;" -> "\u039b",
    "&Mu;" -> "\u039c", "&Nu;" -> "\u039d", "&Xi;" -> "\u039e",
    "&Omicron;" -> "\u039f", "&Pi;" -> "\u03a0", "&Rho;" -> "\u03a1",
    "&Sigma;" -> "\u03a3", "&Tau;" -> "\u03a4", "&Upsilon;" -> "\u03a5",
    "&Phi;" -> "\u03a6", "&Chi;" -> "\u03a7", "&Psi;" -> "\u03a8",
    "&Omega;" -> "\u03a9", "&alpha;" -> "\u03b1", "&beta;" -> "\u03b2",
    "&gamma;" -> "\u03b3", "&delta;" -> "\u03b4", "&epsilon;" -> "\u03b5",
    "&zeta;" -> "\u03b6", "&eta;" -> "\u03b7", "&theta;" -> "\u03b8",
    "&iota;" -> "\u03b9", "&kappa;" -> "\u03ba", "&lambda;" -> "\u03bb",
    "&mu;" -> "\u03bc", "&nu;" -> "\u03bd", "&xi;" -> "\u03be",
    "&omicron;" -> "\u03bf", "&pi;" -> "\u03c0", "&rho;" -> "\u03c1",
    "&sigmaf;" -> "\u03c2", "&sigma;" -> "\u03c3", "&tau;" -> "\u03c4",
    "&upsilon;" -> "\u03c5", "&phi;" -> "\u03c6", "&chi;" -> "\u03c7",
    "&psi;" -> "\u03c8", "&omega;" -> "\u03c9", "&thetasym;" -> "\u03d1",
    "&upsih;" -> "\u03d2", "&piv;" -> "\u03d6", "&bull;" -> "\u2022",
    "&hellip;" -> "\u2026", "&prime;" -> "\u2032", "&Prime;" -> "\u2033",
    "&oline;" -> "\u203e", "&frasl;" -> "\u2044", "&weierp;" -> "\u2118",
    "&image;" -> "\u2111", "&real;" -> "\u211c", "&trade;" -> "\u2122",
    "&alefsym;" -> "\u2135", "&larr;" -> "\u2190", "&uarr;" -> "\u2191",
    "&rarr;" -> "\u2192", "&darr;" -> "\u2193", "&harr;" -> "\u2194",
    "&crarr;" -> "\u21b5", "&lArr;" -> "\u21d0", "&uArr;" -> "\u21d1",
    "&rArr;" -> "\u21d2", "&dArr;" -> "\u21d3", "&hArr;" -> "\u21d4",
    "&forall;" -> "\u2200", "&part;" -> "\u2202", "&exist;" -> "\u2203",
    "&empty;" -> "\u2205", "&nabla;" -> "\u2207", "&isin;" -> "\u2208",
    "&notin;" -> "\u2209", "&ni;" -> "\u220b", "&prod;" -> "\u220f",
    "&sum;" -> "\u2211", "&lowast;" -> "\u2217", "&radic;" -> "\u221a",
    "&prop;" -> "\u221d", "&infin;" -> "\u221e", "&ang;" -> "\u2220",
    "&and;" -> "\u2227", "&or;" -> "\u2228", "&cap;" -> "\u2229",
    "&cup;" -> "\u222a", "&int;" -> "\u222b", "&there4;" -> "\u2234",
    "&sim;" -> "\u223c", "&cong;" -> "\u2245", "&asymp;" -> "\u2248",
    "&ne;" -> "\u2260", "&equiv;" -> "\u2261", "&le;" -> "\u2264",
    "&ge;" -> "\u2265", "&sub;" -> "\u2282", "&sup;" -> "\u2283",
    "&nsub;" -> "\u2284", "&sube;" -> "\u2286", "&supe;" -> "\u2287",
    "&oplus;" -> "\u2295", "&otimes;" -> "\u2297", "&perp;" -> "\u22a5",
    "&sdot;" -> "\u22c5", "&lceil;" -> "\u2308", "&rceil;" -> "\u2309",
    "&lfloor;" -> "\u230a", "&rfloor;" -> "\u230b", "&lang;" -> "\u2329",
    "&rang;" -> "\u232a", "&loz;" -> "\u25ca", "&spades;" -> "\u2660",
    "&clubs;" -> "\u2663", "&hearts;" -> "\u2665", "&diams;" -> "\u2666",
    "&OElig;" -> "\u0152", "&oelig;" -> "\u0153", "&Scaron;" -> "\u0160",
    "&scaron;" -> "\u0161", "&Yuml;" -> "\u0178", "&ensp;" -> "\u2002",
    "&emsp;" -> "\u2003", "&thinsp;" -> "\u2009", "&zwnj;" -> "\u200c",
    "&zwj;" -> "\u200d", "&lrm;" -> "\u200e", "&rlm;" -> "\u200f",
    "&ndash;" -> "\u2013", "&mdash;" -> "\u2014", "&lsquo;" -> "\u2018",
    "&rsquo;" -> "\u2019", "&sbquo;" -> "\u201a", "&ldquo;" -> "\u201c",
    "&rdquo;" -> "\u201d", "&bdquo;" -> "\u201e", "&dagger;" -> "\u2020",
    "&Dagger;" -> "\u2021", "&permil;" -> "\u2030", "&lsaquo;" -> "\u2039",
    "&rsaquo;" -> "\u203a", "&euro;" -> "\u20ac")

  private def escapeWith(table: Map[Char, String])(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) { // per-char map hit keeps this O(n), no regex
      val c = s.charAt(i)
      table.get(c) match {
        case Some(ent) => sb.append(ent)
        case None      => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def unescapeWith(pattern: java.util.regex.Pattern,
                           table: Map[String, String])(s: String): String = {
    val m = pattern.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start()).append(table(m.group()))
      last = m.end()
    }
    sb.append(s, last, s.length).toString
  }

  private def alternation(keys: Seq[String]): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      keys.sortBy(-_.length).map(java.util.regex.Pattern.quote).mkString("|"))

  private val h3EscMap = html3Escape.map { case (k, v) => k.charAt(0) -> v }.toMap
  private val h4EscMap = html4Escape.map { case (k, v) => k.charAt(0) -> v }.toMap
  private val h3UnescMap = html3Unescape.toMap
  private val h4UnescMap = html4Unescape.toMap
  private val h3UnescPat = alternation(html3Unescape.map(_._1))
  private val h4UnescPat = alternation(html4Unescape.map(_._1))

  val escapeHtml3: String => String = escapeWith(h3EscMap)
  val escapeHtml4: String => String = escapeWith(h4EscMap)
  val unescapeHtml3: String => String = unescapeWith(h3UnescPat, h3UnescMap)
  val unescapeHtml4: String => String = unescapeWith(h4UnescPat, h4UnescMap)

  /** escapeXml/unescapeXml (Expression.cpp:606-612): the 5 XML entities. */
  val xmlEscape: Seq[(String, String)] = Seq(
    "\"" -> "&quot;", "'" -> "&apos;", "<" -> "&lt;", ">" -> "&gt;",
    "&" -> "&amp;")
  private val xmlEscMap = xmlEscape.map { case (k, v) => k.charAt(0) -> v }.toMap
  private val xmlUnescMap = xmlEscape.map(_.swap).toMap
  private val xmlUnescPat = alternation(xmlEscape.map(_._2))
  val escapeXml: String => String = escapeWith(xmlEscMap)
  val unescapeXml: String => String = unescapeWith(xmlUnescPat, xmlUnescMap)
}
