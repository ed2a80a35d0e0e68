package graft

import graft.engine.Engine
import org.apache.spark.sql.Row

/** SPARQL function-library semantics, evaluated end-to-end through the engine on the
  * unit solution (the per-function IVValueExpression test analog).
  */
class ExprSpec extends GraftSuite {

  private def eval1(bindExpr: String): Row = {
    val df = Engine.query(store, s"SELECT ?x WHERE { BIND($bindExpr AS ?x) }")
    val r = df.first()
    if (r.isNullAt(0)) null else r.getStruct(0)
  }
  private def str1(e: String): String = eval1(e).getAs[String]("str")
  private def lng1(e: String): Long = eval1(e).getAs[Long]("lng")
  private def dbl1(e: String): Double = eval1(e).getAs[Double]("num")

  test("string functions") {
    assert(str1("""REPLACE("abcabc", "b", "X")""") == "aXcaXc")
    assert(str1("""STRBEFORE("hello-world", "-")""") == "hello")
    assert(str1("""STRAFTER("hello-world", "-")""") == "world")
    assert(str1("""STRBEFORE("nodash", "-")""") == "")
    assert(str1("""CONCAT("a", "b", "c")""") == "abc")
    // fn:concat argument compatibility: shared lang kept, mixed drops to plain
    assert(eval1("""CONCAT("a"@en, "b"@en)""").getAs[String]("lang") == "en")
    assert(eval1("""CONCAT("a"@en, "b")""").getAs[String]("lang") == null)
    assert(eval1("""CONCAT("a"@en, "b"@de)""").getAs[String]("lang") == null)
    assert(str1("""UCASE(SUBSTR("hello", 2, 3))""") == "ELL")
    assert(lng1("""STRLEN("héllo")""") == 5L)
    assert(str1("""ENCODE_FOR_URI("a b/c")""") == "a%20b%2Fc")
    assert(str1("""MD5("abc")""") == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("boolean / conditional") {
    assert(str1("""IF(1 < 2, "yes", "no")""") == "yes")
    assert(str1("""COALESCE(?unbound, "fallback")""") == "fallback")
    assert(str1("""IF(LANGMATCHES(LANG("chat"@fr), "FR"), "m", "n")""") == "m")
    assert(str1("""IF("x" IN ("x", "y"), "in", "out")""") == "in")
    assert(str1("""IF(sameTerm(5, 5), "same", "diff")""") == "same")
    // type error in IF condition → whole expression errors → unbound
    assert(eval1("""IF(<urn:x> > 3, "a", "b")""") == null)
  }

  test("numeric promotion and errors") {
    assert(lng1("2 + 3") == 5L)
    assert(eval1("2 + 3").getAs[String]("dt").endsWith("integer"))
    assert(dbl1("2 + 3.5") == 5.5)
    assert(dbl1("7 / 2") == 3.5) // int/int → non-integer division
    assert(dbl1("ABS(-4.25)") == 4.25)
    assert(lng1("FLOOR(3.9)") == 3L || dbl1("FLOOR(3.9)") == 3.0)
    assert(eval1("""5 + "abc"""") == null) // type error → unbound
    assert(eval1("5 / 0") == null) // division by zero → error
  }

  test("exact decimal arithmetic") {
    // xsd:decimal computes exactly (BigDecimal promotion, MathUtility analog):
    // 0.1 + 0.2 is EXACTLY 0.3 — the double path would give 0.30000000000000004
    assert(str1("0.1 + 0.2") == "0.3")
    assert(eval1("0.1 + 0.2").getAs[String]("dt").endsWith("decimal"))
    // integer + decimal promotes to decimal; canonical form trims trailing zeros
    assert(str1("1 + 0.50") == "1.5")
    assert(eval1("1 + 0.5").getAs[String]("dt").endsWith("decimal"))
    // int/int division is xsd:decimal per XPath op:numeric-divide
    assert(eval1("7 / 2").getAs[String]("dt").endsWith("decimal"))
    assert(str1("7 / 2") == "3.5")
    // any float-family operand demotes to double
    assert(eval1("0.1e0 + 0.2").getAs[String]("dt").endsWith("double"))
    // exact compare beyond double precision: 2^53 and 2^53+1 are distinct decimals
    assert(str1("""IF(9007199254740993.0 = 9007199254740992.0, "eq", "ne")""") == "ne")
    assert(str1("""IF(9007199254740993.0 > 9007199254740992.0, "gt", "le")""") == "gt")
    // exact integer compare (would collide through double)
    assert(str1("""IF(9007199254740993 != 9007199254740992, "ne", "eq")""") == "ne")
    // decimal ÷ 0 is a type error, not INF
    assert(eval1("1.5 / 0.0") == null)
    assert(str1("ABS(-4.25)") == "4.25")
    assert(str1("FLOOR(3.9)") == "3")
    assert(str1("CEIL(3.1)") == "4")
    assert(str1("-(2.5)") == "-2.5")
    // xsd:decimal cast parses strings exactly
    assert(str1("""<http://www.w3.org/2001/XMLSchema#decimal>("0.30000000000000004")""")
      == "0.30000000000000004")
  }

  test("casts") {
    assert(lng1("""<http://www.w3.org/2001/XMLSchema#integer>("42")""") == 42L)
    assert(dbl1("""<http://www.w3.org/2001/XMLSchema#double>("4.5")""") == 4.5)
    assert(eval1("""<http://www.w3.org/2001/XMLSchema#integer>("nope")""") == null)
    assert(str1("""STR(42)""") == "42")
    assert(str1("""STRDT("7", <http://www.w3.org/2001/XMLSchema#integer>)""") == "7")
    assert(lng1("""STRDT("7", <http://www.w3.org/2001/XMLSchema#integer>)""") == 7L)
  }

  test("term inspection") {
    // SPARQL 1.1 §19.8: dot-no-exponent literals are xsd:decimal, exponent = double
    assert(str1("""DATATYPE(3.5)""").endsWith("decimal"))
    assert(str1("""DATATYPE(3.5e0)""").endsWith("double"))
    assert(str1("""DATATYPE("plain")""").endsWith("string"))
    assert(str1("""LANG("chat"@fr)""") == "fr")
    assert(str1("""IF(isIRI(<urn:a>), "iri", "no")""") == "iri")
    assert(str1("""IF(isNumeric(5), "n", "no")""") == "n")
    assert(str1("""IF(isLiteral("x"), "lit", "no")""") == "lit")
    assert(str1("""IF(BOUND(?nope), "b", "ub")""") == "ub")
  }

  test("datetime functions") {
    assert(lng1("""YEAR("2024-03-05T10:20:30Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""") == 2024L)
    assert(lng1("""MONTH("2024-03-05T10:20:30Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""") == 3L)
    assert(str1("""SECONDS("2024-03-05T10:20:30Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""") == "30")
    // explicit ±hh:mm offsets parse and normalize to the UTC instant (a bare
    // contains("+") zone test once missed negative offsets and crashed)
    assert(lng1("""HOURS("2011-01-10T14:45:13.815-05:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""") == 19L)
    assert(lng1("""HOURS("2011-01-10T14:45:13+02:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""") == 12L)
  }

  test("hash functions") {
    assert(str1("""MD5("abc")""") == "900150983cd24fb0d6963f7d28e17f72")
    assert(str1("""SHA1("abc")""") == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(str1("""SHA224("abc")""") ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(str1("""SHA256("abc")""") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("TZ and TIMEZONE over UTC-normalized datetimes") {
    val dt = """"2024-03-05T10:20:30Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>"""
    assert(str1(s"TZ($dt)") == "Z")
    val t = eval1(s"TIMEZONE($dt)")
    assert(t.getAs[String]("str") == "PT0S")
    assert(t.getAs[String]("dt") == "http://www.w3.org/2001/XMLSchema#dayTimeDuration")
    // non-datetime argument: type error → unbound
    assert(eval1("""TIMEZONE("abc")""") == null)
  }

  test("fn argument compatibility and simple-literal guards (§17.4.3.1.1)") {
    // second arg's lang must match the first's; (simple, lang) is also an error
    assert(str1("""STRBEFORE("abc"@en, "b")""") == "a")
    assert(eval1("""STRBEFORE("abc"@en, "b")""").getAs[String]("lang") == "en")
    assert(eval1("""STRAFTER("abc"@en, "b"@cy)""") == null)
    assert(eval1("""STRSTARTS("foo"@en, "f"@cy)""") == null)
    assert(eval1("""CONTAINS("foo", "o"@en)""") == null)
    // no-match yields the SIMPLE empty literal even for lang-tagged input;
    // empty-pattern match keeps the input's lang
    val noMatch = eval1("""STRBEFORE("abc"@en, "xyz")""")
    assert(noMatch.getAs[String]("str") == "" && noMatch.getAs[String]("lang") == null)
    val emptyPat = eval1("""STRAFTER("abc"@en, ""@en)""")
    assert(emptyPat.getAs[String]("str") == "abc" && emptyPat.getAs[String]("lang") == "en")
    // STRDT/STRLANG require a simple literal
    assert(eval1("""STRDT("x"@en, <http://www.w3.org/2001/XMLSchema#string>)""") == null)
    assert(eval1("""STRLANG("x"@en, "de")""") == null)
    assert(str1("""STRDT("5", <http://www.w3.org/2001/XMLSchema#integer>)""") == "5")
  }

  test("SECONDS returns xsd:decimal with the fractional part") {
    val r = eval1("""SECONDS("2024-01-01T01:02:03.5Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""")
    assert(r.getAs[String]("str") == "3.5")
    assert(r.getAs[String]("dt").endsWith("decimal"))
    assert(str1("""SECONDS("2024-01-01T01:02:03Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)""") == "3")
  }

  test("comparison edge semantics") {
    // numeric cross-type comparison
    assert(str1("""IF(2 < 2.5, "y", "n")""") == "y")
    // string vs number: type error, not false → IF errors → unbound
    assert(eval1("""IF("2" < 3, "y", "n")""") == null)
    // dateTime comparison
    assert(str1("""IF("2020-01-01T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> <
      "2021-01-01T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>, "y", "n")""") == "y")
    // boolean EBV of plain strings
    assert(str1("""IF("nonempty", "t", "f")""") == "t")
    assert(str1("""IF("", "t", "f")""") == "f")
  }
}
