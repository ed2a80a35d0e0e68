package graft.tck

import java.io.File

/** SPARQL Query Results XML (SRX) reader for the conformance sweep — parses the
  * reference corpus's expected-result files into variable lists + solution multisets
  * with the same canonical literal tokens `RefTck.termToken` produces.
  */
object Srx {

  sealed trait Result
  final case class BooleanResult(value: Boolean) extends Result
  /** vars in head order; each row maps var → canonical token (absent = unbound). */
  final case class Solutions(vars: Seq[String], rows: Seq[Map[String, String]]) extends Result

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  def parse(f: File): Result = parseXml(scala.xml.XML.loadFile(f))

  /** Parse from in-memory XML text (the federation sweep rewrites endpoint
    * aliases in the expected files before parsing). */
  def parseString(xml: String): Result = parseXml(scala.xml.XML.loadString(xml))

  private def parseXml(root: scala.xml.Elem): Result = {
    val bool = (root \ "boolean").headOption
    bool match {
      case Some(b) => BooleanResult(b.text.trim.toBoolean)
      case None =>
        // a few reference files write head names as "?x" — strip the marker
        val headVars = (root \ "head" \ "variable").map(v => (v \@ "name").stripPrefix("?"))
        val rows = (root \ "results" \ "result").map { r =>
          (r \ "binding").map { b =>
            val name = (b \@ "name").stripPrefix("?")
            name -> bindingToken(b)
          }.toMap
        }
        // several files have stale heads that omit vars the rows bind
        // (optionals_simplest's `d`) — the union is the effective projection
        val vars = (headVars ++ rows.flatMap(_.keys)).distinct
        Solutions(vars, rows)
    }
  }

  private def bindingToken(b: scala.xml.Node): String = {
    val uri = (b \ "uri").headOption
    val bnode = (b \ "bnode").headOption
    val lit = (b \ "literal").headOption
    (uri, bnode, lit) match {
      case (Some(u), _, _) => "<" + u.text + ">"
      case (_, Some(n), _) => "_:" + n.text
      case (_, _, Some(l)) =>
        val dt = Option(l \@ "datatype").filter(_.nonEmpty).orNull
        val lang = l.attributes.collectFirst {
          case a: scala.xml.PrefixedAttribute if a.key == "lang" => a.value.text
        }.orNull
        canonLiteral(l.text, dt, lang)
      case _ => null
    }
  }

  /** Canonical literal token with value normalization: numerics compare by value
    * (BigDecimal; doubles by double value), dateTimes by UTC instant with the
    * XSD-canonical fractional-second trim, xsd:string folds to a plain literal,
    * booleans canonicalize "1"/"0". Both the expected side and the engine side
    * run through this one function.
    */
  def canonLiteral(lex0: String, dt0: String, lang: String): String = {
    var lex = lex0
    var dt = if (dt0 == Xsd + "string") null else dt0
    if (lang != null) return "\"" + lex + "\"@" + lang.toLowerCase
    dt match {
      case null => "\"" + lex + "\""
      case d if d == Xsd + "integer" || d == Xsd + "int" || d == Xsd + "long" ||
        d == Xsd + "short" || d == Xsd + "byte" || d == Xsd + "nonNegativeInteger" ||
        d == Xsd + "positiveInteger" || d == Xsd + "unsignedInt" || d == Xsd + "unsignedLong" ||
        d == Xsd + "unsignedShort" || d == Xsd + "unsignedByte" ||
        d == Xsd + "nonPositiveInteger" || d == Xsd + "negativeInteger" =>
        val v = try new java.math.BigDecimal(lex.trim).toBigInteger.toString
        catch { case _: NumberFormatException => lex }
        "\"" + v + "\"^^<" + Xsd + "integer>"
      case d if d == Xsd + "decimal" =>
        val v = try new java.math.BigDecimal(lex.trim).stripTrailingZeros.toPlainString
        catch { case _: NumberFormatException => lex }
        "\"" + v + "\"^^<" + d + ">"
      case d if d == Xsd + "double" || d == Xsd + "float" =>
        val v = try lex.trim.toDouble.toString catch { case _: NumberFormatException => lex }
        "\"" + v + "\"^^<" + Xsd + "double>"
      case d if d == Xsd + "boolean" =>
        val v = lex.trim match { case "1" => "true"; case "0" => "false"; case x => x }
        "\"" + v + "\"^^<" + d + ">"
      case d if d == Xsd + "dateTime" =>
        val v = try {
          val ts = java.time.OffsetDateTime.parse(
            if (lex.matches(".*([Zz]|[+-]\\d{2}:\\d{2})$")) lex else lex + "Z")
            .toInstant
          // match Term.tsLit's canonical form: UTC, fractional seconds trimmed
          val s = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS").withZone(java.time.ZoneOffset.UTC)
            .format(ts)
          s.replaceAll("\\.?0+$", "") + "Z"
        } catch { case _: java.time.format.DateTimeParseException => lex }
        "\"" + v + "\"^^<" + d + ">"
      case d => "\"" + lex + "\"^^<" + d + ">"
    }
  }
}
