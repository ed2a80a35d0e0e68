package graft.engine

import graft.model.Term
import org.apache.spark.sql.{DataFrame, Row}

/** SPARQL query-result serializers (the openrdf `resultio` writer analog used from
  * `sail/webapp/QueryServlet.java:635`): SPARQL 1.1 JSON/XML/CSV/TSV over a solutions
  * DataFrame of term-struct columns. Serialization is terminal (driver-side iterator);
  * the heavy lifting stayed distributed.
  */
object SparqlResults {

  private def rdfTerm(r: Row): Option[(String, String, Option[String], Option[String])] =
    if (r == null) None
    else Some((r.getAs[Byte]("kind") match {
      case Term.KIND_IRI => "uri"
      case Term.KIND_BNODE => "bnode"
      case _ => "literal"
    }, r.getAs[String]("str"), Option(r.getAs[String]("dt")), Option(r.getAs[String]("lang"))))

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** True when the frame is an ASK result (single boolean column). */
  private def askValue(df: DataFrame): Option[Boolean] =
    if (df.schema.length == 1 &&
      df.schema.head.dataType == org.apache.spark.sql.types.BooleanType)
      Some(df.first().getBoolean(0))
    else None

  /** application/sparql-results+json */
  def toJson(df: DataFrame): String = {
    askValue(df).foreach { b => return s"""{"head":{},"boolean":$b}""" }
    val vars = df.columns
    val sb = new StringBuilder
    sb ++= """{"head":{"vars":["""
    sb ++= vars.map(v => "\"" + jsonEscape(v) + "\"").mkString(",")
    sb ++= """]},"results":{"bindings":["""
    var firstRow = true
    df.toLocalIterator().forEachRemaining { row =>
      if (!firstRow) sb += ','
      firstRow = false
      sb += '{'
      var first = true
      vars.zipWithIndex.foreach { case (v, i) =>
        rdfTerm(if (row.isNullAt(i)) null else row.getStruct(i)).foreach {
          case (typ, value, dt, lang) =>
            if (!first) sb += ','
            first = false
            sb ++= s""""${jsonEscape(v)}":{"type":"$typ","value":"${jsonEscape(value)}""""
            dt.foreach(d => sb ++= s""","datatype":"${jsonEscape(d)}"""")
            lang.foreach(l => sb ++= s""","xml:lang":"${jsonEscape(l)}"""")
            sb += '}'
        }
      }
      sb += '}'
    }
    sb ++= "]}}"
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** application/sparql-results+xml */
  def toXml(df: DataFrame): String = {
    askValue(df).foreach { b =>
      return s"""<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#"><head/><boolean>$b</boolean></sparql>"""
    }
    val vars = df.columns
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#"><head>"""
    vars.foreach(v => sb ++= s"""<variable name="${xmlEscape(v)}"/>""")
    sb ++= "</head><results>"
    df.toLocalIterator().forEachRemaining { row =>
      sb ++= "<result>"
      vars.zipWithIndex.foreach { case (v, i) =>
        rdfTerm(if (row.isNullAt(i)) null else row.getStruct(i)).foreach {
          case (typ, value, dt, lang) =>
            sb ++= s"""<binding name="${xmlEscape(v)}">"""
            typ match {
              case "uri" => sb ++= s"<uri>${xmlEscape(value)}</uri>"
              case "bnode" => sb ++= s"<bnode>${xmlEscape(value)}</bnode>"
              case _ =>
                sb ++= "<literal"
                dt.foreach(d => sb ++= s""" datatype="${xmlEscape(d)}"""")
                lang.foreach(l => sb ++= s""" xml:lang="${xmlEscape(l)}"""")
                sb ++= s">${xmlEscape(value)}</literal>"
            }
            sb ++= "</binding>"
        }
      }
      sb ++= "</result>"
    }
    sb ++= "</results></sparql>"
    sb.toString
  }

  /** text/csv (SPARQL 1.1 CSV results: lexical forms, quoted when needed). */
  def toCsv(df: DataFrame): String = {
    askValue(df).foreach { b => return s"ask\n$b\n" }
    val vars = df.columns
    def cell(s: String): String =
      if (s == null) ""
      else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val sb = new StringBuilder
    sb ++= vars.mkString(",") += '\n'
    df.toLocalIterator().forEachRemaining { row =>
      sb ++= vars.indices.map(i =>
        cell(if (row.isNullAt(i)) null else row.getStruct(i).getAs[String]("str")))
        .mkString(",") += '\n'
    }
    sb.toString
  }

  /** text/tab-separated-values (terms in N-Triples syntax). */
  def toTsv(df: DataFrame): String = {
    askValue(df).foreach { b => return s"?ask\n$b\n" }
    val vars = df.columns
    def tok(r: Row): String =
      if (r == null) ""
      else r.getAs[Byte]("kind") match {
        case Term.KIND_IRI => "<" + r.getAs[String]("str") + ">"
        case Term.KIND_BNODE => "_:" + r.getAs[String]("str")
        case _ =>
          val lex = "\"" + r.getAs[String]("str").replace("\\", "\\\\")
            .replace("\"", "\\\"").replace("\n", "\\n") + "\""
          val dt = r.getAs[String]("dt")
          val lang = r.getAs[String]("lang")
          if (lang != null) lex + "@" + lang
          else if (dt != null) lex + "^^<" + dt + ">"
          else lex
      }
    val sb = new StringBuilder
    sb ++= vars.map("?" + _).mkString("\t") += '\n'
    df.toLocalIterator().forEachRemaining { row =>
      sb ++= vars.indices.map(i =>
        tok(if (row.isNullAt(i)) null else row.getStruct(i))).mkString("\t") += '\n'
    }
    sb.toString
  }
}
