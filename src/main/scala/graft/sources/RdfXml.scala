package graft.sources

import graft.model.Term
import graft.sparql.Parser
import scala.collection.mutable.ArrayBuffer

/** RDF/XML parser (the `rdf/rio/rdfxml/` analog, re-expressed over the JDK's StAX
  * pull parser instead of a hand-rolled SAX stack).
  *
  * Covers the RDF/XML Syntax Specification's core productions: rdf:RDF roots, node
  * elements (rdf:Description and typed nodes), rdf:about / rdf:ID / rdf:nodeID,
  * property elements with rdf:resource / rdf:nodeID / rdf:datatype / nested node
  * elements, property attributes (abbreviated syntax), rdf:parseType =
  * "Resource" | "Literal" | "Collection", rdf:li container items, xml:lang and
  * xml:base inheritance, and property-element reification via rdf:ID.
  *
  * RDF/XML is not line-splittable, so the distributed shape is one parse task per
  * FILE (`readFiles`): a 100 TB LOD dump is thousands of dump files, which is
  * exactly the parallelism a whole-file reader needs. The term encode stays
  * columnar and identical to every other ingestion path.
  */
object RdfXml {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XML_NS = "http://www.w3.org/XML/1998/namespace"
  /** Syntax-only rdf: attributes (never property attributes). */
  private val syntaxAttrs = Set("about", "ID", "nodeID", "resource", "datatype",
    "parseType", "RDF", "Description", "li", "aboutEach", "aboutEachPrefix", "bagID")

  private final class Ctx {
    val out = ArrayBuffer.empty[Rio.ParsedQuad]
    var bn = 0
    val nodeIds = scala.collection.mutable.Map.empty[String, String]
    var liCounter = List.empty[Int] // per-node-element rdf:li counter stack
    def freshBnode(): String = { bn += 1; s"rx$bn" }
    def labeled(l: String): String = nodeIds.getOrElseUpdate(l, { bn += 1; s"rxl$bn-$l" })
  }

  private def resolve(base: String, ref: String): String = {
    if (ref.isEmpty) return base
    try {
      val r = new java.net.URI(ref)
      if (r.isAbsolute || base.isEmpty) ref
      else new java.net.URI(base).resolve(r).toString
    } catch { case _: Exception => ref }
  }

  /** Parse one RDF/XML document into flat quads (default graph). */
  def parse(xml: String, baseUri: String = ""): Seq[Rio.ParsedQuad] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", java.lang.Boolean.FALSE)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val ctx = new Ctx
    // advance to the document element
    while (r.hasNext && r.getEventType != javax.xml.stream.XMLStreamConstants.START_ELEMENT) r.next()
    if (r.getEventType == javax.xml.stream.XMLStreamConstants.START_ELEMENT) {
      val base = Option(attr(r, XML_NS, "base")).getOrElse(baseUri)
      if (r.getNamespaceURI == RDF && r.getLocalName == "RDF") {
        val lang = Option(attr(r, XML_NS, "lang")).orNull
        var ev = r.next()
        while (ev != javax.xml.stream.XMLStreamConstants.END_ELEMENT) {
          if (ev == javax.xml.stream.XMLStreamConstants.START_ELEMENT)
            nodeElement(r, ctx, base, lang)
          ev = r.next()
        }
      } else nodeElement(r, ctx, base, null)
    }
    ctx.out.toSeq
  }

  private def attr(r: javax.xml.stream.XMLStreamReader, ns: String, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local && r.getAttributeNamespace(i) == ns)
        return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  private def emit(ctx: Ctx, sKind: Byte, s: String, p: String,
                   oKind: Byte, o: String, dt: String, lang: String): Unit = {
    val c = if (dt != null) Parser.canonicalLit(o, Some(dt), None)
            else graft.sparql.Ast.LitNode(o, None, Option(lang))
    ctx.out += Rio.ParsedQuad(sKind, s, p, oKind,
      if (oKind == Term.KIND_LITERAL) c.lex else o,
      if (oKind == Term.KIND_LITERAL) c.dt.orNull else null,
      if (oKind == Term.KIND_LITERAL) c.lang.orNull else null,
      Term.KIND_IRI, null)
  }

  /** Parse a node element; cursor ON its START_ELEMENT, leaves cursor on its
    * END_ELEMENT. Returns (kind, id) of the subject.
    */
  private def nodeElement(r: javax.xml.stream.XMLStreamReader, ctx: Ctx,
                          base0: String, lang0: String): (Byte, String) = {
    import javax.xml.stream.XMLStreamConstants._
    val base = Option(attr(r, XML_NS, "base")).map(resolve(base0, _)).getOrElse(base0)
    val lang = Option(attr(r, XML_NS, "lang")).getOrElse(lang0)
    val about = attr(r, RDF, "about")
    val id = attr(r, RDF, "ID")
    val nodeId = attr(r, RDF, "nodeID")
    val (sKind, subj): (Byte, String) =
      if (about != null) (Term.KIND_IRI, resolve(base, about))
      else if (id != null) (Term.KIND_IRI, resolve(base, "#" + id))
      else if (nodeId != null) (Term.KIND_BNODE, ctx.labeled(nodeId))
      else (Term.KIND_BNODE, ctx.freshBnode())
    // typed node element => rdf:type triple
    if (!(r.getNamespaceURI == RDF && r.getLocalName == "Description"))
      emit(ctx, sKind, subj, RDF + "type", Term.KIND_IRI,
        r.getNamespaceURI + r.getLocalName, null, null)
    // property attributes
    var i = 0
    while (i < r.getAttributeCount) {
      val ns = r.getAttributeNamespace(i)
      val ln = r.getAttributeLocalName(i)
      if (ns == RDF && ln == "type")
        emit(ctx, sKind, subj, RDF + "type", Term.KIND_IRI,
          resolve(base, r.getAttributeValue(i)), null, null)
      else if (ns != null && ns != XML_NS && !(ns == RDF && syntaxAttrs(ln)))
        emit(ctx, sKind, subj, ns + ln, Term.KIND_LITERAL, r.getAttributeValue(i), null, lang)
      i += 1
    }
    ctx.liCounter ::= 0
    var ev = r.next()
    while (ev != END_ELEMENT) {
      if (ev == START_ELEMENT) propertyElement(r, ctx, sKind, subj, base, lang)
      ev = r.next()
    }
    ctx.liCounter = ctx.liCounter.tail
    (sKind, subj)
  }

  /** Parse a property element of `subj`; cursor ON its START_ELEMENT, leaves cursor
    * on its END_ELEMENT.
    */
  private def propertyElement(r: javax.xml.stream.XMLStreamReader, ctx: Ctx,
                              sKind: Byte, subj: String,
                              base0: String, lang0: String): Unit = {
    import javax.xml.stream.XMLStreamConstants._
    val base = Option(attr(r, XML_NS, "base")).map(resolve(base0, _)).getOrElse(base0)
    val lang = Option(attr(r, XML_NS, "lang")).getOrElse(lang0)
    val prop =
      if (r.getNamespaceURI == RDF && r.getLocalName == "li") {
        val n = ctx.liCounter.head + 1
        ctx.liCounter = n :: ctx.liCounter.tail
        RDF + "_" + n
      } else r.getNamespaceURI + r.getLocalName
    val reifyId = attr(r, RDF, "ID")
    val resource = attr(r, RDF, "resource")
    val nodeId = attr(r, RDF, "nodeID")
    val datatype = attr(r, RDF, "datatype")
    val parseType = attr(r, RDF, "parseType")
    // property attributes on the property element (abbreviated bnode object)
    val propAttrs = (0 until r.getAttributeCount).flatMap { i =>
      val ns = r.getAttributeNamespace(i)
      val ln = r.getAttributeLocalName(i)
      if (ns != null && ns != XML_NS && !(ns == RDF && syntaxAttrs(ln)))
        Some((ns + ln, r.getAttributeValue(i)))
      else None
    }

    def reify(oKind: Byte, o: String, dt: String, olang: String): Unit =
      if (reifyId != null) {
        val st = resolve(base, "#" + reifyId)
        emit(ctx, Term.KIND_IRI, st, RDF + "type", Term.KIND_IRI, RDF + "Statement", null, null)
        emit(ctx, Term.KIND_IRI, st, RDF + "subject", sKind, subj, null, null)
        emit(ctx, Term.KIND_IRI, st, RDF + "predicate", Term.KIND_IRI, prop, null, null)
        emit(ctx, Term.KIND_IRI, st, RDF + "object", oKind, o, dt, olang)
      }
    def emitO(oKind: Byte, o: String, dt: String, olang: String): Unit = {
      emit(ctx, sKind, subj, prop, oKind, o, dt, olang)
      reify(oKind, o, dt, olang)
    }

    if (parseType == "Resource") {
      // anonymous bnode whose children are property elements
      val b = ctx.freshBnode()
      emitO(Term.KIND_BNODE, b, null, null)
      var ev = r.next()
      while (ev != END_ELEMENT) {
        if (ev == START_ELEMENT) propertyElement(r, ctx, Term.KIND_BNODE, b, base, lang)
        ev = r.next()
      }
    } else if (parseType == "Literal") {
      // capture raw inner XML as an rdf:XMLLiteral
      val sb = new StringBuilder
      var depth = 0
      var ev = r.next()
      while (!(ev == END_ELEMENT && depth == 0)) {
        ev match {
          case START_ELEMENT =>
            sb.append('<').append(r.getLocalName)
            (0 until r.getAttributeCount).foreach(i =>
              sb.append(' ').append(r.getAttributeLocalName(i))
                .append("=\"").append(r.getAttributeValue(i)).append('"'))
            sb.append('>'); depth += 1
          case END_ELEMENT => sb.append("</").append(r.getLocalName).append('>'); depth -= 1
          case CHARACTERS | CDATA => sb.append(r.getText)
          case _ => ()
        }
        ev = r.next()
      }
      emitO(Term.KIND_LITERAL, sb.toString, RDF + "XMLLiteral", null)
    } else if (parseType == "Collection") {
      // children node elements chained as an rdf:List
      var cells = List.empty[(String, (Byte, String))]
      var ev = r.next()
      while (ev != END_ELEMENT) {
        if (ev == START_ELEMENT) cells ::= (ctx.freshBnode(), nodeElement(r, ctx, base, lang))
        ev = r.next()
      }
      cells = cells.reverse
      if (cells.isEmpty) emitO(Term.KIND_IRI, RDF + "nil", null, null)
      else {
        emitO(Term.KIND_BNODE, cells.head._1, null, null)
        cells.zipWithIndex.foreach { case ((cell, item), idx) =>
          emit(ctx, Term.KIND_BNODE, cell, RDF + "first", item._1, item._2, null, null)
          if (idx < cells.size - 1)
            emit(ctx, Term.KIND_BNODE, cell, RDF + "rest", Term.KIND_BNODE, cells(idx + 1)._1, null, null)
          else emit(ctx, Term.KIND_BNODE, cell, RDF + "rest", Term.KIND_IRI, RDF + "nil", null, null)
        }
      }
    } else if (resource != null) {
      emitO(Term.KIND_IRI, resolve(base, resource), null, null)
      skipToEnd(r)
    } else if (nodeId != null) {
      emitO(Term.KIND_BNODE, ctx.labeled(nodeId), null, null)
      skipToEnd(r)
    } else if (propAttrs.nonEmpty) {
      val b = ctx.freshBnode()
      emitO(Term.KIND_BNODE, b, null, null)
      propAttrs.foreach { case (p, v) =>
        emit(ctx, Term.KIND_BNODE, b, p, Term.KIND_LITERAL, v, null, lang) }
      skipToEnd(r)
    } else {
      // text literal or nested node element
      val sb = new StringBuilder
      var obj: Option[(Byte, String)] = None
      var ev = r.next()
      while (ev != END_ELEMENT) {
        ev match {
          case START_ELEMENT => obj = Some(nodeElement(r, ctx, base, lang))
          case CHARACTERS | CDATA => sb.append(r.getText)
          case _ => ()
        }
        ev = r.next()
      }
      obj match {
        case Some((k, o)) => emitO(k, o, null, null)
        case None => emitO(Term.KIND_LITERAL, sb.toString, datatype, if (datatype == null) lang else null)
      }
    }
  }

  private def skipToEnd(r: javax.xml.stream.XMLStreamReader): Unit = {
    import javax.xml.stream.XMLStreamConstants._
    var depth = 0
    var ev = r.next()
    while (!(ev == END_ELEMENT && depth == 0)) {
      if (ev == START_ELEMENT) depth += 1
      if (ev == END_ELEMENT) depth -= 1
      ev = r.next()
    }
  }
}
