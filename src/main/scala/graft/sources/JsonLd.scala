package graft.sources

import graft.model.Term
import graft.sparql.Parser
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import scala.collection.mutable.ArrayBuffer

/** JSON-LD loader (the openrdf-RIO JSON-LD analog) — a documented practical subset,
  * not a full 1.1 processor:
  *
  *   - `@context`: term → IRI strings, prefix definitions (used by `pfx:rest`
  *     compaction), expanded definitions `{"@id": …, "@type": "@id" | <dt-iri>}`
  *     (IRI / datatype coercion), and `@vocab`.
  *   - node objects: `@id` (IRI or `_:` bnode; absent → fresh bnode), `@type`
  *     (string or array), property values as primitives (JSON string/number/bool →
  *     plain / xsd:integer / xsd:double / xsd:boolean literals), value objects
  *     (`@value` + `@type`/`@language`), node references (`{"@id": …}`), nested
  *     node objects, arrays (multi-valued), and `@list` (rdf:List chains).
  *   - top level: a node object, an array of them, or `@graph` (named when the
  *     carrier has `@id`, else default graph).
  *   - 1.1: `@included` (secondary node objects carried alongside a node, same
  *     graph, no connecting edge), `@nest` (property grouping — nested map's
  *     properties belong to the enclosing node; context terms may alias `@nest`),
  *     `@json` literals (`@type: @json` on a value object or via context
  *     coercion → an rdf:JSON literal with a canonical key-sorted serialization),
  *     and `@direction` (value-object member or context default): direction-
  *     tagged strings serialize as i18n-datatype literals
  *     (`"text"^^<https://www.w3.org/ns/i18n#lang_dir>` — the rdfDirection=
  *     i18n-datatype mode, the round-trippable RDF representation).
  *
  *   - 1.1 scoped contexts: embedded `@context` on nested node objects,
  *     property-scoped contexts (expanded term definition `@context`), and
  *     type-scoped contexts (applied to the node carrying the `@type`,
  *     reverting for child node objects — §4.1.8), with explicit `@propagate`
  *     control (§4.1.9): `false` scopes any context to the node(s) it lands
  *     on, `true` lets a type-scoped context propagate.
  *
  * The remaining unsupported 1.1 feature (remote contexts — the sandbox has no
  * egress) fails loudly rather than silently mis-parsing.
  */
object JsonLd {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** Local CONTEXT RESOLVER registry (URI → context document JSON): remote
    * contexts resolve from documents the caller preloaded — the zero-egress
    * analog of a JSON-LD document loader (callers typically ship the handful
    * of well-known contexts they use alongside the job). An unregistered URI
    * keeps the loud rejection. The registered document may be either a bare
    * context object or a full JSON-LD document with an `"@context"` member.
    */
  private val contextRegistry =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def registerContext(uri: String, doc: String): Unit = contextRegistry(uri) = doc
  def unregisterContext(uri: String): Unit = contextRegistry.remove(uri)

  // cycle guard for registry documents that reference each other
  private val resolving = new scala.util.DynamicVariable(Set.empty[String])

  /** Document-global generation state, shared across context branches. */
  private final class Gen {
    val out = ArrayBuffer.empty[Rio.ParsedQuad]
    var bn = 0
    val labeled = scala.collection.mutable.Map.empty[String, String]
  }

  private final class Ctx(val gen: Gen = new Gen) {
    def out: ArrayBuffer[Rio.ParsedQuad] = gen.out
    var terms = Map.empty[String, (String, Option[String])] // term -> (iri, coercion)
    var nestAliases = Set.empty[String] // context terms defined as "@nest"
    var reverseTerms = Set.empty[String] // context terms defined via "@reverse"
    var containers = Map.empty[String, Seq[String]] // term → @container keywords
    var scopedCtx = Map.empty[String, JsonNode] // term → scoped @context node
    var vocab: Option[String] = None
    var defaultDirection: Option[String] = None // context @direction ("ltr"/"rtl")
    /** Set on a non-propagating branch: node objects entered with this context
      * revert to it once `revertDepth` reaches 0 (type-scoped contexts do not
      * propagate by default — JSON-LD 1.1 §4.1.8 — and any context can opt out
      * with `@propagate: false` — §4.1.9). Depth 0 reverts at the NEXT node-
      * object entry (type-scoped / embedded); depth 1 survives the immediate
      * value node and reverts beneath it (property-scoped `@propagate: false`,
      * which still applies to the entry's own values).
      */
    var revertTo: Option[Ctx] = None
    var revertDepth: Int = 0
    def freshBnode(): String = { gen.bn += 1; s"jb${gen.bn}" }
    def bnode(label: String): String =
      gen.labeled.getOrElseUpdate(label, { gen.bn += 1; s"jbl${gen.bn}-${label.stripPrefix("_:")}" })

    /** Copy of the ACTIVE CONTEXT sharing the document generation state —
      * scoped/embedded contexts modify the copy so siblings are unaffected
      * (JSON-LD 1.1 context-propagation model).
      */
    def branch: Ctx = {
      val c = new Ctx(gen)
      c.terms = terms; c.nestAliases = nestAliases; c.reverseTerms = reverseTerms
      c.containers = containers; c.scopedCtx = scopedCtx
      c.vocab = vocab; c.defaultDirection = defaultDirection
      c
    }
  }

  private def unsupported(what: String): Nothing =
    throw new IllegalArgumentException(s"JSON-LD subset: unsupported $what")

  /** Parse one JSON-LD document (string) into flat quads. */
  def parse(json: String): Seq[Rio.ParsedQuad] = {
    val root = new ObjectMapper().readTree(json)
    val ctx = new Ctx
    top(root, ctx)
    ctx.out.toSeq
  }

  private def top(n: JsonNode, ctx: Ctx): Unit = {
    if (n.isArray) { n.elements().asScala.foreach(top(_, ctx)); return }
    if (!n.isObject) unsupported(s"top-level ${n.getNodeType}")
    Option(n.get("@context")).foreach(readContext(_, ctx))
    n.get("@graph") match {
      case null => nodeObject(n, ctx, None); ()
      case _ if n.has("@id") =>
        // named-graph node: processProps routes the items into the graph the
        // @id names and keeps the node's other entries about the name itself
        nodeObject(n, ctx, None); ()
      case g =>
        val items = if (g.isArray) g.elements().asScala.toSeq else Seq(g)
        items.foreach(nodeObject(_, ctx, None))
        // a @graph carrier may still carry @included alongside (same graph)
        Option(n.get("@included")).foreach(inc =>
          values(inc).foreach(nodeObject(_, ctx, None)))
    }
  }

  /** Load a context node into `ctx`; returns the explicit `@propagate` value
    * if one appeared (JSON-LD 1.1 §4.1.9). Subset rule for context ARRAYS: the
    * members share one propagation decision, last explicit value wins (full
    * JSON-LD tracks it per member).
    */
  private def readContext(c: JsonNode, ctx: Ctx): Option[Boolean] = {
    if (c.isTextual) {
      val uri = c.asText()
      if (resolving.value(uri)) unsupported(s"cyclic remote @context <$uri>")
      contextRegistry.get(uri) match {
        case Some(doc) =>
          val parsed = new ObjectMapper().readTree(doc)
          val node = Option(parsed.get("@context")).getOrElse(parsed)
          return resolving.withValue(resolving.value + uri)(
            readContext(node, ctx))
        case None => unsupported(s"remote @context <$uri> " +
          "(no dereferencing; register it via JsonLd.registerContext or inline it)")
      }
    }
    if (c.isArray)
      return c.elements().asScala.foldLeft(Option.empty[Boolean])(
        (acc, m) => readContext(m, ctx).orElse(acc))
    var propagate = Option.empty[Boolean]
    c.properties().asScala.foreach { e =>
      val (k, v) = (e.getKey, e.getValue)
      if (k == "@vocab") ctx.vocab = Some(v.asText())
      else if (k == "@direction")
        ctx.defaultDirection = if (v.isNull) None else Some(dirOf(v.asText()))
      else if (k == "@propagate") propagate = Some(v.asBoolean(true))
      else if (k.startsWith("@")) () // @base/@language: accepted, not modeled
      else if (v.isTextual && v.asText() == "@nest") ctx.nestAliases += k
      else if (v.isTextual) ctx.terms += k -> (v.asText(), None)
      else if (v.isObject) {
        val rev = Option(v.get("@reverse")).map(_.asText())
        val id = Option(v.get("@id")).map(_.asText()).orElse(rev)
          .getOrElse(unsupported(s"context term $k without @id"))
        val coerce = Option(v.get("@type")).map(_.asText())
        // @container: @set is a no-op on the flattened form; @list builds RDF
        // lists; @language / @index maps re-key the values (index keys are
        // dropped in RDF, the JSON-LD 1.1 default). Anything else (@graph/@id
        // containers) stays rejected with a diagnostic.
        val containers = Option(v.get("@container")).toSeq.flatMap(c =>
          if (c.isArray) c.elements().asScala.map(_.asText()).toSeq else Seq(c.asText()))
        val bad = containers.filterNot(Set("@set", "@list", "@language", "@index"))
        if (bad.nonEmpty) unsupported(s"context term $k @container ${bad.mkString(",")}")
        if (id == "@nest") ctx.nestAliases += k
        else {
          ctx.terms += k -> (id, coerce)
          if (rev.isDefined) ctx.reverseTerms += k
          if (containers.nonEmpty) ctx.containers += k -> containers
          // scoped context (JSON-LD 1.1 expanded term definition @context):
          // applied when the term is used as a property (or as a type), on a
          // BRANCHED active context so siblings are unaffected
          Option(v.get("@context")).foreach(sc => ctx.scopedCtx += k -> sc)
        }
      }
    }
    propagate
  }

  /** Term/compact-IRI/absolute-IRI expansion for @id/@type positions. */
  private def expandIri(s: String, ctx: Ctx): String =
    if (s.startsWith("_:")) s // handled by caller
    else ctx.terms.get(s).map(_._1).getOrElse {
      val i = s.indexOf(':')
      if (i > 0) {
        val pfx = s.substring(0, i)
        ctx.terms.get(pfx).map(_._1 + s.substring(i + 1)).getOrElse(s)
      } else ctx.vocab.map(_ + s).getOrElse(s)
    }

  private def subjectOf(n: JsonNode, ctx: Ctx): (Byte, String) =
    Option(n.get("@id")).map(_.asText()) match {
      case Some(id) if id.startsWith("_:") => (Term.KIND_BNODE, ctx.bnode(id))
      case Some(id) => (Term.KIND_IRI, expandIri(id, ctx))
      case None => (Term.KIND_BNODE, ctx.freshBnode())
    }

  private def emit(ctx: Ctx, s: (Byte, String), p: String,
                   oKind: Byte, o: String, dt: String, lang: String,
                   g: Option[String]): Unit = {
    val c = if (dt != null) Parser.canonicalLit(o, Some(dt), None)
            else graft.sparql.Ast.LitNode(o, None, Option(lang))
    ctx.out += Rio.ParsedQuad(s._1, s._2, p, oKind,
      if (oKind == Term.KIND_LITERAL) c.lex else o,
      if (oKind == Term.KIND_LITERAL) c.dt.orNull else null,
      if (oKind == Term.KIND_LITERAL) c.lang.orNull else null,
      Term.KIND_IRI, g.orNull)
  }

  /** Parse one node object; returns its subject term. */
  private def nodeObject(n: JsonNode, ctx0: Ctx, g: Option[String]): (Byte, String) = {
    if (!n.isObject) unsupported(s"node ${n.getNodeType}")
    // a parent's non-propagating context reverts here once its depth is spent
    // (depth 1 = a property-scoped @propagate:false surviving its immediate
    // value node: this entry keeps it, the NEXT node-object entry reverts)
    var ctx = ctx0.revertTo match {
      case Some(pre) if ctx0.revertDepth <= 0 => pre
      case Some(pre) =>
        val c = ctx0.branch; c.revertTo = Some(pre); c.revertDepth = ctx0.revertDepth - 1; c
      case None => ctx0
    }
    // embedded @context on a nested node object: branch so siblings are
    // unaffected; @propagate:false scopes it to THIS node (children revert)
    if (n.has("@context")) {
      val pre = ctx
      val c2 = ctx.branch
      val prop = readContext(n.get("@context"), c2)
      if (prop.contains(false)) c2.revertTo = Some(pre)
      ctx = c2
    }
    // type-scoped contexts: a term with a scoped @context used in @type applies
    // its context to THIS node (in type order), reverting for children unless
    // EVERY applied scoped context opts in with @propagate:true (subset rule;
    // full JSON-LD tracks propagation per context)
    val typeTerms = Option(n.get("@type")).toSeq
      .flatMap(t => if (t.isArray) t.elements().asScala.toSeq else Seq(t))
      .filter(_.isTextual).map(_.asText())
    val scopedTypes = typeTerms.filter(ctx.scopedCtx.contains).sorted
    if (scopedTypes.nonEmpty) {
      val pre = ctx
      val c2 = ctx.branch
      val allPropagate = scopedTypes
        .map(t => readContext(pre.scopedCtx(t), c2))
        .forall(_.contains(true))
      if (!allPropagate) c2.revertTo = Some(pre)
      ctx = c2
    }
    val subj = subjectOf(n, ctx)
    processProps(n, ctx, subj, g)
    subj
  }

  /** One node object's (or one @nest map's) property entries, all owned by `subj`. */
  private def processProps(n: JsonNode, ctx: Ctx, subj: (Byte, String),
                           g: Option[String]): Unit = {
    n.properties().asScala.foreach { e =>
      val (k, v) = (e.getKey, e.getValue)
      k match {
        case "@id" | "@context" => ()
        case "@type" =>
          val types = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
          types.foreach(t =>
            emit(ctx, subj, RDF + "type", Term.KIND_IRI, expandIri(t.asText(), ctx), null, null, g))
        case "@graph" =>
          // a named-graph node: this node's @id names the graph holding the items
          // (the node's other entries still describe the name in the parent graph)
          subj match {
            case (Term.KIND_IRI, gname) => values(v).foreach(nodeObject(_, ctx, Some(gname)))
            case _ => unsupported("bnode-named nested @graph")
          }
        case "@reverse" =>
          // inverse edges: { "@reverse": { prop: node-refs } } → (node, prop, subj)
          v.properties().asScala.foreach { re =>
            val prop = ctx.terms.get(re.getKey)
              .map { case (iri, _) => expandIri(iri, ctx) }
              .getOrElse(expandIri(re.getKey, ctx))
            values(re.getValue).foreach { nv =>
              val o = nodeRef(nv, ctx, g)
              emit(ctx, o, prop, subj._1, subj._2, null, null, g)
            }
          }
        case "@included" =>
          // secondary node objects: same graph, no edge from the carrier
          values(v).foreach(nodeObject(_, ctx, g))
        case term if term == "@nest" || ctx.nestAliases(term) =>
          values(v).foreach { nv =>
            if (!nv.isObject || nv.has("@value")) unsupported("@nest value (must be a node-ish map)")
            if (nv.has("@id")) unsupported("@id inside @nest")
            processProps(nv, ctx, subj, g)
          }
        case term =>
          // context term values may themselves be compact IRIs ("ex:blob") —
          // expand at use time (prefix defs may appear anywhere in the context)
          val (prop, coerce) = ctx.terms.get(term)
            .map { case (iri, c) => (expandIri(iri, ctx), c) }
            .getOrElse((expandIri(term, ctx), None))
          val cont = ctx.containers.getOrElse(term, Nil)
          // property-scoped context: the term's scoped @context applies to this
          // entry's values on a BRANCH of the active context (and, default
          // @propagate, to everything beneath them); @propagate:false keeps it
          // on the entry's immediate value nodes but reverts for node objects
          // nested inside them (revertDepth 1 — consumed at entries)
          val sctx = ctx.scopedCtx.get(term).map { sc =>
            val c2 = ctx.branch
            val prop = readContext(sc, c2)
            if (prop.contains(false)) { c2.revertTo = Some(ctx); c2.revertDepth = 1 }
            c2
          }.getOrElse(ctx)
          def one(nv: JsonNode): Unit =
            if (ctx.reverseTerms(term)) {
              val o = nodeRef(nv, sctx, g)
              emit(ctx, o, prop, subj._1, subj._2, null, null, g)
            } else value(nv, sctx, subj, prop, coerce, g)
          // an @json-coerced ARRAY is one literal, not one value per element
          if (coerce.contains("@json")) value(v, sctx, subj, prop, coerce, g)
          else if (cont.contains("@list") && !(v.isObject && v.has("@list"))) {
            // array (or lone) value reads as a list under @container: @list
            val on = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
            on.set[JsonNode]("@list",
              if (v.isArray) v
              else com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.arrayNode().add(v))
            value(on, sctx, subj, prop, coerce, g)
          } else if (cont.contains("@language") && v.isObject && !v.has("@value")) {
            // language map: key = language tag ("@none" = no tag), value = string(s)
            v.properties().asScala.foreach { lm =>
              val lang = if (lm.getKey == "@none") null else lm.getKey.toLowerCase
              values(lm.getValue).foreach(tv =>
                emit(ctx, subj, prop, Term.KIND_LITERAL, tv.asText(), null, lang, g))
            }
          } else if (cont.contains("@index") && v.isObject &&
              !v.has("@value") && !v.has("@id") && !v.has("@list")) {
            // index map: keys are dropped in RDF, values flatten
            v.properties().asScala.foreach(im => values(im.getValue).foreach(one))
          } else values(v).foreach(one)
      }
    }
  }

  /** A node reference position: IRI/bnode string or a (nested) node object. */
  private def nodeRef(nv: JsonNode, ctx: Ctx, g: Option[String]): (Byte, String) =
    if (nv.isTextual) {
      val t = nv.asText()
      if (t.startsWith("_:")) (Term.KIND_BNODE, ctx.bnode(t))
      else (Term.KIND_IRI, expandIri(t, ctx))
    } else nodeObject(nv, ctx, g)

  private def values(v: JsonNode): Seq[JsonNode] =
    if (v.isArray) v.elements().asScala.toSeq else Seq(v)

  /** rdf:JSON literal lexical form: canonical key-sorted serialization (the
    * JSON-LD 1.1 JSON-literal rule — object keys sorted, no whitespace; numbers
    * and escapes as Jackson prints them, a documented simplification of JCS).
    */
  private[sources] def canonicalJson(n: JsonNode): String =
    if (n.isObject)
      n.properties().asScala.toSeq.map(e => (e.getKey, e.getValue)).sortBy(_._1)
        .map { case (k, v) =>
          com.fasterxml.jackson.databind.node.TextNode.valueOf(k).toString + ":" + canonicalJson(v)
        }.mkString("{", ",", "}")
    else if (n.isArray) n.elements().asScala.map(canonicalJson).mkString("[", ",", "]")
    else n.toString // strings print quoted+escaped; numbers/bools/null as-is

  private val RDF_JSON = RDF + "JSON"
  private val I18N = "https://www.w3.org/ns/i18n#"

  private def dirOf(d: String): String =
    if (d == "ltr" || d == "rtl") d
    else unsupported(s"@direction '$d' (must be \"ltr\" or \"rtl\")")

  private def emitJson(ctx: Ctx, subj: (Byte, String), prop: String,
                       v: JsonNode, g: Option[String]): Unit =
    ctx.out += Rio.ParsedQuad(subj._1, subj._2, prop, Term.KIND_LITERAL,
      canonicalJson(v), RDF_JSON, null, Term.KIND_IRI, g.orNull)

  private def value(v: JsonNode, ctx: Ctx, subj: (Byte, String), prop: String,
                    coerce: Option[String], g: Option[String]): Unit = {
    // context coercion "@type": "@json" — the ENTIRE value is one JSON literal
    if (coerce.contains("@json")) { emitJson(ctx, subj, prop, v, g); return }
    if (v.isObject && v.has("@value") &&
        Option(v.get("@type")).exists(_.asText() == "@json")) {
      emitJson(ctx, subj, prop, v.get("@value"), g); return
    }
    if (v.isObject && v.has("@list")) {
      val items = values(v.get("@list"))
      if (items.isEmpty) emit(ctx, subj, prop, Term.KIND_IRI, RDF + "nil", null, null, g)
      else {
        val cells = items.map(_ => ctx.freshBnode())
        emit(ctx, subj, prop, Term.KIND_BNODE, cells.head, null, null, g)
        items.zipWithIndex.foreach { case (item, i) =>
          val cell = (Term.KIND_BNODE, cells(i))
          value(item, ctx, cell, RDF + "first", coerce, g)
          if (i < items.size - 1)
            emit(ctx, cell, RDF + "rest", Term.KIND_BNODE, cells(i + 1), null, null, g)
          else emit(ctx, cell, RDF + "rest", Term.KIND_IRI, RDF + "nil", null, null, g)
        }
      }
    } else if (v.isObject && v.has("@value")) {
      val lex = v.get("@value") match {
        case b if b.isBoolean => b.asBoolean().toString
        case x => x.asText()
      }
      val dt = Option(v.get("@type")).map(t => expandIri(t.asText(), ctx))
        .orElse(if (v.get("@value").isBoolean) Some(Term.XSD_BOOLEAN) else None)
        .orElse(if (v.get("@value").isIntegralNumber) Some(Term.XSD_INTEGER) else None)
        .orElse(if (v.get("@value").isNumber) Some(Term.XSD_DOUBLE) else None)
      val lang = Option(v.get("@language")).map(_.asText().toLowerCase)
      // @direction (explicit, else the context default for plain strings):
      // i18n-datatype serialization — direction rides in the datatype IRI
      // a value object with both @type and @direction is invalid (JSON-LD 1.1
      // §invalid value object) — fail loudly rather than drop the direction
      if (v.has("@direction") && v.has("@type"))
        unsupported("value object with both @type and @direction (invalid per JSON-LD 1.1)")
      val dir = Option(v.get("@direction")).map(d => dirOf(d.asText()))
        .orElse(if (dt.isEmpty && v.get("@value").isTextual) ctx.defaultDirection else None)
      dir match {
        case Some(d) if dt.isEmpty =>
          emit(ctx, subj, prop, Term.KIND_LITERAL, lex,
            I18N + lang.getOrElse("") + "_" + d, null, g)
        case _ =>
          emit(ctx, subj, prop, Term.KIND_LITERAL, lex, dt.orNull,
            if (dt.isEmpty) lang.orNull else null, g)
      }
    } else if (v.isObject) {
      // node reference or nested node object
      val o = nodeObject(v, ctx, g)
      emit(ctx, subj, prop, o._1, o._2, null, null, g)
    } else if (v.isTextual) {
      coerce match {
        case Some("@id") =>
          val t = v.asText()
          if (t.startsWith("_:")) emit(ctx, subj, prop, Term.KIND_BNODE, ctx.bnode(t), null, null, g)
          else emit(ctx, subj, prop, Term.KIND_IRI, expandIri(t, ctx), null, null, g)
        case Some(dt) => emit(ctx, subj, prop, Term.KIND_LITERAL, v.asText(), expandIri(dt, ctx), null, g)
        case None => ctx.defaultDirection match {
          // context default direction applies to plain (uncoerced) strings
          case Some(d) =>
            emit(ctx, subj, prop, Term.KIND_LITERAL, v.asText(), I18N + "_" + d, null, g)
          case None => emit(ctx, subj, prop, Term.KIND_LITERAL, v.asText(), null, null, g)
        }
      }
    } else if (v.isBoolean)
      emit(ctx, subj, prop, Term.KIND_LITERAL, v.asBoolean().toString, Term.XSD_BOOLEAN, null, g)
    else if (v.isIntegralNumber)
      emit(ctx, subj, prop, Term.KIND_LITERAL, v.asText(), Term.XSD_INTEGER, null, g)
    else if (v.isNumber)
      emit(ctx, subj, prop, Term.KIND_LITERAL, v.asText(), Term.XSD_DOUBLE, null, g)
    else if (v.isNull) ()
    else unsupported(s"value ${v.getNodeType}")
  }
}
