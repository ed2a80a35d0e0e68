package graft

import graft.model.GraftStore
import graft.sources.{JsonLd, Rio}
import graft.engine.Engine

class JsonLdSpec extends GraftSuite {
  private val ss = SharedSpark.spark

  private val doc =
    """{
      |  "@context": {
      |    "ex": "http://example.org/",
      |    "name": "http://example.org/name",
      |    "knows": {"@id": "http://example.org/knows", "@type": "@id"},
      |    "born": {"@id": "http://example.org/born",
      |              "@type": "http://www.w3.org/2001/XMLSchema#date"}
      |  },
      |  "@graph": [
      |    {"@id": "ex:alice", "@type": "ex:Person",
      |     "name": {"@value": "Alice", "@language": "en"},
      |     "knows": ["ex:bob", "_:carol"],
      |     "born": "1990-05-04",
      |     "ex:age": 33,
      |     "ex:score": 4.5,
      |     "ex:active": true,
      |     "ex:tags": {"@list": ["x", "y"]}},
      |    {"@id": "ex:bob", "name": "Bob",
      |     "ex:address": {"ex:city": "Springfield"}},
      |    {"@id": "_:carol", "name": "Carol"}
      |  ]
      |}""".stripMargin

  private lazy val jstore = new GraftStore(ss, Rio.readJsonLd(ss, doc))

  private def ask(q: String): Boolean = Engine.query(jstore, q).first().getBoolean(0)

  test("context terms, types, lang values, and id coercion") {
    assert(ask("""ASK { <http://example.org/alice> a <http://example.org/Person> }"""))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/name> "Alice"@en }"""))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/knows> <http://example.org/bob> }"""))
  }

  test("datatype coercion and JSON primitives") {
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/born>
                 |  "1990-05-04"^^<http://www.w3.org/2001/XMLSchema#date> }""".stripMargin))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/age> 33 }"""))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/score> ?s .
                 |  FILTER(?s > 4.4 && ?s < 4.6) }""".stripMargin))
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/active> true }"""))
  }

  test("bnode coreference and nested node objects") {
    assert(ask("""ASK { <http://example.org/alice> <http://example.org/knows> ?c .
                 |  ?c <http://example.org/name> "Carol" }""".stripMargin))
    assert(ask("""ASK { <http://example.org/bob> <http://example.org/address> ?a .
                 |  ?a <http://example.org/city> "Springfield" }""".stripMargin))
  }

  test("@list builds an rdf:List") {
    val items = Engine.query(jstore,
      """SELECT ?x WHERE { <http://example.org/alice> <http://example.org/tags>
        |  ?l . ?l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>*
        |  ?c . ?c <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?x }""".stripMargin)
      .collect().map(_.getStruct(0).getAs[String]("str")).toSet
    assert(items == Set("x", "y"))
  }

  test("@nest groups properties onto the enclosing node (direct and aliased)") {
    val d = """{
              |  "@context": {"ex": "http://example.org/", "meta": "@nest"},
              |  "@id": "ex:n1",
              |  "@nest": {"ex:a": 1},
              |  "meta": {"ex:b": 2, "ex:deep": {"@id": "ex:n2", "ex:c": 3}}
              |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("ASK { <http://example.org/n1> <http://example.org/a> 1 }"))
    assert(ask2("ASK { <http://example.org/n1> <http://example.org/b> 2 }"))
    // values inside a nest are still full node objects with their own identity
    assert(ask2("""ASK { <http://example.org/n1> <http://example.org/deep> <http://example.org/n2> .
                  |  <http://example.org/n2> <http://example.org/c> 3 }""".stripMargin))
    val e = intercept[IllegalArgumentException](
      JsonLd.parse("""{"@id": "urn:x", "@nest": {"@id": "urn:y"}}"""))
    assert(e.getMessage.contains("@id inside @nest"))
  }

  test("@included carries secondary nodes in the same graph, without an edge") {
    val d = """{
              |  "@context": {"ex": "http://example.org/"},
              |  "@id": "ex:main", "ex:p": 1,
              |  "@included": [
              |    {"@id": "ex:side1", "ex:q": 2},
              |    {"@id": "ex:side2", "ex:q": 3}
              |  ]
              |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("ASK { <http://example.org/side1> <http://example.org/q> 2 }"))
    assert(ask2("ASK { <http://example.org/side2> <http://example.org/q> 3 }"))
    // no edge minted from the carrier to included nodes
    assert(!ask2("ASK { <http://example.org/main> ?p <http://example.org/side1> }"))
  }

  test("@json values become rdf:JSON literals with canonical key order") {
    val d = """{
              |  "@context": {"ex": "http://example.org/",
              |    "blob": {"@id": "ex:blob", "@type": "@json"}},
              |  "@id": "ex:j",
              |  "blob": {"zeta": 1, "alpha": {"b": [1, 2, "x"], "a": true}},
              |  "ex:inline": {"@value": {"k": "v"}, "@type": "@json"},
              |  "ex:arr": {"@value": [3, null], "@type": "@json"}
              |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    val got = Engine.query(st,
      """SELECT ?o WHERE { <http://example.org/j> <http://example.org/blob> ?o }""")
      .first().getStruct(0)
    assert(got.getAs[String]("str") ==
      """{"alpha":{"a":true,"b":[1,2,"x"]},"zeta":1}""")
    assert(got.getAs[String]("dt") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON")
    def lex(p: String) = Engine.query(st,
      s"""SELECT ?o WHERE { <http://example.org/j> <http://example.org/$p> ?o }""")
      .first().getStruct(0).getAs[String]("str")
    assert(lex("inline") == """{"k":"v"}""")
    assert(lex("arr") == "[3,null]")
  }

  test("@direction: value-object member and context default emit i18n-datatype literals") {
    val quads = JsonLd.parse(
      """{
        |  "@context": {"ex": "http://example.org/"},
        |  "@id": "ex:x",
        |  "ex:title": {"@value": "مرحبا", "@language": "ar", "@direction": "rtl"},
        |  "ex:note": {"@value": "plain", "@direction": "ltr"}
        |}""".stripMargin)
    val byDt = quads.map(q => q.oStr -> q.oDt).toMap
    assert(byDt("مرحبا") == "https://www.w3.org/ns/i18n#ar_rtl")
    assert(byDt("plain") == "https://www.w3.org/ns/i18n#_ltr")
    // context default applies to uncoerced plain strings and direction-less
    // string value objects; an explicit @type wins over the default
    val q2 = JsonLd.parse(
      """{
        |  "@context": {"ex": "http://example.org/", "@direction": "rtl",
        |               "when": {"@id": "ex:when", "@type": "ex:dt"}},
        |  "@id": "ex:y",
        |  "ex:a": "shalom",
        |  "ex:b": {"@value": "b", "@language": "he"},
        |  "when": "now"
        |}""".stripMargin)
    val m2 = q2.map(q => q.oStr -> q.oDt).toMap
    assert(m2("shalom") == "https://www.w3.org/ns/i18n#_rtl")
    assert(m2("b") == "https://www.w3.org/ns/i18n#he_rtl")
    assert(m2("now") == "http://example.org/dt")
    // invalid direction token rejected with a diagnostic
    val e = intercept[IllegalArgumentException](JsonLd.parse(
      """{"@id": "urn:x", "urn:p": {"@value": "v", "@direction": "up"}}"""))
    assert(e.getMessage.contains("@direction"))
  }

  test("unsupported 1.1 features fail loudly") {
    val e = intercept[IllegalArgumentException](
      JsonLd.parse("""{"@context": "http://remote/ctx", "@id": "ex:x"}"""))
    assert(e.getMessage.contains("unsupported") && e.getMessage.contains("http://remote/ctx"))
    // @propagate (both values) is supported — parses clean
    JsonLd.parse("""{"@context": {"@propagate": true}, "@id": "ex:x"}""")
    JsonLd.parse("""{"@context": {"@propagate": false}, "@id": "ex:x"}""")
    val e2 = intercept[IllegalArgumentException](
      JsonLd.parse("""{"@context": {"t": {"@id": "urn:p", "@container": "@graph"}},
                     | "@id": "urn:x", "t": {"@id": "urn:y"}}""".stripMargin))
    assert(e2.getMessage.contains("unsupported"))
  }

  test("registered remote contexts resolve locally; unregistered still reject") {
    val uri = "http://example.org/contexts/person.jsonld"
    // a full document with an @context member, itself chaining to a second
    // registered context (exercises recursive resolution + the cycle guard)
    JsonLd.registerContext(uri,
      """{"@context": ["http://example.org/contexts/base.jsonld",
        |              {"name": "http://example.org/name"}]}""".stripMargin)
    JsonLd.registerContext("http://example.org/contexts/base.jsonld",
      """{"knows": {"@id": "http://example.org/knows", "@type": "@id"}}""")
    try {
      val quads = JsonLd.parse(
        s"""{"@context": "$uri", "@id": "urn:x:a",
           | "name": "Ann", "knows": "urn:x:b"}""".stripMargin)
      assert(quads.exists(q => q.pStr == "http://example.org/name"))
      assert(quads.exists(q =>
        q.pStr == "http://example.org/knows" && q.oStr == "urn:x:b"))
      // a cycle between registered contexts fails loudly, not infinitely
      JsonLd.registerContext("http://example.org/contexts/loop.jsonld",
        """{"@context": "http://example.org/contexts/loop.jsonld"}""")
      val ce = intercept[IllegalArgumentException](JsonLd.parse(
        """{"@context": "http://example.org/contexts/loop.jsonld", "@id": "urn:x"}"""))
      assert(ce.getMessage.contains("cyclic"))
    } finally {
      JsonLd.unregisterContext(uri)
      JsonLd.unregisterContext("http://example.org/contexts/base.jsonld")
      JsonLd.unregisterContext("http://example.org/contexts/loop.jsonld")
    }
    // after unregistration the loud rejection is back
    val e = intercept[IllegalArgumentException](
      JsonLd.parse(s"""{"@context": "$uri", "@id": "urn:x"}"""))
    assert(e.getMessage.contains("registerContext"))
  }

  test("@reverse: node-object form and context-term form invert the edge") {
    val d =
      """{
        |  "@context": {"ex": "http://example.org/",
        |    "childOf": {"@reverse": "ex:parentOf"}},
        |  "@id": "ex:alice",
        |  "@reverse": {"ex:knows": [{"@id": "ex:bob"}, "ex:carol"]},
        |  "childOf": "ex:dan"
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("ASK { <http://example.org/bob> <http://example.org/knows> <http://example.org/alice> }"))
    assert(ask2("ASK { <http://example.org/carol> <http://example.org/knows> <http://example.org/alice> }"))
    assert(ask2("ASK { <http://example.org/dan> <http://example.org/parentOf> <http://example.org/alice> }"))
    assert(!ask2("ASK { <http://example.org/alice> <http://example.org/knows> ?x }"))
  }

  test("@container: @set flattens, @list chains, @language and @index re-key") {
    val d =
      """{
        |  "@context": {"ex": "http://example.org/",
        |    "tags":  {"@id": "ex:tag", "@container": "@set"},
        |    "steps": {"@id": "ex:steps", "@container": "@list"},
        |    "label": {"@id": "ex:label", "@container": "@language"},
        |    "posts": {"@id": "ex:post", "@container": "@index", "@type": "@id"}
        |  },
        |  "@id": "ex:thing",
        |  "tags": ["a", "b"],
        |  "steps": ["s1", "s2"],
        |  "label": {"en": "Thing", "de": ["Ding"], "@none": "thing"},
        |  "posts": {"2024": "ex:p1", "2025": ["ex:p2"]}
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("""ASK { <http://example.org/thing> <http://example.org/tag> "a", "b" }"""))
    assert(ask2("""PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
                  |ASK { <http://example.org/thing> <http://example.org/steps> ?l .
                  |  ?l rdf:first "s1" ; rdf:rest ?r .
                  |  ?r rdf:first "s2" ; rdf:rest rdf:nil }""".stripMargin))
    assert(ask2("""ASK { <http://example.org/thing> <http://example.org/label> "Thing"@en, "Ding"@de, "thing" }"""))
    assert(ask2("""ASK { <http://example.org/thing> <http://example.org/post>
                  |  <http://example.org/p1>, <http://example.org/p2> }""".stripMargin))
  }

  test("property-scoped context remaps terms for that entry's values (and propagates)") {
    val d =
      """{
        |  "@context": {
        |    "ex": "http://example.org/",
        |    "label": "http://example.org/label",
        |    "detail": {"@id": "http://example.org/detail",
        |               "@context": {"label": "http://other.org/label"}}
        |  },
        |  "@id": "ex:x",
        |  "label": "outer",
        |  "detail": {"@id": "ex:d", "label": "inner",
        |             "ex:sub": {"@id": "ex:dd", "label": "deep"}}
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("""ASK { <http://example.org/x> <http://example.org/label> "outer" }"""))
    assert(ask2("""ASK { <http://example.org/d> <http://other.org/label> "inner" }"""))
    // default @propagate: the scoped mapping survives into nested node objects
    assert(ask2("""ASK { <http://example.org/dd> <http://other.org/label> "deep" }"""))
    // the sibling scope is untouched
    assert(!ask2("""ASK { <http://example.org/x> <http://other.org/label> "outer" }"""))
  }

  test("type-scoped context applies to the typed node and reverts for children") {
    val d =
      """{
        |  "@context": {
        |    "ex": "http://example.org/",
        |    "name": "http://example.org/name",
        |    "Widget": {"@id": "http://example.org/Widget",
        |               "@context": {"name": "http://widget.org/name"}}
        |  },
        |  "@id": "ex:w", "@type": "Widget", "name": "gizmo",
        |  "ex:part": {"@id": "ex:p", "name": "cog"}
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("""ASK { <http://example.org/w> <http://widget.org/name> "gizmo" }"""))
    // non-propagation: the child node reverts to the outer mapping (§4.1.8)
    assert(ask2("""ASK { <http://example.org/p> <http://example.org/name> "cog" }"""))
  }

  test("embedded @context on a nested node object scopes to that subtree") {
    val d =
      """{
        |  "@context": {"ex": "http://example.org/", "p": "http://example.org/p"},
        |  "@id": "ex:a",
        |  "ex:child": {"@context": {"p": "http://inner.org/p"},
        |               "@id": "ex:b", "p": "iv"},
        |  "p": "ov"
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("""ASK { <http://example.org/b> <http://inner.org/p> "iv" }"""))
    assert(ask2("""ASK { <http://example.org/a> <http://example.org/p> "ov" }"""))
  }

  test("@propagate controls scoped-context propagation (§4.1.9)") {
    // property-scoped with @propagate:false: applies to the entry's immediate
    // value node, reverts for node objects nested inside it
    val d =
      """{
        |  "@context": {
        |    "ex": "http://example.org/",
        |    "label": "http://example.org/label",
        |    "detail": {"@id": "http://example.org/detail",
        |               "@context": {"@propagate": false,
        |                            "label": "http://other.org/label"}}
        |  },
        |  "@id": "ex:x",
        |  "detail": {"@id": "ex:d", "label": "inner",
        |             "ex:sub": {"@id": "ex:dd", "label": "deep"}}
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("""ASK { <http://example.org/d> <http://other.org/label> "inner" }"""))
    assert(ask2("""ASK { <http://example.org/dd> <http://example.org/label> "deep" }"""))
    // type-scoped with @propagate:true: survives into child node objects
    val t =
      """{
        |  "@context": {
        |    "ex": "http://example.org/",
        |    "name": "http://example.org/name",
        |    "Widget": {"@id": "http://example.org/Widget",
        |               "@context": {"@propagate": true,
        |                            "name": "http://widget.org/name"}}
        |  },
        |  "@id": "ex:w", "@type": "Widget", "name": "gizmo",
        |  "ex:part": {"@id": "ex:p", "name": "cog"}
        |}""".stripMargin
    val st2 = new GraftStore(ss, Rio.readJsonLd(ss, t))
    def ask3(q: String) = Engine.query(st2, q).first().getBoolean(0)
    assert(ask3("""ASK { <http://example.org/w> <http://widget.org/name> "gizmo" }"""))
    assert(ask3("""ASK { <http://example.org/p> <http://widget.org/name> "cog" }"""))
    // embedded @context with @propagate:false: this node only, children revert
    val e =
      """{
        |  "@context": {"ex": "http://example.org/", "p": "http://example.org/p"},
        |  "@id": "ex:a",
        |  "ex:child": {"@context": {"@propagate": false, "p": "http://inner.org/p"},
        |               "@id": "ex:b", "p": "iv",
        |               "ex:grand": {"@id": "ex:c", "p": "gv"}}
        |}""".stripMargin
    val st3 = new GraftStore(ss, Rio.readJsonLd(ss, e))
    def ask4(q: String) = Engine.query(st3, q).first().getBoolean(0)
    assert(ask4("""ASK { <http://example.org/b> <http://inner.org/p> "iv" }"""))
    assert(ask4("""ASK { <http://example.org/c> <http://example.org/p> "gv" }"""))
  }

  test("nested named @graph lands items in the graph the node's @id names") {
    val d =
      """{
        |  "@context": {"ex": "http://example.org/"},
        |  "@id": "ex:g1",
        |  "ex:about": "claims",
        |  "@graph": [{"@id": "ex:s", "ex:p": "v"}]
        |}""".stripMargin
    val st = new GraftStore(ss, Rio.readJsonLd(ss, d))
    def ask2(q: String) = Engine.query(st, q).first().getBoolean(0)
    assert(ask2("""ASK { GRAPH <http://example.org/g1> { <http://example.org/s> <http://example.org/p> "v" } }"""))
    assert(ask2("""ASK { <http://example.org/g1> <http://example.org/about> "claims" }"""))
  }
}
