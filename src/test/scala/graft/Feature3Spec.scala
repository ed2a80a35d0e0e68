package graft

import graft.engine.{Engine, Update}
import graft.model.GraftStore
import org.apache.spark.sql.functions._

/** Round-2 features: graph-management UPDATE ops, LOAD, truth maintenance,
  * query hints, Turtle collections / bnode property lists, TriG blocks.
  */
class Feature3Spec extends GraftSuite {

  private def count(st: GraftStore, ask: String): Long = Engine.query(st, ask).count()

  test("ADD / COPY / MOVE between graphs") {
    val s0 = Update(store,
      """INSERT DATA { GRAPH <urn:g:src> { <urn:f3:a> <urn:p:v> 1 . <urn:f3:b> <urn:p:v> 2 . } }""")
    def n(st: GraftStore, g: String): Long =
      Engine.query(st, s"SELECT ?s WHERE { GRAPH <$g> { ?s <urn:p:v> ?o } }").count()
    val added = Update(s0, "ADD GRAPH <urn:g:src> TO GRAPH <urn:g:dst>")
    assert(n(added, "urn:g:src") == 2 && n(added, "urn:g:dst") == 2)
    // COPY clears the destination first
    val pre = Update(s0, "INSERT DATA { GRAPH <urn:g:dst> { <urn:f3:old> <urn:p:v> 9 . } }")
    val copied = Update(pre, "COPY GRAPH <urn:g:src> TO GRAPH <urn:g:dst>")
    assert(n(copied, "urn:g:dst") == 2)
    assert(!Engine.query(copied,
      "ASK { GRAPH <urn:g:dst> { <urn:f3:old> <urn:p:v> 9 } }").first().getBoolean(0))
    // MOVE clears the source
    val moved = Update(s0, "MOVE GRAPH <urn:g:src> TO GRAPH <urn:g:dst2>")
    assert(n(moved, "urn:g:src") == 0 && n(moved, "urn:g:dst2") == 2)
    // ADD DEFAULT TO GRAPH
    val s1 = Update(store, "INSERT DATA { <urn:f3:d> <urn:p:v> 3 . }")
    val addedDef = Update(s1, "ADD DEFAULT TO GRAPH <urn:g:fromdef>")
    assert(Engine.query(addedDef,
      "ASK { GRAPH <urn:g:fromdef> { <urn:f3:d> <urn:p:v> 3 } }").first().getBoolean(0))
  }

  test("LOAD reads an N-Triples file, optionally into a graph") {
    val f = java.io.File.createTempFile("graft-load", ".nt")
    java.nio.file.Files.writeString(f.toPath,
      "<urn:f3:l1> <urn:p:v> \"x\" .\n<urn:f3:l2> <urn:p:v> \"y\" .\n")
    val loaded = Update(store, s"LOAD <file://${f.getAbsolutePath}> INTO GRAPH <urn:g:loaded>")
    assert(Engine.query(loaded,
      "SELECT ?s WHERE { GRAPH <urn:g:loaded> { ?s <urn:p:v> ?o } }").count() == 2)
    val loadedDefault = Update(store, s"LOAD <file://${f.getAbsolutePath}>")
    assert(Engine.query(loadedDefault,
      "ASK { <urn:f3:l1> <urn:p:v> \"x\" }").first().getBoolean(0))
    f.delete()
  }

  test("truth maintenance retracts entailments no longer derivable") {
    import graft.inference.Rdfs
    val base = Update(store,
      """INSERT DATA { <urn:f3:C1> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:f3:C2> .
        |  <urn:f3:x> a <urn:f3:C1> . }""".stripMargin)
    val closed = Rdfs.closure(base)
    assert(Engine.query(closed, "ASK { <urn:f3:x> a <urn:f3:C2> }").first().getBoolean(0))
    // delete the subclass axiom WITH truth maintenance → entailment retracted
    val tm = Update.withTruthMaintenance(closed,
      "DELETE DATA { <urn:f3:C1> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:f3:C2> . }")
    assert(!Engine.query(tm, "ASK { <urn:f3:x> a <urn:f3:C2> }").first().getBoolean(0))
    // the explicit type survives
    assert(Engine.query(tm, "ASK { <urn:f3:x> a <urn:f3:C1> }").first().getBoolean(0))
  }

  test("hint:optimizer None preserves author join order; hints stripped from results") {
    val q =
      """PREFIX hint: <http://www.bigdata.com/queryHints#>
        |SELECT ?n WHERE {
        |  hint:Query hint:optimizer "None" .
        |  ?c a <urn:c:Customer> ; <urn:p:c_name> ?n .
        |}""".stripMargin
    val rows = Engine.query(store, q).count()
    val plain = Engine.query(store,
      "SELECT ?n WHERE { ?c a <urn:c:Customer> ; <urn:p:c_name> ?n }").count()
    assert(rows == plain)
  }

  test("INSERT DATA with collections and bnode property lists") {
    val s0 = Update(store,
      """INSERT DATA { <urn:f3:list> <urn:p:items> ( 1 2 3 ) .
        |  <urn:f3:anon> <urn:p:addr> [ <urn:p:city> "Oslo" ; <urn:p:zip> 1234 ] . }""".stripMargin)
    // walk the collection: list rdf:first 1; rdf:rest*/rdf:first enumerates members
    val members = Engine.query(s0,
      """SELECT ?m WHERE { <urn:f3:list> <urn:p:items> ?l .
        |  ?l (<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>)*/<http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?m }""".stripMargin)
    assert(members.select(col("m")("lng")).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val city = Engine.query(s0,
      "SELECT ?city WHERE { <urn:f3:anon> <urn:p:addr> ?a . ?a <urn:p:city> ?city }")
    assert(city.select(col("city")("str")).first().getString(0) == "Oslo")
  }

  test("TriG bare graph blocks in Turtle loader") {
    val trig =
      """@prefix ex: <urn:f3:> .
        |ex:g1 { ex:s1 ex:p 1 . }
        |GRAPH ex:g2 { ex:s2 ex:p 2 . }
        |ex:s0 ex:p 0 .""".stripMargin
    val df = graft.sources.Rio.readTurtle(spark, trig)
    val st = new GraftStore(spark, df)
    assert(Engine.query(st, "ASK { GRAPH <urn:f3:g1> { <urn:f3:s1> <urn:f3:p> 1 } }").first().getBoolean(0))
    assert(Engine.query(st, "ASK { GRAPH <urn:f3:g2> { <urn:f3:s2> <urn:f3:p> 2 } }").first().getBoolean(0))
    assert(Engine.query(st, "ASK { <urn:f3:s0> <urn:f3:p> 0 }").first().getBoolean(0))
  }

  test("DROP is CLEAR on a schemaless store; CREATE GRAPH is accepted") {
    val s0 = Update(store, "INSERT DATA { GRAPH <urn:g:drop> { <urn:f3:z> <urn:p:v> 1 . } }")
    val dropped = Update(s0, "CREATE GRAPH <urn:g:new> ; DROP GRAPH <urn:g:drop>")
    assert(Engine.query(dropped,
      "SELECT ?s WHERE { GRAPH <urn:g:drop> { ?s ?p ?o } }").count() == 0)
  }

  test("RDF* / SIDs: embedded triples asserted, annotated, queryable") {
    val s0 = Update(store,
      """INSERT DATA {
        |  << <urn:f3:e1> <urn:p:worksFor> <urn:f3:acme> >> <urn:p:certainty> 0.9 .
        |  << <urn:f3:e2> <urn:p:worksFor> <urn:f3:acme> >> <urn:p:certainty> 0.4 .
        |}""".stripMargin)
    // SIDs mode: the inner statements are asserted
    assert(Engine.query(s0, "ASK { <urn:f3:e1> <urn:p:worksFor> <urn:f3:acme> }").first().getBoolean(0))
    // SPARQL*: match the embedded pattern, read the annotation
    val df = Engine.query(s0,
      """SELECT ?who ?c WHERE {
        |  << ?who <urn:p:worksFor> <urn:f3:acme> >> <urn:p:certainty> ?c .
        |  FILTER(?c > 0.5) }""".stripMargin)
    val rows = df.select(col("who")("str"), col("c")("num")).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "urn:f3:e1")
    // constant embedded subject
    val one = Engine.query(s0,
      """SELECT ?c WHERE { << <urn:f3:e2> <urn:p:worksFor> <urn:f3:acme> >> <urn:p:certainty> ?c }""")
    assert(one.select(col("c")("num")).first().getDouble(0) == 0.4)
  }

  test("RDR sid expression: BIND(<< s p o >> AS ?sid) builds the pattern-equal sid") {
    val s0 = Update(store,
      """INSERT DATA {
        |  << <urn:f3:b1> <urn:p:worksFor> <urn:f3:inc> >> <urn:p:certainty> 0.7 .
        |}""".stripMargin)
    // BIND(<< >>) is the RDR statement-pattern lookup (reif TCK suite): it
    // matches the asserted statement and binds its sid, which then joins the
    // annotation stored via the pattern decomposition
    val df = Engine.query(s0,
      """SELECT ?c WHERE {
        |  BIND(<< <urn:f3:b1> <urn:p:worksFor> <urn:f3:inc> >> AS ?sid)
        |  ?sid <urn:p:certainty> ?c }""".stripMargin)
    assert(df.select(col("c")("num")).first().getDouble(0) == 0.7)
    // var operands: rebuild the sid from matched components
    val viaVars = Engine.query(s0,
      """SELECT ?c WHERE {
        |  ?w <urn:p:worksFor> ?org .
        |  BIND(<< ?w <urn:p:worksFor> ?org >> AS ?sid)
        |  ?sid <urn:p:certainty> ?c }""".stripMargin)
    assert(viaVars.select(col("c")("num")).first().getDouble(0) == 0.7)
  }

  test("LOAD SILENT of an unreadable document leaves the store unchanged") {
    val before = store.statements.count()
    val st = Update(store, "LOAD SILENT <file:///nonexistent-corpus.nt>")
    assert(st.statements.count() == before)
    // non-SILENT still surfaces the failure
    intercept[Exception] { Update(store, "LOAD <file:///nonexistent-corpus.nt>") }
  }

  test("change log reports the statement delta of an update") {
    val (next, log) = Update.applyWithLog(store,
      """INSERT DATA { <urn:f3:cl> <urn:p:v> 1 . } ;
        |DELETE DATA { GRAPH <urn:g:region> { <urn:t:region:0> <urn:p:r_name> "AFRICA" . } }""".stripMargin)
    assert(log.added.count() == 1)
    assert(log.removed.count() == 1)
    assert(log.removed.select(col("o")("str")).first().getString(0) == "AFRICA")
    assert(next.statements.count() == store.statements.count())
  }

  test("cross-query solution-set cache serves INCLUDE") {
    import graft.engine.SolutionSets
    SolutionSets.put(store, "bigcust",
      "SELECT ?c WHERE { ?c <urn:p:c_acctbal> ?b . FILTER(?b > 9000.0) }")
    try {
      val df = Engine.query(store,
        "SELECT ?name WHERE { INCLUDE %bigcust . ?c <urn:p:c_name> ?name }")
      val direct = Engine.query(store,
        """SELECT ?name WHERE { ?c <urn:p:c_acctbal> ?b ; <urn:p:c_name> ?name .
          |  FILTER(?b > 9000.0) }""".stripMargin)
      assert(df.count() == direct.count() && df.count() > 0)
    } finally SolutionSets.drop(store, "bigcust")
  }

  test("custom scalar functions register by URI (FunctionRegistry extension point)") {
    import graft.engine.{Exprs, Functions}
    import graft.model.Term
    Functions.register("urn:fn:double",
      args => Term.doubleLit(Exprs.fNum(args.head) * 2.0))
    try {
      val df = Engine.query(store,
        """SELECT ?x WHERE { <urn:t:nation:5> <urn:p:n_nationkey> ?k .
          |  BIND(<urn:fn:double>(?k) AS ?x) }""".stripMargin)
      assert(df.select(col("x")("num")).first().getDouble(0) == 10.0)
    } finally Functions.unregister("urn:fn:double")
    // unregistered IRI functions still fail cleanly
    val e = intercept[Exception](Engine.query(store,
      "SELECT ?x WHERE { BIND(<urn:fn:nope>(1) AS ?x) }").count())
    assert(e.getMessage.contains("urn:fn:nope"))
  }

  test("Turtle long-string literals ('''…''') load with embedded newlines/quotes") {
    val ttl =
      "@prefix ex: <urn:ex:> .\n" +
      "ex:doc ex:body '''line one\nline \"two\" with quotes\nline three''' .\n" +
      "ex:doc ex:note \"\"\"double-long\nstring\"\"\" .\n"
    val st = new graft.model.GraftStore(spark, graft.sources.Rio.readTurtle(spark, ttl))
    val body = Engine.query(st, "SELECT ?b WHERE { <urn:ex:doc> <urn:ex:body> ?b }")
      .first().getStruct(0).getAs[String]("str")
    assert(body == "line one\nline \"two\" with quotes\nline three")
    val note = Engine.query(st, "SELECT ?b WHERE { <urn:ex:doc> <urn:ex:note> ?b }")
      .first().getStruct(0).getAs[String]("str")
    assert(note == "double-long\nstring")
  }

  test("custom datatype handlers inline numeric values (IExtension)") {
    import graft.model.Term
    Term.Datatypes.register("urn:dt:celsius",
      lex => regexp_extract(lex, "^(-?[0-9.]+)C$", 1).cast("double"))
    try {
      val s0 = Update(store,
        """INSERT DATA {
          |  <urn:cd:a> <urn:p:temp> "23.5C"^^<urn:dt:celsius> .
          |  <urn:cd:b> <urn:p:temp> "-4C"^^<urn:dt:celsius> .
          |  <urn:cd:c> <urn:p:temp> "99C"^^<urn:dt:celsius> . }""".stripMargin)
      // range FILTER works numerically on the inlined value
      val hot = Engine.query(s0,
        """SELECT ?x WHERE { ?x <urn:p:temp> ?t . FILTER(?t > 20) }""")
        .collect().map(_.getStruct(0).getAs[String]("str")).toSet
      assert(hot == Set("urn:cd:a", "urn:cd:c"))
      // ORDER BY sorts by the inline value, not lexically ("-4C" < "23.5C" < "99C")
      val ordered = Engine.query(s0,
        """SELECT ?x WHERE { ?x <urn:p:temp> ?t } ORDER BY ?t""")
        .collect().map(_.getStruct(0).getAs[String]("str")).toSeq
      assert(ordered == Seq("urn:cd:b", "urn:cd:a", "urn:cd:c"))
      // STRDT minting also inlines
      assert(Engine.query(s0,
        """ASK { FILTER(STRDT("30C", <urn:dt:celsius>) > 25) }""").first().getBoolean(0))
    } finally Term.Datatypes.unregister("urn:dt:celsius")
  }

  test("RDR history: updates leave queryable added/removed change records") {
    val t0 = Update.applyWithHistory(store,
      "INSERT DATA { <urn:h:x> <urn:p:hv> 1 . }", commitTime = 100L)
    val t1 = Update.applyWithHistory(t0,
      "DELETE DATA { <urn:h:x> <urn:p:hv> 1 . }", commitTime = 200L)
    val hist = Engine.query(t1,
      """SELECT ?a ?t WHERE { << <urn:h:x> <urn:p:hv> 1 >> ?a ?t .
        |  FILTER(STRSTARTS(STR(?a), "blaze:history:")) }""".stripMargin)
      .collect().map(r => (r.getStruct(0).getAs[String]("str"),
        r.getStruct(1).getAs[Long]("lng"))).toSet
    assert(hist == Set(("blaze:history:added", 100L), ("blaze:history:removed", 200L)))
    // the statement itself is gone; its history remains
    assert(!Engine.query(t1, "ASK { <urn:h:x> <urn:p:hv> 1 }").first().getBoolean(0))
    // no history-of-history: the round-2 delete also removed the added-record? no —
    // history rows are excluded from capture, so exactly the two records exist
    assert(Engine.query(t1,
      "SELECT ?s WHERE { ?s <blaze:history:added> ?t }").count() == 1)
  }

  test("custom aggregates register by URI (IAggregate extension point)") {
    import graft.engine.{Aggregates, Exprs}
    import graft.model.Term
    Aggregates.register("urn:agg:median",
      (t, _) => Term.doubleLit(call_function("percentile", Exprs.fNum(t), lit(0.5))))
    Aggregates.register("urn:agg:nuniq",
      (t, distinct) => Term.intLit(
        if (distinct) countDistinct(Exprs.fId(t))
        else org.apache.spark.sql.functions.count(Exprs.fId(t))))
    try {
      val s0 = Update(store,
        """INSERT DATA { <urn:ca:a> <urn:p:cav> 1 . <urn:ca:b> <urn:p:cav> 2 .
          |  <urn:ca:c> <urn:p:cav> 2 . <urn:ca:d> <urn:p:cav> 10 . }""".stripMargin)
      // plain custom-IRI call in aggregate position (resolved via the registry)
      val m = Engine.query(s0,
        "SELECT (<urn:agg:median>(?v) AS ?m) WHERE { ?x <urn:p:cav> ?v }")
        .first().getStruct(0).getAs[Double]("num")
      assert(m == 2.0)
      // DISTINCT inside a custom ArgList parses and reaches the builder
      val nd = Engine.query(s0,
        "SELECT (<urn:agg:nuniq>(DISTINCT ?v) AS ?n) WHERE { ?x <urn:p:cav> ?v }")
        .first().getStruct(0).getAs[Long]("lng")
      assert(nd == 3L)
      // grouped + HAVING over a custom aggregate
      val rows = Engine.query(s0,
        """SELECT ?v (<urn:agg:nuniq>(?x) AS ?n) WHERE { ?x <urn:p:cav> ?v }
          |GROUP BY ?v HAVING (<urn:agg:nuniq>(?x) > 1)""".stripMargin).collect()
      assert(rows.length == 1 && rows(0).getStruct(1).getAs[Long]("lng") == 2L)
    } finally { Aggregates.unregister("urn:agg:median"); Aggregates.unregister("urn:agg:nuniq") }
    // unregistered custom aggregate fails cleanly
    val e = intercept[Exception](Engine.query(store,
      "SELECT (<urn:agg:nope>(DISTINCT ?s) AS ?n) WHERE { ?s ?p ?o }").count())
    assert(e.getMessage.contains("urn:agg:nope"))
  }

  test("RDF-star annotation syntax asserts and annotates in data and patterns") {
    val s0 = Update(store,
      """INSERT DATA {
        |  <urn:f3:m1> <urn:p:memberOf> <urn:f3:band> {| <urn:p:since> 2003 ; <urn:p:role> "bass" |} .
        |}""".stripMargin)
    assert(Engine.query(s0, "ASK { <urn:f3:m1> <urn:p:memberOf> <urn:f3:band> }").first().getBoolean(0))
    val df = Engine.query(s0,
      """SELECT ?since ?role WHERE {
        |  ?m <urn:p:memberOf> <urn:f3:band> {| <urn:p:since> ?since ; <urn:p:role> ?role |} .
        |}""".stripMargin)
    val r = df.select(col("since")("lng"), col("role")("str")).first()
    assert(r.getLong(0) == 2003L && r.getString(1) == "bass")
  }
}
