package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch main for interactive development (not part of the library API). */
object Dev {
  def session(cpus: Int = 8): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dev")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    // probe 13 (r13): Turtle-star load → BIND-sid statement-pattern lookup →
    // VARNAME/'-' subtraction → ORDER BY FunctionCall, oracled by Spark SQL
    // over the same raw parquet
    locally {
      val nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select("n_nationkey", "n_name").collect()
        .map(r => (r.getAs[Number](0).longValue, r.getString(1))).sortBy(_._1)
      val ttlx = nat.map { case (k, nm) =>
        s"""<urn:n:$k> <urn:p:name> "$nm" .
           |<< <urn:n:$k> <urn:p:name> "$nm" >> <urn:p:src> <urn:s:tpch> ;
           |   <urn:p:key> $k .""".stripMargin
      }.mkString("\n")
      val st = new model.GraftStore(spark,
        sources.Rio.readTurtle(spark, ttlx).localCheckpoint())
      val got = engine.Engine.query(st,
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?name ?k WHERE {
          |  BIND(<< ?x <urn:p:name> ?name >> AS ?sid)
          |  ?sid <urn:p:key> ?k .
          |  FILTER(?k-10 >= 0)
          |} ORDER BY xsd:integer(str(?k))""".stripMargin)
        .select(col("name")("str"), col("k")("num").cast("long")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val want = nat.filter(_._1 >= 10).map { case (k, nm) => (nm, k) }
      println(s"PROBE-R13-TTLX got=${got.length} want=${want.length} " +
        s"equal=${got.toSeq == want.toSeq} head=${got.headOption}")
      val n5 = nat.find(_._1 == 5L).map(_._2).getOrElse(nat.head._2)
      val wild = engine.Engine.query(st,
        s"""SELECT ?p WHERE { << <urn:n:5> <urn:p:name> "$n5" >> ?p ?o }""")
        .select(col("p")("str")).collect().map(_.getString(0)).sorted.toSeq
      println(s"PROBE-R13-WILDCARD preds=$wild (expect urn:p:key, urn:p:src only)")
    }
    // probe 14 (r13): solution-set UPDATE extension end-to-end, oracled by
    // Spark SQL over the raw parquet — INSERT INTO builds the set, DELETE FROM
    // evicts, INCLUDE joins the survivors back to the store
    locally {
      val st = engine.Update(model.Tpch.store(spark, "/root/testdata/sf0.001"),
        """INSERT INTO %hot SELECT ?n ?name
          |WHERE { ?n <urn:p:n_name> ?name ; <urn:p:n_nationkey> ?k } ;
          |DELETE FROM %hot SELECT ?n ?name
          |WHERE { ?n <urn:p:n_name> ?name ; <urn:p:n_nationkey> ?k . FILTER(?k < 10) }""".stripMargin)
      val got = engine.Engine.query(st,
        "SELECT ?name ?k WHERE { INCLUDE %hot . ?n <urn:p:n_nationkey> ?k } ORDER BY ?name")
        .select(col("name")("str"), col("k")("num").cast("long")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select("n_name", "n_nationkey").collect()
        .map(r => (r.getString(0), r.getAs[Number](1).longValue))
        .filter(_._2 >= 10).sortBy(_._1).toSeq
      println(s"PROBE-R13-SSETS got=${got.length} want=${want.length} equal=${got == want}")
    }
    // probe 11 (r4): geo:search service over packed literals
    locally {
      val gs = engine.Update(model.Tpch.store(spark, "/root/testdata/sf0.001"),
        """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
          |INSERT DATA { <urn:pt:x> <urn:p:pos> "2.0#3.0"^^geo:geoSpatialLiteral . }""".stripMargin)
      val n = engine.Engine.query(gs,
        """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
          |SELECT ?r WHERE { ?r geo:search "inRectangle" ; geo:predicate <urn:p:pos> ;
          |  geo:spatialRectangleSouthWest "0#0" ; geo:spatialRectangleNorthEast "5#5" }""".stripMargin)
        .count()
      println(s"PROBE-GEO-SERVICE rows=$n (expect 1)")
    }
    // probe 12 (r4): exact decimal arithmetic + aggregation end-to-end
    locally {
      val ds = engine.Update(model.Tpch.store(spark, "/root/testdata/sf0.001"),
        """INSERT DATA { <urn:acct:1> <urn:p:delta> "0.10"^^<http://www.w3.org/2001/XMLSchema#decimal> .
          |  <urn:acct:2> <urn:p:delta> 0.2 .
          |  <urn:acct:3> <urn:p:delta> 1 . }""".stripMargin)
      val r = engine.Engine.query(ds,
        """SELECT (SUM(?d) AS ?s) (AVG(?d) AS ?a) (SUM(?d)*10 AS ?s10)
          |WHERE { ?x <urn:p:delta> ?d }""".stripMargin).first()
      val (s, a, s10) = (r.getStruct(0), r.getStruct(1), r.getStruct(2))
      println(s"PROBE-DECIMAL sum=${s.getString(2)}^^${s.getString(3).split('#').last}" +
        s" avg=${a.getString(2)} s10=${s10.getString(2)}" +
        " (expect sum=1.3^^decimal avg=0.433333333333333333 s10=13)")
    }
    val store = model.Tpch.store(spark, "/root/testdata/sf0.001")
    println(s"statements: ${store.statements.count()}")
    val q1 =
      """SELECT ?n ?b WHERE {
        |  ?c a <urn:c:Customer> ;
        |     <urn:p:c_acctbal> ?b ;
        |     <urn:p:c_name> ?n .
        |  FILTER(?b > 1000)
        |} ORDER BY ?n LIMIT 10""".stripMargin
    val df = engine.Engine.query(store, q1)
    val got = df.collect().map(r => (r.getStruct(0).getString(2), r.getStruct(1).getDouble(5)))
    got.foreach { case (n, b) => println(f"GOT  $n%-22s $b%10.2f") }
    // independent oracle: Spark SQL over the raw parquet table
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .createOrReplaceTempView("customer")
    val exp = spark.sql(
      "SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 1000 ORDER BY c_name LIMIT 10")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    println("ORACLE-MATCH: " + (got.toSeq == exp.toSeq))
    // probe 1: filter that excludes everything
    val zero = engine.Engine.query(store,
      "SELECT ?n WHERE { ?c a <urn:c:Customer> ; <urn:p:c_acctbal> ?b . FILTER(?b > 1.0E12) }")
      .count()
    println(s"PROBE-EMPTY-FILTER rows=$zero")
    // probe 2: malformed query → clean parse error
    try { engine.Engine.query(store, "SELECT ?x WHERE { ?x <urn:p:broken ") }
    catch { case e: Exception => println("PROBE-PARSE-ERROR: " + e.getMessage) }
    // probe 3: type-error semantics — comparing a string column numerically → false, 0 rows
    val typeErr = engine.Engine.query(store,
      "SELECT ?n WHERE { ?c a <urn:c:Customer> ; <urn:p:c_name> ?n . FILTER(?n > 5) }").count()
    println(s"PROBE-TYPE-ERROR-FILTER rows=$typeErr (expect 0: type error → false)")
    // probe 4: unregistered SERVICE → clean error naming the IRI
    try engine.Engine.query(store, "SELECT ?x WHERE { SERVICE <urn:svc:nope> { ?x ?p ?o } }").count()
    catch { case e: Exception => println("PROBE-BAD-SERVICE: " + e.getMessage) }
    // probe 5: bds: group without bds:search → clean error
    try engine.Engine.query(store,
      "SELECT ?x WHERE { ?x <http://www.bigdata.com/rdf/search#relevance> ?r }").count()
    catch { case e: Exception => println("PROBE-BDS-NO-QUERY: " + e.getMessage) }
    // probe 6: UPDATE deleting a nonexistent statement is a no-op, not an error
    val before = store.statements.count()
    val after = engine.Update(store, "DELETE DATA { <urn:no:such> <urn:p:x> 1 . }")
      .statements.count()
    println(s"PROBE-DELETE-MISSING: $before -> $after (expect equal)")
    // probe 7 (r2): ANSI-safe arithmetic end-to-end
    val ovf = engine.Engine.query(store,
      """SELECT ?x ?inf ?err WHERE { <urn:t:nation:5> <urn:p:n_nationkey> ?k .
        |  BIND(9223372036854775807 + ?k AS ?x) BIND(-1.0e0/0.0e0 AS ?inf) BIND(5/0 AS ?err) }""".stripMargin)
      .select(col("x")("num"), col("inf")("num"), col("err")).first()
    println(s"PROBE-ANSI-ARITH: overflow->${ovf.getDouble(0)} inf->${ovf.getDouble(1)} intDiv0Null->${ovf.isNullAt(2)}")
    // probe 8 (r2): CLEAR DEFAULT keeps named graphs
    val s0 = engine.Update(store,
      "INSERT DATA { <urn:dv:1> <urn:p:v> 1 . GRAPH <urn:g:dv> { <urn:dv:2> <urn:p:v> 2 . } }")
    val cd = engine.Update(s0, "CLEAR DEFAULT")
    println(s"PROBE-CLEAR-DEFAULT: default=${cd.statements.filter(col("g").isNull).count()} " +
      s"named=${cd.statements.filter(col("g").isNotNull).count()} (expect 0 / >0)")
    // probe 9 (r4): closure-free alternation path vs Spark SQL oracle
    spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .createOrReplaceTempView("supplier")
    val altGot = engine.Engine.query(store,
      "SELECT ?x ?n WHERE { ?x (<urn:fk:c_nationkey>|<urn:fk:s_nationkey>) ?n }").count()
    val altExp = spark.sql(
      """SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer
        |UNION ALL SELECT s_nationkey FROM supplier)""".stripMargin).first().getLong(0)
    println(s"PROBE-PATH-ALT: got=$altGot exp=$altExp ORACLE-MATCH: ${altGot == altExp}")
    // probe 10 (r4): FROM NAMED-only → empty default graph
    val fnRows = engine.Engine.query(store,
      "SELECT ?s FROM NAMED <urn:nope:g> WHERE { ?s <urn:p:n_name> ?o }").count()
    println(s"PROBE-FROM-NAMED-ONLY rows=$fnRows (expect 0: empty default graph)")
    // probe 11 (r5): OWL SymmetricProperty + hasValue through the closure
    val owlSt = engine.Update(store,
      """INSERT DATA {
        |  <urn:dv:adj> a <http://www.w3.org/2002/07/owl#SymmetricProperty> .
        |  <urn:dv:a> <urn:dv:adj> <urn:dv:b> .
        |  <urn:dv:R> a <http://www.w3.org/2002/07/owl#Restriction> .
        |  <urn:dv:R> <http://www.w3.org/2002/07/owl#onProperty> <urn:dv:fuel> .
        |  <urn:dv:R> <http://www.w3.org/2002/07/owl#hasValue> <urn:dv:battery> .
        |  <urn:dv:t> a <urn:dv:R> . }""".stripMargin)
    val owlC = inference.Rdfs.closure(owlSt)
    val sym = engine.Engine.query(owlC, "ASK { <urn:dv:b> <urn:dv:adj> <urn:dv:a> }")
      .first().getBoolean(0)
    val hv = engine.Engine.query(owlC, "ASK { <urn:dv:t> <urn:dv:fuel> <urn:dv:battery> }")
      .first().getBoolean(0)
    println(s"PROBE-OWL-R5: symmetric=$sym hasValue=$hv (expect true true)")
    // probe 12 (r5): compat-join decomposition exactness (OPTIONAL after UNION)
    val cj = engine.Engine.query(store,
      """SELECT ?x ?z WHERE {
        |  { VALUES ?x { 1 } } UNION { BIND("y" AS ?tag) }
        |  OPTIONAL { VALUES (?x ?z) { (1 10) (7 70) } } }""".stripMargin).count()
    println(s"PROBE-COMPAT-LEFTJOIN rows=$cj (expect 3)")
    // probe 13 (r6): geo customFieldsValues binds the ORIGINAL packed lexicals
    locally {
      val gs = engine.Update(model.Tpch.store(spark, "/root/testdata/sf0.001"),
        """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
          |INSERT DATA { <urn:cfv:x> <urn:p:pos6> "2#3#0#7#0.5"^^geo:geoSpatialLiteral .
          |  <urn:cfv:bad> <urn:p:pos6> "1#1"^^geo:geoSpatialLiteral . }""".stripMargin)
      val cv = engine.Engine.query(gs,
        """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
          |SELECT ?cv WHERE { ?r geo:search "inRectangle" ; geo:predicate <urn:p:pos6> ;
          |  geo:spatialRectangleSouthWest "0#0" ; geo:spatialRectangleNorthEast "5#5" ;
          |  geo:customFields "sev#conf" ; geo:customFieldsLowerBounds "0#0" ;
          |  geo:customFieldsValues ?cv }""".stripMargin)
        .select(col("cv")("str")).collect().map(_.getString(0)).toSeq
      println(s"PROBE-GEO-CFV: $cv (expect List(7#0.5) — raw lexicals; short literal skipped, not a crash)")
      val arity = try {
        engine.Engine.query(gs,
          """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
            |SELECT ?r WHERE { ?r geo:search "inRectangle" ; geo:predicate <urn:p:pos6> ;
            |  geo:spatialRectangleSouthWest "0#0" ; geo:spatialRectangleNorthEast "5#5" ;
            |  geo:customFields "sev" ; geo:customFieldsLowerBounds "1#2#3" }""".stripMargin).count()
        "NO ERROR (bad)"
      } catch { case e: IllegalArgumentException => e.getMessage }
      println(s"PROBE-GEO-ARITY: $arity (expect arity message naming customFieldsLowerBounds)")
    }
    // probe 14 (r6): hasValue fires on rdfs9-DERIVED restriction membership
    locally {
      val s6 = engine.Update(store,
        """INSERT DATA {
          |  <urn:r6:EV> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:r6:Plugin> .
          |  <urn:r6:Plugin> a <http://www.w3.org/2002/07/owl#Restriction> .
          |  <urn:r6:Plugin> <http://www.w3.org/2002/07/owl#onProperty> <urn:r6:charge> .
          |  <urn:r6:Plugin> <http://www.w3.org/2002/07/owl#hasValue> <urn:r6:socket> .
          |  <urn:r6:bolt> a <urn:r6:EV> . }""".stripMargin)
      val hv2 = engine.Engine.query(inference.Rdfs.closure(s6),
        "ASK { <urn:r6:bolt> <urn:r6:charge> <urn:r6:socket> }").first().getBoolean(0)
      println(s"PROBE-OWL-HASVALUE-2ND: $hv2 (expect true)")
    }
    // probe 15 (r6): lexicon cache invalidation — a store REBUILT at the same
    // path must not be served the previous build's lexicon
    locally {
      import org.apache.spark.sql.functions.lit
      val lexP = "/tmp/graft-dev-lexgen-lexicon"
      def tiny(o: String) = model.GraftStore.assemble(
        spark.range(1).select(
          model.Term.iri("urn:lg:s").as("s"), model.Term.iri("urn:lg:p").as("p"),
          model.Term.iri(o).as("o"), model.Term.nullTerm.as("g"),
          lit(model.GraftStore.STYPE_EXPLICIT).as("stype")))
      def rmLex(): Unit = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(lexP), true)
      rmLex()
      val a = new model.GraftStore(spark, tiny("urn:lg:OLD"), Some(lexP))
      val sawOld = a.nodeTerms.filter(col("n")("str") === "urn:lg:OLD").count() == 1
      rmLex() // namespace recreate: at-rest store+lexicon dropped, same path reused
      val b = new model.GraftStore(spark, tiny("urn:lg:NEW"), Some(lexP))
      val sawNew = b.nodeTerms.filter(col("n")("str") === "urn:lg:NEW").count() == 1
      val stale = b.nodeTerms.filter(col("n")("str") === "urn:lg:OLD").count() > 0
      println(s"PROBE-LEX-REGEN: first=$sawOld rebuilt=$sawNew stale=$stale (expect true true false)")
    }
    // probe 16 (r6): Graph Store Protocol over real HTTP
    locally {
      import java.net.URI
      import java.net.http.{HttpClient, HttpRequest, HttpResponse}
      val srv = new server.SparqlServer(store).start()
      try {
        val base = s"http://127.0.0.1:${srv.boundPort}"
        val client = HttpClient.newHttpClient()
        def send(m: String, url: String, body: String, ct: String) =
          client.send(HttpRequest.newBuilder(URI.create(url)).header("Content-Type", ct)
            .method(m, HttpRequest.BodyPublishers.ofString(body)).build(),
            HttpResponse.BodyHandlers.ofString())
        val g = s"$base/sparql/gsp?graph=urn:g:devgsp"
        val put = send("PUT", g, "<urn:dgsp:a> <urn:p:v> \"1\" .", "application/n-triples").statusCode()
        val got = send("GET", g, "", "text/plain").body()
        val post = send("POST", g, "<urn:dgsp:b> <urn:p:v> \"2\" .", "application/n-triples").statusCode()
        val got2 = send("GET", g, "", "text/plain").body()
        val del = send("DELETE", g, "", "text/plain").statusCode()
        val got3 = send("GET", g, "", "text/plain").body().trim
        println(s"PROBE-GSP: put=$put getA=${got.contains("urn:dgsp:a")} post=$post " +
          s"getB=${got2.contains("urn:dgsp:b")} del=$del emptyAfter=${got3.isEmpty} " +
          "(expect 200 true 200 true 200 true)")
      } finally srv.stop()
    }
    // probe (r6): event-log operators end-to-end over real testdata
    locally {
      val ev0 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      // ts is epoch-nanos LONG (old testdata generations) or TIMESTAMP[µs] (new)
      val ev = ev0.withColumn("ts_us", pipeline.Events.tsEpochUs(ev0.schema("ts").dataType))
      val sess = pipeline.Events.sessionize(ev, "user_id", "ts_us",
        gapSec = 1800, tsPerSec = 1000000L)
      val nSess = sess.count()
      val nEv = sess.agg(org.apache.spark.sql.functions.sum("n_events")).first().getLong(0)
      val hh = pipeline.TextStats.heavyHitters(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", 3)
        .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(",")
      println(s"PROBE-EVENTS sessions=$nSess coveredEvents=$nEv " +
        s"(expect coveredEvents = event count) topTokens=$hh")
    }
    // probe 17 (r10): bds:searchInSearch keeps incoming bindings whose subject
    // links to a full-text hit; oracle = Spark SQL over the raw parquet
    locally {
      val bds = "http://www.bigdata.com/rdf/search#"
      val sisGot = engine.Engine.query(store,
        s"""SELECT (COUNT(*) AS ?cnt) WHERE { ?c a <urn:c:Customer> .
           |  SERVICE <${bds}searchInSearch> {
           |    ?c <${bds}searchInSearch> "automobile" . } }""".stripMargin)
        .first().getStruct(0).getAs[Long]("lng")
      val sisExp = spark.sql(
        "SELECT COUNT(*) FROM customer WHERE c_mktsegment = 'AUTOMOBILE'")
        .first().getLong(0)
      println(s"PROBE-SEARCH-IN-SEARCH: got=$sisGot exp=$sisExp ORACLE-MATCH: ${sisGot == sisExp}")
    }
    // probe 18 (r12): delta truth maintenance consumes ACTUAL change buffers —
    // a phantom re-insert of an existing axiom must not mask retraction, and
    // the DRed path (not the fixpoint recompute) must be the one that ran
    locally {
      val s12 = engine.Update(store,
        """INSERT DATA {
          |  <urn:r12:X> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:r12:Y> .
          |  <urn:r12:nm> <http://www.w3.org/2000/01/rdf-schema#domain> <urn:r12:X> .
          |  <urn:r12:u> <urn:r12:nm> "v" . }""".stripMargin)
      val closed = inference.Rdfs.materialize(inference.Rdfs.closure(s12))
      val tm = engine.Update.withTruthMaintenance(closed,
        """DELETE { <urn:r12:u> <urn:r12:nm> "v" . }
          |INSERT { <urn:r12:X> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:r12:Y> . }
          |WHERE { }""".stripMargin)
      val staleY = engine.Engine.query(tm, "ASK { <urn:r12:u> a <urn:r12:Y> }")
        .first().getBoolean(0)
      val staleX = engine.Engine.query(tm, "ASK { <urn:r12:u> a <urn:r12:X> }")
        .first().getBoolean(0)
      println(s"PROBE-TM-PHANTOM-REINSERT: path=${inference.Rdfs.lastTmPath} " +
        s"staleTypeX=$staleX staleTypeY=$staleY (expect delta false false)")
    }
    // probe 19 (r12): transitive delta cone — an at-rest store with a
    // transitive chain takes the DELTA path on an edge delete and retracts
    // exactly the unreachable closure pairs (alternate-path pair survives)
    locally {
      val s19 = engine.Update(store,
        """INSERT DATA {
          |  <urn:r19:anc> a <http://www.w3.org/2002/07/owl#TransitiveProperty> .
          |  <urn:r19:a> <urn:r19:anc> <urn:r19:b> .
          |  <urn:r19:b> <urn:r19:anc> <urn:r19:c> .
          |  <urn:r19:c> <urn:r19:anc> <urn:r19:d> .
          |  <urn:r19:a> <urn:r19:anc> <urn:r19:x> .
          |  <urn:r19:x> <urn:r19:anc> <urn:r19:c> . }""".stripMargin)
      val closed = inference.Rdfs.materialize(inference.Rdfs.closure(s19))
      val tm = engine.Update.withTruthMaintenance(closed,
        "DELETE DATA { <urn:r19:a> <urn:r19:anc> <urn:r19:b> . }")
      val ac = engine.Engine.query(tm, "ASK { <urn:r19:a> <urn:r19:anc> <urn:r19:c> }")
        .first().getBoolean(0) // survives via a→x→c
      val ad = engine.Engine.query(tm, "ASK { <urn:r19:a> <urn:r19:anc> <urn:r19:d> }")
        .first().getBoolean(0) // survives via a→x→c→d
      val bd = engine.Engine.query(tm, "ASK { <urn:r19:b> <urn:r19:anc> <urn:r19:d> }")
        .first().getBoolean(0) // untouched chain suffix
      val ab = engine.Engine.query(tm, "ASK { <urn:r19:a> <urn:r19:anc> <urn:r19:b> }")
        .first().getBoolean(0) // the deleted edge itself
      println(s"PROBE-TM-TRANS-CONE: path=${inference.Rdfs.lastTmPath} " +
        s"ac=$ac ad=$ad bd=$bd ab=$ab (expect delta true true true false)")
    }
    // flagship smoke (driver contract)
    val flag = SparkEntry.entry(spark)
    println(s"ENTRY-ROWS: ${flag.count()}")
    flag.show(3, truncate = false)
    // plan inspection: partition pruning + pushdown on a pattern scan
    println("=== PLAN: scan with p + o constants ===")
    engine.Engine.query(store,
      "SELECT ?c WHERE { ?c <urn:p:c_mktsegment> \"BUILDING\" }").explain("formatted")
    // bucketed-store co-located join demo
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_dev")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path("spark-warehouse/graft_bucketed_dev"), true)
    model.GraftStore.saveBucketed(store.statements, "graft_bucketed_dev", 8)
    val bt = spark.table("graft_bucketed_dev")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bj = bt.filter(col("p_id") === engine.TermIds.iriId("urn:p:c_name")).select(col("s_id"), col("o").as("n"))
      .join(bt.filter(col("p_id") === engine.TermIds.iriId("urn:p:c_acctbal")).select(col("s_id"), col("o").as("b")), "s_id")
    val bplan = bj.queryExecution.executedPlan.toString
    println("BUCKETED-JOIN shuffle-free: " + !bplan.contains("Exchange hashpartitioning") +
      s" rows=${bj.count()}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    println("=== PLAN: star join + agg ===")
    engine.Engine.query(store,
      """SELECT ?rf (SUM(?qty) AS ?sq) WHERE { ?l <urn:p:l_returnflag> ?rf ;
        |<urn:p:l_quantity> ?qty } GROUP BY ?rf""".stripMargin).explain("formatted")
    spark.stop()
  }
}

/** Scratch: chained-TM plan growth inspection (round 12). */
object DevChain {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val st0 = engine.Update(model.Tpch.store(spark, "/root/testdata/sf0.001"),
      """INSERT DATA {
        |  <urn:cc:B> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:cc:A> .
        |  <urn:cc:u1> a <urn:cc:B> . <urn:cc:u2> a <urn:cc:B> . <urn:cc:u3> a <urn:cc:B> .
        |}""".stripMargin)
    model.GraftStore.save(inference.Rdfs.closure(st0).statements, "/tmp/graft-devchain")
    var cur = model.GraftStore.load(spark, "/tmp/graft-devchain")
    for (i <- 1 to 8) {
      val t0 = System.nanoTime()
      cur = engine.Update.withTruthMaintenance(cur,
        if (i <= 3) s"DELETE DATA { <urn:cc:u$i> a <urn:cc:B> . }"
        else s"DELETE DATA { <urn:t:customer:${i - 4}> a <urn:c:Customer> . }")
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = cur.statements
        .filter(org.apache.spark.sql.functions.col("stype") === model.GraftStore.STYPE_INFERRED)
        .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      val leaves = plan.collectLeaves()
      println(f"CHAIN step=$i sec=$sec%.2f path=${inference.Rdfs.lastTmPath} " +
        s"depth=${inference.Rdfs.tombstoneDepth(cur)} joins=${joins.size} " +
        s"leaves=${leaves.size} planNodes=${plan.collect { case p => p }.size}")
    }
    spark.stop()
  }
}
