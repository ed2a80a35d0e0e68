package graft

import graft.engine.{Engine, SparqlResults, Update}
import graft.model.{GraftStore, Term}
import graft.pipeline.Multimodal
import graft.search.{Geo, TextIndex}
import graft.sources.Rio
import graft.streaming.Streams
import org.apache.spark.sql.functions._

class FeatureSpec extends GraftSuite {
  private val ss = SharedSpark.spark
  import ss.implicits._

  // ---- SPARQL UPDATE ----
  test("insert data / delete data / modify / clear") {
    val s0 = Update(store, "INSERT DATA { <urn:x:1> a <urn:c:Thing> ; <urn:p:v> 42 . }")
    assert(Engine.query(s0, "ASK { <urn:x:1> <urn:p:v> 42 }").first().getBoolean(0))
    val s1 = Update(s0, "DELETE DATA { <urn:x:1> <urn:p:v> 42 . }")
    assert(!Engine.query(s1, "ASK { <urn:x:1> <urn:p:v> 42 }").first().getBoolean(0))
    val s2 = Update(s0,
      "DELETE { ?s <urn:p:v> ?o } INSERT { ?s <urn:p:v2> ?o } WHERE { ?s <urn:p:v> ?o . FILTER(?o = 42) }")
    assert(Engine.query(s2, "ASK { <urn:x:1> <urn:p:v2> 42 }").first().getBoolean(0))
    assert(!Engine.query(s2, "ASK { <urn:x:1> <urn:p:v> ?o }").first().getBoolean(0))
    val s3 = Update.applyOp(s0, graft.sparql.Ast.ClearGraph(Some("urn:g:nation")))
    assert(Engine.query(s3, "SELECT ?s WHERE { GRAPH <urn:g:nation> { ?s ?p ?o } }").count() == 0)
  }

  test("insert is idempotent (no duplicate statements)") {
    val s0 = Update(store, "INSERT DATA { <urn:x:2> <urn:p:v> 1 . }")
    val s1 = Update(s0, "INSERT DATA { <urn:x:2> <urn:p:v> 1 . }")
    assert(s1.statements.count() == s0.statements.count())
  }

  // ---- RIO N-Triples/N-Quads ----
  test("nquads roundtrip preserves term identity") {
    val lines = Seq(
      """<urn:s:1> <urn:p:a> "plain" <urn:g:x> .""",
      """<urn:s:1> <urn:p:b> "5"^^<http://www.w3.org/2001/XMLSchema#int> .""",
      """<urn:s:1> <urn:p:c> "hi there\n2nd line"@en-US .""",
      """_:b0 <urn:p:d> <urn:s:1> .""",
      "# comment", "").toDS()
    val st = Rio.statementsFromLines(lines)
    assert(st.count() == 4)
    // authored int-family datatype preserved (distinct term from xsd:integer —
    // the reference's DTE-carrying inline IVs), numeric value still inlined
    val intRow = st.filter(col("p")("str") === "urn:p:b").select("o").first().getStruct(0)
    assert(intRow.getAs[String]("dt") == Term.XSD + "int" && intRow.getAs[Long]("lng") == 5L)
    // dump → reparse → same id triples
    val dumped = Rio.toNQuadLines(st).as[String]
    val back = Rio.statementsFromLines(dumped)
    val orig = st.select(col("s")("id"), col("p")("id"), col("o")("id")).collect().toSet
    val rt = back.select(col("s")("id"), col("p")("id"), col("o")("id")).collect().toSet
    assert(rt == orig)
  }

  // ---- statement-pattern utility services (bd:sample / bd:slice / bd:values) ----
  test("bd:sample (DENSE/EVEN/RANDOM), bd:slice (offset+limit / range), bd:values") {
    val t = (1 to 6).map(i => (s"urn:s:$i", s"v$i")).toDF("si", "vv")
      .select(Term.iri(col("si")).as("s"), Term.iri("urn:p:x").as("p"),
        Term.strLit(col("vv")).as("o"), Term.nullTerm.as("g"),
        lit(0).cast("byte").as("stype"))
    val st = GraftStore.cached(spark, t)
    val bd = "http://www.bigdata.com/rdf#"
    def q(body: String) = Engine.query(st, body).collect()
    def svc(params: String) =
      s"""SELECT ?v WHERE { SERVICE <${bd}sample> {
         |  ?s <urn:p:x> ?v . $params } }""".stripMargin
    // DENSE with limit >= population = the full set; limit 3 = a 3-prefix
    assert(q(svc(s"<${bd}serviceParam> <${bd}sample.limit> 100 . " +
      s"""<${bd}serviceParam> <${bd}sample.sampleType> "DENSE" .""")).length == 6)
    val dense3 = q(svc(s"<${bd}serviceParam> <${bd}sample.limit> 3 . " +
      s"""<${bd}serviceParam> <${bd}sample.sampleType> "DENSE" ."""))
    assert(dense3.length == 3)
    // EVEN strides to the limit; RANDOM is deterministic under a fixed seed
    assert(q(svc(s"<${bd}serviceParam> <${bd}sample.limit> 3 . " +
      s"""<${bd}serviceParam> <${bd}sample.sampleType> "EVEN" .""")).length == 3)
    val r1 = q(svc(s"<${bd}serviceParam> <${bd}sample.limit> 2 . " +
      s"<${bd}serviceParam> <${bd}sample.seed> 7 ."))
    val r2 = q(svc(s"<${bd}serviceParam> <${bd}sample.limit> 2 . " +
      s"<${bd}serviceParam> <${bd}sample.seed> 7 ."))
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq && r1.length == 2)
    // slice: two disjoint pages that cover a 4-row window; range binds the count
    def slice(off: Int, lim: Int) = q(
      s"""SELECT ?v WHERE { SERVICE <${bd}slice> { ?s <urn:p:x> ?v .
         |  <${bd}serviceParam> <${bd}slice.offset> $off .
         |  <${bd}serviceParam> <${bd}slice.limit> $lim . } }""".stripMargin)
      .map(_.getStruct(0).getAs[String]("str")).toSet
    val (p1, p2) = (slice(0, 2), slice(2, 2))
    assert(p1.size == 2 && p2.size == 2 && (p1 & p2).isEmpty)
    val rc = q(
      s"""SELECT ?n WHERE { SERVICE <${bd}slice> { ?s <urn:p:x> ?v .
         |  <${bd}serviceParam> <${bd}slice.range> ?n . } }""".stripMargin)
    assert(rc.length == 1 && rc(0).getStruct(0).getAs[Long]("lng") == 6L)
    // values: two rows binding ?v, joined against the pattern
    val vj = q(
      s"""SELECT ?s WHERE { SERVICE <${bd}values> {
         |  <${bd}serviceParam> <${bd}values.var> ?v .
         |  <${bd}serviceParam> <${bd}values.val> "v2" .
         |  <${bd}serviceParam> <${bd}values.val> "v5" . }
         |  ?s <urn:p:x> ?v . }""".stripMargin)
    assert(vj.map(_.getStruct(0).getAs[String]("str")).toSet ==
      Set("urn:s:2", "urn:s:5"))
  }

  test("bds:searchInSearch filters incoming bindings by linked-literal match") {
    val bds = "http://www.bigdata.com/rdf/search#"
    val t = Seq(
      ("urn:d:1", "spark joins merge batches"),
      ("urn:d:2", "spark only here"),
      ("urn:d:3", "nothing relevant at all")
    ).toDF("si", "txt").select(Term.iri(col("si")).as("s"),
      Term.iri("urn:p:text").as("p"), Term.strLit(col("txt")).as("o"),
      Term.nullTerm.as("g"), lit(0).cast("byte").as("stype"))
    val st = GraftStore.cached(spark, t)
    val out = Engine.query(st,
      s"""SELECT ?s WHERE { ?s <urn:p:text> ?t .
         |  SERVICE <${bds}searchInSearch> { ?s <${bds}searchInSearch> "spark" } }""".stripMargin)
      .collect().map(_.getStruct(0).getAs[String]("str")).toSet
    assert(out == Set("urn:d:1", "urn:d:2"))
    // standalone (no incoming bindings) is rejected, not silently empty
    val e = intercept[Exception](Engine.query(st,
      s"""SELECT ?s WHERE { SERVICE <${bds}searchInSearch> {
         |  ?s <${bds}searchInSearch> "spark" } }""".stripMargin).collect())
    assert(e.getMessage.contains("incoming bindings"))
  }

  // ---- full-text search ----
  test("text index ranks multi-term matches and respects matchAllTerms") {
    val t = Seq(
      ("urn:d:1", "spark joins merge batches"),
      ("urn:d:2", "spark only here"),
      ("urn:d:3", "nothing relevant at all")
    ).toDF("si", "txt").select(Term.iri(col("si")).as("s"),
      Term.iri("urn:p:text").as("p"), Term.strLit(col("txt")).as("o"),
      Term.nullTerm.as("g"), lit(0).cast("byte").as("stype"))
    val st = GraftStore.cached(spark, t)
    val idx = TextIndex.build(st)
    val all = idx.search("spark merge", matchAllTerms = true).collect()
    assert(all.length == 1 && all(0).getStruct(0).getAs[String]("str").contains("merge"))
    val any = idx.search("spark merge").collect()
    assert(any.length == 2)
    assert(any.map(_.getAs[Int]("rank")).toSeq.sorted == Seq(1, 2))
  }

  test("bds:prefixMatch and bds:matchRegex search modes") {
    val t = Seq(
      ("urn:pm:1", "sparkling water dispenser"),
      ("urn:pm:2", "spark executors at work"),
      ("urn:pm:3", "nothing relevant")
    ).toDF("si", "txt").select(Term.iri(col("si")).as("s"),
      Term.iri("urn:p:text").as("p"), Term.strLit(col("txt")).as("o"),
      Term.nullTerm.as("g"), lit(0).cast("byte").as("stype"))
    val st = GraftStore.cached(spark, t)
    val idx = TextIndex.build(st)
    // exact term "spark" hits only doc 2; prefix match also hits "sparkling"
    assert(idx.search("spark").count() == 1)
    val pref = idx.search("spark", prefixMatch = true).collect()
    assert(pref.length == 2)
    // matchAllTerms composes with prefix semantics (each QUERY term must match)
    assert(idx.search("spark disp", prefixMatch = true, matchAllTerms = true).count() == 1)
    // regex runs against the whole literal
    val re = idx.search("spark(ling)? \\w+", matchRegex = true).collect()
    assert(re.length == 2)
    // and through the SPARQL magic predicates
    val viaSparql = Engine.query(st,
      """PREFIX bds: <http://www.bigdata.com/rdf/search#>
        |SELECT ?lit WHERE { ?lit bds:search "spark" ; bds:prefixMatch "true" }""".stripMargin)
    assert(viaSparql.count() == 2)
  }

  test("bds magic predicates bind literals through the engine") {
    val df = Engine.query(store,
      """SELECT ?name ?r WHERE {
        |  ?name <http://www.bigdata.com/rdf/search#search> "BUILDING" ;
        |        <http://www.bigdata.com/rdf/search#relevance> ?r .
        |} LIMIT 5""".stripMargin)
    assert(df.count() > 0)
  }

  // ---- geospatial ----
  test("haversine and circle/rectangle filters") {
    val pts = Seq((1L, 48.8566, 2.3522), (2L, 51.5074, -0.1278), (3L, -33.86, 151.2))
      .toDF("id", "lat", "lon")
    // Paris–London ≈ 343 km
    val d = pts.filter(col("id") === 1)
      .select(Geo.haversineMeters(col("lat"), col("lon"), lit(51.5074), lit(-0.1278)))
      .first().getDouble(0)
    assert(math.abs(d - 343000) < 2000)
    val inC = pts.filter(Geo.inCircle(col("lat"), col("lon"), 48.8566, 2.3522, 400000))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inC == Set(1L, 2L))
    val inR = pts.filter(Geo.inRectangle(col("lat"), col("lon"), 40, -10, 55, 10))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inR == Set(1L, 2L))
    // z-order: nearby points share high bits
    val z = pts.select(Geo.zorder(col("lat"), col("lon"))).collect().map(_.getLong(0))
    assert(z.distinct.length == 3)
  }

  // ---- gas service through SPARQL ----
  test("gas:service CC over fk edges") {
    val df = Engine.query(store,
      """SELECT ?v ?c WHERE {
        |  SERVICE <http://www.bigdata.com/rdf/gas#service> {
        |    ?x <http://www.bigdata.com/rdf/gas#program> "CC" ;
        |       <http://www.bigdata.com/rdf/gas#linkType> <urn:fk:n_regionkey> ;
        |       <http://www.bigdata.com/rdf/gas#out> ?v ;
        |       <http://www.bigdata.com/rdf/gas#out1> ?c } }""".stripMargin)
    // nations+regions form 5 components (one per region)
    assert(df.select(col("c")("lng")).distinct().count() == 5)
  }

  // ---- serializers ----
  test("sparql json/xml/csv/tsv serializers") {
    val df = Engine.query(store,
      """SELECT ?name ?bal WHERE { ?c <urn:p:c_name> ?name ; <urn:p:c_acctbal> ?bal }
        |ORDER BY ?name LIMIT 2""".stripMargin)
    val json = SparqlResults.toJson(df)
    assert(json.startsWith("""{"head":{"vars":["name","bal"]}"""))
    assert(json.contains(""""type":"literal""""))
    assert(json.contains("XMLSchema#double"))
    val xml = SparqlResults.toXml(df)
    assert(xml.contains("<variable name=\"name\"/>") && xml.contains("<literal"))
    val csv = SparqlResults.toCsv(df)
    assert(csv.startsWith("name,bal\n") && csv.linesIterator.size == 3)
    val tsv = SparqlResults.toTsv(df)
    assert(tsv.startsWith("?name\t?bal\n") && tsv.contains("^^<"))
  }

  // ---- multimodal ----
  test("multimodal meta/features/frames plumbing is deterministic") {
    val docs = Seq((1L, "hello world"), (2L, "other content")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.withPayload(docs, "text"), "payload")
    val m1 = meta.filter(col("doc_id") === 1).select("meta").first().getStruct(0)
    assert(m1.getAs[Long]("n_bytes") == 11L)
    assert(Seq("jpeg", "png", "wav", "mp4").contains(m1.getAs[String]("format")))
    val f = Multimodal.extractFeatures(Multimodal.withPayload(docs, "text"), "payload", 8)
    val v1 = f.filter(col("doc_id") === 1).select("features").first().getSeq[Float](0)
    assert(v1.length == 8)
    val v1again = Multimodal.extractFeatures(Multimodal.withPayload(docs, "text"), "payload", 8)
      .filter(col("doc_id") === 1).select("features").first().getSeq[Float](0)
    assert(v1 == v1again)
    val frames = Multimodal.frameSample(Multimodal.withPayload(docs, "text"), "payload", 3)
    assert(frames.count() == 6)
    // resize: output bytes follow the stub's size law (floor 16, capped by source)
    val rs = Multimodal.resize(Multimodal.withPayload(docs, "text"), "payload", 512, 512)
      .filter(col("doc_id") === 1)
      .select(length(col("resized")), col("resized_width")).first()
    assert(rs.getInt(0) == 16) // 11-byte payload → 16-byte floor (zero-padded)
    assert(rs.getInt(1) == 512)
  }

  test("multimodal REAL image decode/resize/features via JDK ImageIO") {
    // build a real 32×16 PNG in-test: red left half, blue right half
    val src = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 16)
      src.setRGB(x, y, if (x < 16) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val png = bos.toByteArray
    val docs = Seq((1L, png), (2L, "not an image".getBytes)).toDF("doc_id", "payload")
    // decode: real header metadata for the PNG, stub for the text payload
    val meta = Multimodal.decodeMeta(docs, "payload")
    val m1 = meta.filter(col("doc_id") === 1).select("meta").first().getStruct(0)
    assert(m1.getAs[String]("format") == "png")
    assert(m1.getAs[Int]("width") == 32 && m1.getAs[Int]("height") == 16)
    // resize: output is a real PNG with the target dimensions
    val rs = Multimodal.resize(docs, "payload", 8, 8)
      .filter(col("doc_id") === 1).select("resized").first().getAs[Array[Byte]](0)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rs))
    assert(back.getWidth == 8 && back.getHeight == 8)
    // features: luminance grid — red half darker than pure white, deterministic
    val f1 = Multimodal.extractFeatures(docs, "payload", 16)
      .filter(col("doc_id") === 1).select("features").first().getSeq[Float](0)
    val f2 = Multimodal.extractFeatures(docs, "payload", 16)
      .filter(col("doc_id") === 1).select("features").first().getSeq[Float](0)
    assert(f1 == f2 && f1.length == 16)
    // red luminance (≈76) vs blue (≈29): left cells brighter than right cells
    assert(f1.head > f1.last)
  }

  test("multimodal REAL audio metadata via JDK javax.sound.sampled") {
    // build a real 0.5 s mono 8 kHz 16-bit PCM WAV in-test (4000 frames)
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](4000 * 2)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 4000L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val docs = Seq((1L, wav), (2L, "not audio".getBytes)).toDF("doc_id", "payload")
    val meta = Multimodal.decodeMeta(docs, "payload")
    val m1 = meta.filter(col("doc_id") === 1).select("meta").first().getStruct(0)
    assert(m1.getAs[String]("format") == "wave")
    assert(m1.getAs[Long]("duration_ms") == 500L)
    assert(m1.getAs[Long]("n_bytes") == wav.length.toLong)
    // frame sampling rides the real duration: 4 frames at 0/125/250/375 ms
    val offs = Multimodal.frameSample(docs.filter(col("doc_id") === 1), "payload", 4)
      .select("frame_offset_ms").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == Seq(0L, 125L, 250L, 375L))
  }

  test("multimodal REAL video container metadata (MP4 + WebM headers)") {
    // minimal ISO-BMFF: ftyp + moov{ mvhd(v0, timescale=1000, duration=2500)
    // + trak{ tkhd(v0, 640x360 as 16.16 fixed) } } — header-only, no media
    val mp4 = {
      val bb = java.nio.ByteBuffer.allocate(16 + 8 + 28 + 100)
      bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      bb.putInt(8 + 28 + 100).put("moov".getBytes)
      bb.putInt(28).put("mvhd".getBytes)
        .putInt(0).putInt(0).putInt(0) // ver/flags, ctime, mtime
        .putInt(1000).putInt(2500)     // timescale, duration
      bb.putInt(100).put("trak".getBytes)
      bb.putInt(92).put("tkhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(1).putInt(0) // hdr,times,id,res
        .putInt(2500).putLong(0L)                          // duration, reserved
        .putShort(0).putShort(0).putShort(0).putShort(0)   // layer/alt/vol/res
      (0 until 9).foreach(_ => bb.putInt(0))               // matrix
      bb.putInt(640 << 16).putInt(360 << 16)               // width, height 16.16
      bb.array()
    }
    // minimal WebM: EBML{DocType="webm"} + Segment{ Info{ TimecodeScale=1e6,
    // Duration=2500.0f } Tracks{ TrackEntry{ Video{ 320x240 } } } }
    val webm = {
      val hex = "1A45DFA3" + "87" + "4282" + "84" + "7765626D" + // "webm"
        "18538067" + "A4" +
        "1549A966" + "8E" +
        "2AD7B1" + "83" + "0F4240" +
        "4489" + "84" + "451C4000" + // 2500.0f
        "1654AE6B" + "8C" +
        "AE" + "8A" +
        "E0" + "88" +
        "B0" + "82" + "0140" + // 320
        "BA" + "82" + "00F0"   // 240
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    val docs = Seq((1L, mp4), (2L, webm), (3L, "not video".getBytes))
      .toDF("doc_id", "payload")
    val meta = Multimodal.decodeMeta(docs, "payload")
    val m1 = meta.filter(col("doc_id") === 1).select("meta").first().getStruct(0)
    assert(m1.getAs[String]("format") == "mp4")
    assert(m1.getAs[Long]("duration_ms") == 2500L)
    assert(m1.getAs[Int]("width") == 640 && m1.getAs[Int]("height") == 360)
    val m2 = meta.filter(col("doc_id") === 2).select("meta").first().getStruct(0)
    assert(m2.getAs[String]("format") == "webm")
    assert(m2.getAs[Long]("duration_ms") == 2500L)
    assert(m2.getAs[Int]("width") == 320 && m2.getAs[Int]("height") == 240)
    // frame sampling rides the parsed duration
    val offs = Multimodal.frameSample(docs.filter(col("doc_id") === 2), "payload", 5)
      .select("frame_offset_ms").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == Seq(0L, 500L, 1000L, 1500L, 2000L))
  }

  // ---- streaming ----
  test("incremental triple ingest via structured streaming") {
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
    val holder = new Streams.StreamingStore(spark, store)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = holder.start(mem.toDS(), dir)
    mem.addData("<urn:stream:1> <urn:p:v> \"7\"^^<http://www.w3.org/2001/XMLSchema#integer> .")
    q.processAllAvailable()
    assert(Engine.query(holder.store, "ASK { <urn:stream:1> <urn:p:v> 7 }")
      .first().getBoolean(0))
    q.stop()
  }

  test("streaming ingest with incremental closure maintenance") {
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
    val holder = new Streams.StreamingStore(spark, store, maintainClosure = true)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cl").toString
    val q = holder.start(mem.toDS(), dir)
    // arriving schema + instance triples entail a type within the same micro-batch
    mem.addData(
      "<urn:stream:C> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:c:Any> .",
      "<urn:stream:i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:stream:C> .")
    q.processAllAvailable()
    assert(Engine.query(holder.store, "ASK { <urn:stream:i> a <urn:c:Any> }")
      .first().getBoolean(0))
    q.stop()
  }

  test("windowed event stats and sessionization run on a stream") {
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val stats = Streams.windowedEventStats(
      mem.toDF().toDF("ts", "event_type", "value"), "1 minute", "1 hour")
    val q = stats.writeStream.format("memory").queryName("winstats")
      .outputMode("update").start()
    mem.addData((java.sql.Timestamp.valueOf("2026-01-01 10:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 10:20:00"), "click", 2.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM winstats").collect()
    assert(rows.exists(r => r.getAs[Long]("cnt") == 2L && r.getAs[Double]("sum_value") == 3.0))
    q.stop()

    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev](spark)
    val sess = Streams.sessionize(mem2.toDS())
    val q2 = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    mem2.addData(Streams.Ev(7L, 1.5), Streams.Ev(7L, 2.5), Streams.Ev(8L, 1.0))
    q2.processAllAvailable()
    val s7 = spark.sql("SELECT * FROM sessions WHERE userId = 7").collect()
    assert(s7.exists(r => r.getAs[Long]("nEvents") == 2L && r.getAs[Double]("totalValue") == 4.0))
    q2.stop()
  }

  test("streaming doc-pipeline stage: features + watermark-bounded exact dedup") {
    import org.apache.spark.sql.functions.col
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val staged = Streams.streamingExactDedup(
      Streams.docFeatures(docs), "ts", "text", "10 minutes")
    val q = staged.writeStream.format("memory").queryName("docstage")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    mem.addData(
      (t0, 1L, "the quick brown fox jumps over the lazy dog"),
      (t0, 2L, "the quick brown fox jumps over the lazy dog"), // dup content
      (t0, 3L, "der schnelle braune fuchs springt und der hund"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM docstage").collect()
    // dedup kept one of {1,2} plus 3
    assert(rows.length == 2)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.keySet.intersect(Set(1L, 2L)).size == 1 && byId.contains(3L))
    // columnar features computed in-stream
    val en = byId(byId.keySet.intersect(Set(1L, 2L)).head)
    assert(en.getAs[Long]("tokens") == 9L && en.getAs[String]("lang_pred") == "en")
    assert(byId(3L).getAs[String]("lang_pred") == "de")
    assert(en.getAs[Double]("quality") > 0.3)
    q.stop()
  }

  test("streaming decontamination stage flags overlap against a static probe set") {
    import org.apache.spark.sql.functions.col
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val docs = mem.toDF().toDF("doc_id", "text")
    val probes = Seq((100L, "secret benchmark answer phrase"))
      .toDF("doc_id", "text")
    val staged = Streams.streamingDecontamFlag(docs, probes, "doc_id", "text")
    val q = staged.writeStream.format("memory").queryName("decontamstage")
      .outputMode("append").start()
    mem.addData(
      (1L, "this text contains the secret benchmark answer phrase today"),
      (2L, "a perfectly clean document with original content"))
    q.processAllAvailable()
    val flags = spark.sql("SELECT doc_id, contaminated FROM decontamstage").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(1L) && !flags(2L))
    q.stop()
  }
}
