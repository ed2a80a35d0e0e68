package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.Term
import graft.sparql.{Algebra, SparqlText}
import graft.sparql.Algebra.Op
import graft.sparql.Ast._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets

/** Remote SERVICE federation over the SPARQL 1.1 Protocol — the ServiceCallJoin
  * analog (`bop/controller/ServiceCallJoin.java:105`,
  * `rdf/sparql/ast/service/RemoteServiceCallImpl.java`): the service group is
  * re-serialized to SPARQL, POSTed to the endpoint, and the JSON results join back
  * into the local solution stream. When outer bindings are available and small,
  * they vector into the remote query as a VALUES block (the reference's
  * bindings-chunked evaluation); otherwise the service evaluates unrestricted and
  * the restriction happens in the local join.
  *
  * The solution-set transfer is driver-mediated (protocol limitation, same as the
  * reference): fine for dimension-sized federated results, not a bulk-load path.
  */
object RemoteService {

  /** Max distinct outer bindings shipped as a VALUES block (ServiceCallJoin
    * chunks similarly); beyond this the remote query runs unrestricted.
    */
  val ValuesCap = 512

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  def isRemoteIri(iri: String): Boolean =
    iri.startsWith("http://") || iri.startsWith("https://")

  /** Evaluate SERVICE <endpoint> { inner } with no outer restriction. */
  def evaluate(spark: SparkSession, endpoint: String, inner: Op,
               silent: Boolean): DataFrame =
    run(spark, endpoint, s"SELECT * WHERE ${SparqlText.group(inner)}", silent)

  /** Vectored evaluation: outer solutions restrict the remote query via VALUES
    * when their distinct shared-var bindings fit [[ValuesCap]].
    */
  def evaluateWith(spark: SparkSession, endpoint: String, inner: Op,
                   silent: Boolean, outer: DataFrame): DataFrame = {
    val shared = outer.columns.intersect(Algebra.vars(inner).toSeq).toSeq
    if (shared.isEmpty) return evaluate(spark, endpoint, inner, silent)
    val sample = outer.select(shared.map(col): _*).dropDuplicates(shared)
      .limit(ValuesCap + 1).collect()
    if (sample.length > ValuesCap) return evaluate(spark, endpoint, inner, silent)
    val rows = sample.map { r =>
      shared.indices.map { i =>
        Option(r.getStruct(i)).flatMap(termText)
      }.map(_.getOrElse("UNDEF")).mkString("(", " ", ")")
    }.mkString(" ")
    val hdr = shared.map("?" + _).mkString(" ")
    val q = s"SELECT * WHERE { VALUES ($hdr) { $rows } ${SparqlText.body(inner)} }"
    run(spark, endpoint, q, silent)
  }

  /** SPARQL text of a bound term struct row; None for non-transferable kinds
    * (bnodes/SIDs have no cross-store identity → UNDEF, restriction happens in
    * the local join).
    */
  private def termText(t: Row): Option[String] = {
    val kind = t.getAs[Byte]("kind")
    val str = t.getAs[String]("str")
    kind match {
      case Term.KIND_IRI => Some(s"<$str>")
      case Term.KIND_LITERAL =>
        val dt = t.getAs[String]("dt")
        val lang = t.getAs[String]("lang")
        val lex = s""""${SparqlText.escape(str)}""""
        if (lang != null) Some(s"$lex@$lang")
        else if (dt != null) Some(s"$lex^^<$dt>")
        else Some(lex)
      case _ => None
    }
  }

  private def run(spark: SparkSession, endpoint: String, query: String,
                  silent: Boolean): DataFrame =
    try {
      val form = "query=" + URLEncoder.encode(query, StandardCharsets.UTF_8)
      val req = HttpRequest.newBuilder(URI.create(endpoint))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .header("Accept", "application/sparql-results+json")
        .POST(HttpRequest.BodyPublishers.ofString(form))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new IllegalStateException(
          s"SERVICE <$endpoint> HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      parseResults(spark, resp.body())
    } catch {
      case e: Exception if silent =>
        // SERVICE SILENT failure → unit solution (SPARQL 1.1 Federated Query §4)
        spark.range(1).select(lit(1).as("__u")).drop("__u")
      case e: Exception => throw e
    }

  /** SPARQL results JSON → DataFrame of term-struct columns (one per head var). */
  def parseResults(spark: SparkSession, json: String): DataFrame = {
    val root = mapper.readTree(json)
    val vars = {
      val it = root.path("head").path("vars").elements()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      b.result()
    }
    val bindings = root.path("results").path("bindings")
    if (vars.isEmpty)
      return spark.range(if (bindings.size() > 0) 1 else 0)
        .select(lit(1).as("__u")).drop("__u")
    val rows = new scala.collection.mutable.ArrayBuffer[Row](bindings.size())
    val it = bindings.elements()
    while (it.hasNext) {
      val b = it.next()
      rows += Row.fromSeq(vars.flatMap { v =>
        val t = b.get(v)
        if (t == null) Seq(null, null, null, null)
        else {
          val kind = t.path("type").asText() match {
            case "uri" => Term.KIND_IRI.toInt
            case "bnode" => Term.KIND_BNODE.toInt
            case _ => Term.KIND_LITERAL.toInt // literal / typed-literal
          }
          val dt = Option(t.get("datatype")).map(_.asText()).orNull
          val lang = Option(t.get("xml:lang")).map(_.asText()).orNull
          Seq(kind, t.path("value").asText(), dt, lang)
        }
      })
    }
    val flat = StructType(vars.flatMap(v => Seq(
      StructField(s"__${v}_k", IntegerType, nullable = true),
      StructField(s"__${v}_s", StringType, nullable = true),
      StructField(s"__${v}_d", StringType, nullable = true),
      StructField(s"__${v}_l", StringType, nullable = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), flat)
    df.select(vars.map { v =>
      when(col(s"__${v}_k").isNull, Term.nullTerm)
        .otherwise(Term.fromParts(col(s"__${v}_k").cast(ByteType),
          col(s"__${v}_s"), col(s"__${v}_d"), col(s"__${v}_l"))).as(v)
    }: _*)
  }
}
