package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.engine.{Engine, SparqlResults, Update}
import graft.model.GraftStore
import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets

/** Minimal SPARQL 1.1 Protocol endpoint — the NanoSparqlServer analog
  * (`sail/webapp/NanoSparqlServer.java`, `RESTServlet.java:183,250`,
  * `QueryServlet.doSparqlQuery:635`) on the JDK's built-in HTTP server (zero deps).
  *
  * GET/POST `/sparql?query=…` → content-negotiated results (SPARQL JSON default,
  * XML/CSV/TSV via Accept). POST `/sparql/update?update=…` applies SPARQL UPDATE to the
  * served store (copy-on-write swap). This is a thin facade: all evaluation stays in the
  * distributed engine; the servlet layer only serializes.
  */
final class SparqlServer(@volatile private var store: GraftStore, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def currentStore: GraftStore = store

  private def params(body: String): Map[String, String] =
    body.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap

  private def respond(ex: HttpExchange, code: Int, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/sparql", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      val raw =
        if (ex.getRequestMethod == "POST")
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        else Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val q = params(raw).getOrElse("query",
        return respond(ex, 400, "text/plain", "missing 'query' parameter"))
      val df = Engine.query(store, q)
      val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
      // CONSTRUCT/DESCRIBE yield RDF, not bindings — route on the QUERY FORM (a
      // SELECT projecting ?s ?p ?o must still get a bindings format)
      val isGraph = graft.sparql.Parser.parseQuery(q) match {
        case _: graft.sparql.Ast.ConstructQuery | _: graft.sparql.Ast.DescribeQuery => true
        case _ => false
      }
      val (ct, body) =
        if (isGraph) {
          val lines = graft.sources.Rio.toNQuadLines(df)
            .collect().map(_.getString(0)).mkString("", "\n", "\n")
          (if (accept.contains("n-quads")) "application/n-quads"
           else "application/n-triples", lines)
        }
        else if (accept.contains("xml")) ("application/sparql-results+xml", SparqlResults.toXml(df))
        else if (accept.contains("csv")) ("text/csv", SparqlResults.toCsv(df))
        else if (accept.contains("tab-separated")) ("text/tab-separated-values", SparqlResults.toTsv(df))
        else ("application/sparql-results+json", SparqlResults.toJson(df))
      respond(ex, 200, ct, body)
    } catch {
      case e: Exception => respond(ex, 400, "text/plain", s"query error: ${e.getMessage}")
    }
  })

  server.createContext("/sparql/update", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val u = params(raw).getOrElse("update",
        return respond(ex, 400, "text/plain", "missing 'update' parameter"))
      store = Update(store, u)
      respond(ex, 200, "text/plain", "OK")
    } catch {
      case e: Exception => respond(ex, 400, "text/plain", s"update error: ${e.getMessage}")
    }
  })

  def start(): SparqlServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
