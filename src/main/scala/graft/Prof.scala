package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store = model.Tpch.store(spark, "/root/testdata/sf0.001")
    def qs(st: model.GraftStore, s: String): String =
      try engine.Engine.query(st, s).collect().take(3).map(_.toString).mkString(" | ")
      catch { case e: Exception => "ERR " + e.getMessage.take(110) }
    def u(st: model.GraftStore, s: String): Either[String, model.GraftStore] =
      try Right(engine.Update(st, s))
      catch { case e: Exception => Left("ERR " + e.getMessage.take(110)) }

    // DELETE WHERE with GRAPH pattern (shorthand over quads)
    val s1 = u(store, "INSERT DATA { GRAPH <urn:g:t> { <urn:x:1> <urn:p:v> 1 . <urn:x:2> <urn:p:v> 2 } }").toOption.get
    val s2 = u(s1, "DELETE WHERE { GRAPH <urn:g:t> { ?s <urn:p:v> 1 } }")
    println("DELWHERE-GRAPH " + s2.fold(identity, st => qs(st, "SELECT ?s WHERE { GRAPH <urn:g:t> { ?s <urn:p:v> ?o } }")))
    // INSERT template with GRAPH block
    val s3 = u(store, "INSERT { GRAPH <urn:g:n> { ?n <urn:p:copy> ?nm } } WHERE { ?n <urn:p:n_name> ?nm . FILTER(?nm = \"NATION_3\") }")
    println("INS-GRAPH-TMPL " + s3.fold(identity, st => qs(st, "SELECT ?s WHERE { GRAPH <urn:g:n> { ?s <urn:p:copy> ?o } }")))
    // LOAD SILENT missing file: must not throw
    println("LOAD-SILENT    " + u(store, "LOAD SILENT <file:///nonexistent.nt>").fold(identity, _ => "OK"))
    // WITH + USING: USING overrides WITH for the WHERE dataset
    val s4 = u(store, "INSERT DATA { GRAPH <urn:g:a> { <urn:w:1> <urn:p:m> 1 } . GRAPH <urn:g:b> { <urn:w:2> <urn:p:m> 2 } }").toOption.get
    val s5 = u(s4, "WITH <urn:g:a> DELETE { ?s <urn:p:m> ?o } USING <urn:g:b> WHERE { ?s <urn:p:m> ?o }")
    println("WITH-VS-USING  " + s5.fold(identity, st =>
      qs(st, "SELECT ?s WHERE { GRAPH <urn:g:a> { ?s <urn:p:m> ?o } }") + " ;; " +
      qs(st, "SELECT ?s WHERE { GRAPH <urn:g:b> { ?s <urn:p:m> ?o } }")))
    spark.stop()
  }
}
