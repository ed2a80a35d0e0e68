package graft

/** Scratch profiling main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val cases = Seq(
      "bnode-plist-subject" -> "SELECT ?o WHERE { [ <urn:p:a> ?o ] . }",
      "bnode-plist-object" -> "SELECT ?s WHERE { ?s <urn:p:a> [ <urn:p:b> 1 ] }",
      "collection-pattern" -> "SELECT ?s WHERE { ?s <urn:p:a> ( 1 2 3 ) }",
      "dollar-var" -> "SELECT $s WHERE { $s a <urn:c:C> }",
      "long-string" -> "SELECT ?s WHERE { ?s <urn:p:a> \"\"\"multi\nline\"\"\" }",
      "numeric-forms" -> "SELECT ?s WHERE { ?s <urn:p:a> .5 . ?s <urn:p:b> 2. }",
      "comment" -> "SELECT ?s # trailing comment\nWHERE { ?s a <urn:c:C> } # end",
      "lc-keywords" -> "select ?s where { ?s a <urn:c:C> } limit 2",
      "count-star" -> "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",
      "gc-distinct-sep" -> "SELECT (GROUP_CONCAT(DISTINCT ?o; SEPARATOR=\"|\") AS ?g) WHERE { ?s <urn:p:a> ?o }",
      "escape-u" -> "SELECT ?s WHERE { ?s <urn:p:a> \"a\\u0041b\" }",
      "anon-bnode" -> "SELECT ?p WHERE { [] ?p [] }",
      "nested-plist" -> "SELECT ?x WHERE { [ <urn:p:a> [ <urn:p:b> ?x ] ] . }",
      "blank-label" -> "SELECT ?o WHERE { _:b1 <urn:p:a> ?o }"
    )
    for ((name, q) <- cases) {
      try { graft.sparql.Parser.parseQuery(q); println(s"PARSE-OK   $name") }
      catch { case e: Exception => println(s"PARSE-FAIL $name :: ${e.getMessage}") }
    }
  }
}
