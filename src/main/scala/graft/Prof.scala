package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store0 = model.Tpch.store(spark, "/root/testdata/sf0.001")
    def q(s: String): String =
      try engine.Engine.query(store0, s).collect().map(_.toString).mkString(" | ")
      catch { case e: Exception => "ERR " + e.getMessage.take(100) }
    def u(s: String): String =
      try { engine.Update(store0, s); "OK" }
      catch { case e: Exception => "ERR " + e.getMessage.take(100) }
    println("NEG-DATA   " + u("INSERT DATA { <urn:n:1> <urn:p:v> -5 . <urn:n:1> <urn:p:w> -2.5 }"))
    println("NEG-FILTER " + q("SELECT ?x WHERE { BIND(-5 < -2 AS ?x) }"))
    println("TRAIL-SEMI " + q("SELECT ?b WHERE { ?c <urn:p:c_acctbal> ?b ; . } LIMIT 1"))
    println("TRIPLE-UNION " + q("SELECT ?x WHERE { { BIND(1 AS ?x) } UNION { BIND(2 AS ?x) } UNION { BIND(3 AS ?x) } }"))
    println("HAVING-ALIAS " + q("SELECT ?k (COUNT(*) AS ?n) WHERE { ?c <urn:fk:c_nationkey> ?k } GROUP BY ?k HAVING (?n > 0) LIMIT 1"))
    println("NESTED-AGG-EXPR " + q("SELECT (SUM(?b)/COUNT(?b) AS ?avg) WHERE { ?c <urn:p:c_acctbal> ?b }"))
    spark.stop()
  }
}
