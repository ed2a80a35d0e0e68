package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store = model.Tpch.store(spark, "/root/testdata/sf0.001")
    def q(s: String): String =
      try engine.Engine.query(store, s).collect().take(4).map(_.toString).mkString(" | ")
      catch { case e: Exception => "ERR " + e.getMessage.take(110) }
    println("REDUCED      " + q("SELECT REDUCED ?k WHERE { ?c <urn:fk:c_nationkey> ?k } LIMIT 2"))
    println("NEG-INV-ONLY " + q("SELECT ?o WHERE { <urn:t:nation:3> !(^<urn:p:x>) ?o } LIMIT 2"))
    println("QUANT-EXACT  " + q("SELECT ?x WHERE { <urn:t:r:0> <urn:p:x>{2} ?x }"))
    println("SVC-SILENT   " + q("SELECT ?x WHERE { SERVICE SILENT <http://127.0.0.1:1/sparql> { ?x <urn:p:a> ?y } BIND(1 AS ?z) }"))
    println("MIN-MIXED    " + q("SELECT (MIN(?v) AS ?m) WHERE { { BIND(\"abc\" AS ?v) } UNION { BIND(5 AS ?v) } UNION { BIND(<urn:i:x> AS ?v) } }"))
    println("GC-DEFAULT   " + q("SELECT (GROUP_CONCAT(?v) AS ?g) WHERE { { BIND(\"a\" AS ?v) } UNION { BIND(\"b\" AS ?v) } }"))
    println("SAMPLE-1     " + q("SELECT (SAMPLE(?v) AS ?s) WHERE { BIND(7 AS ?v) }"))
    spark.stop()
  }
}
