package graft.tools

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Dev.session(8)
    val data = """<eg:s> <eg:p> <eg:o> .
                 |<eg:b> <eg:part> <eg:mid> .""".stripMargin
    val st = new graft.model.GraftStore(spark,
      graft.sources.Rio.readTurtle(spark, data).localCheckpoint())
    def show(q: String): Unit = {
      println("=== " + q.replace('\n', ' '))
      println("ALG " + graft.sparql.Algebra.lower(graft.sparql.Parser.parseQuery(q).asInstanceOf[graft.sparql.Ast.SelectQuery].where))
      try println("ROWS " + graft.engine.Engine.query(st, q).count())
      catch { case e: Exception => println("ERR " + e) }
    }
    show("SELECT ?X WHERE { BIND(<eg:o> as ?Z) ?X <eg:part>? ?part . ?part ?predicate ?Z . }")
    show("SELECT ?X WHERE { ?X <eg:part>? ?part . ?part ?predicate ?Z . BIND(<eg:o> as ?Zx) FILTER(?Z = ?Zx) }")
    show("SELECT ?X WHERE { VALUES ?Z { <eg:o> } ?X <eg:part>? ?part . ?part ?predicate ?Z . }")
  }
}
