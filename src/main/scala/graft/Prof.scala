package graft

/** Scratch probing main — repurposed per investigation; not part of the library. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(8)
    val store = model.Tpch.store(spark, "/root/testdata/sf0.001")
    def q(s: String): String =
      try engine.Engine.query(store, s).collect().take(3).map(_.toString).mkString(" | ")
      catch { case e: Exception => "ERR " + e.getMessage.take(110) }
    println("ZERO-OR-ONE  " + q("SELECT ?o WHERE { <urn:t:nation:3> <urn:p:n_name>? ?o } LIMIT 3"))
    println("ZERO-SELF    " + q("ASK { <urn:t:nation:3> <urn:p:n_name>* <urn:t:nation:3> }"))
    println("ZERO-CONST2  " + q("ASK { <urn:t:nation:3> <urn:p:nope>* <urn:t:nation:4> }"))
    spark.stop()
  }
}
