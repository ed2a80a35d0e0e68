package graft.tools

import graft.model.GraftStore

/** Scratch repro for the closure() Union-constraint crash (TmDeltaSpec t11). */
object TmDbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Dev.session(8)
    spark.sparkContext.setLogLevel("WARN")
    val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    val OWL = "http://www.w3.org/2002/07/owl#"
    val turtle = s"""
      @prefix : <urn:x:> .
      @prefix rdfs: <$RDFS> .
      @prefix owl: <$OWL> .
      :g {
        :B rdfs:subClassOf :A .
        :C rdfs:subClassOf :B .
        :name rdfs:domain :B .
        :likes rdfs:range :B .
        :nick rdfs:subPropertyOf :name .
        :u1 a :C .
        :u2 :name "two" .
        :u3 :nick "three" .
        :u4 :likes :u5 .
        :u6 a :B .
      }
      :g3 {
        :anc a owl:TransitiveProperty .
        :a :anc :b . :b :anc :c .
      }
    """
    val st = new GraftStore(spark, graft.sources.Rio.readTrig(spark, turtle))
    try {
      val closed = graft.inference.Rdfs.closure(st)
      println("TMDBG closure rows=" + closed.statements.count())
    } catch {
      case e: Exception =>
        println("TMDBG FAILED: " + e)
        e.printStackTrace()
    }
  }
}
