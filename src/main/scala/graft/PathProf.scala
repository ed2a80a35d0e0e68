package graft

import org.apache.spark.sql.functions._

/** Scratch main: phase timing of q_path_plus at sf0.1 — seeds, edge scan,
  * closure rounds, term attach. Not part of the API.
  */
object PathProf {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(32)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[info] PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val store = t("store") { model.Tpch.store(spark, "/root/testdata/sf0.1") }
    t("lexicon-warm") { store.nodeTerms.count() }
    val q = """SELECT ?s ?t WHERE { ?s a <urn:c:Lineitem> .
              |  ?s (<urn:fk:l_orderkey>|<urn:fk:o_custkey>)+ ?t . }""".stripMargin
    for (i <- 1 to 3) t(s"q_path_plus-$i") { engine.Engine.query(store, q).count() }
    // decomposed: plain scan → seeds
    val c = new engine.Compiler(store, engine.DatasetSpec.all)
    val seeds = t("seeds") {
      val s = c.scanTriple(graft.sparql.Algebra.Triple(graft.sparql.Ast.VarNode("s"),
        graft.sparql.Ast.PLink("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
        graft.sparql.Ast.IriNode("urn:c:Lineitem"), None))
        .select(col("s")("id").as("seed")).dropDuplicates("seed").localCheckpoint()
      println(s"[info] seeds=${s.count()}"); s
    }
    val edges = t("edges") {
      val e = c.pathPairIds(graft.sparql.Ast.PAlt(graft.sparql.Ast.PLink("urn:fk:l_orderkey"),
        graft.sparql.Ast.PLink("urn:fk:o_custkey")), None)
        .dropDuplicates("a", "b").localCheckpoint()
      println(s"[info] edges=${e.count()}"); e
    }
    val closure = t("closure") {
      val cl = c.seededPathIds(graft.sparql.Ast.POneOrMore(
        graft.sparql.Ast.PAlt(graft.sparql.Ast.PLink("urn:fk:l_orderkey"),
          graft.sparql.Ast.PLink("urn:fk:o_custkey"))), None, seeds,
        fromSubject = true, seedsInDomain = true).localCheckpoint()
      println(s"[info] closure=${cl.count()}"); cl
    }
    t("attach2") {
      val lex = store.nodeTerms
      closure.join(lex.withColumnRenamed("nid", "a"), Seq("a"))
        .withColumnRenamed("n", "sTerm")
        .join(lex.withColumnRenamed("nid", "b"), Seq("b"))
        .count()
    }
    spark.stop()
  }
}
