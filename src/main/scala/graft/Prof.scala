package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the library API). */
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Dev.session(32)
    sys.env.get("GRAFT_BCAST").foreach { v =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
    }
    val dir = "/root/testdata/sf0.1"
    val store = model.Tpch.store(spark, dir)
    t("store.count")(store.statements.count())
    t("nodeTerms build")(store.nodeTerms.count())
    t("q_path_plus 1st") {
      engine.Engine.query(store,
        """SELECT ?s ?t WHERE { ?s a <urn:c:Lineitem> .
          |  ?s (<urn:fk:l_orderkey>|<urn:fk:o_custkey>)+ ?t . }""".stripMargin).count()
    }
    t("q_path_plus 2nd") {
      engine.Engine.query(store,
        """SELECT ?s ?t WHERE { ?s a <urn:c:Lineitem> .
          |  ?s (<urn:fk:l_orderkey>|<urn:fk:o_custkey>)+ ?t . }""".stripMargin).count()
    }
    t("q_path_alt") {
      engine.Engine.query(store,
        "SELECT ?s ?t WHERE { ?s (<urn:fk:n_regionkey>|<urn:p:n_name>) ?t . }").count()
    }
    // manual replication of the seeded q_path_plus pipeline
    val ids = engine.TermIds
    val edges = t("edges build") {
      store.statements
        .filter(col("p_id").isin(ids.iriId("urn:fk:l_orderkey"), ids.iriId("urn:fk:o_custkey")))
        .select(col("s")("id").as("a"), col("o")("id").as("b"))
        .dropDuplicates("a", "b").localCheckpoint()
    }
    println("PROF edges rows " + edges.count())
    val seeds = t("seeds") {
      store.statements.filter(col("p_id") === ids.iriId(graft.model.Term.RDF_TYPE) &&
          col("o")("id") === ids.iriId("urn:c:Lineitem"))
        .select(col("s")("id").as("a")).dropDuplicates("a")
    }
    val acc0 = t("acc0 = edges ∩ seeds ckpt")(edges.join(seeds, Seq("a")).localCheckpoint())
    val stepped = t("round1 step ckpt") {
      acc0.select(col("a"), col("b").as("m"))
        .join(edges.select(col("a").as("m"), col("b")), Seq("m"))
        .select("a", "b").dropDuplicates("a", "b")
        .join(acc0, Seq("a", "b"), "left_anti").localCheckpoint()
    }
    println("PROF frontier1 rows " + stepped.count())
    val acc = acc0.unionByName(stepped)
    val attached = t("attach b via nodeTerms") {
      acc.join(store.nodeTerms.select(col("nid").as("b"), col("n")), Seq("b")).localCheckpoint()
    }
    val dfLineitem = store.statements.filter(col("p_id") === ids.iriId(graft.model.Term.RDF_TYPE) &&
      col("o")("id") === ids.iriId("urn:c:Lineitem")).select(col("s"))
    t("final join back")(dfLineitem.join(attached, col("s")("id") === col("a")).count())
    spark.stop()
  }
}
