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

    // q_geo_service staged: where does the 7 s go?
    val insertText =
      """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        |INSERT { ?e <urn:p:loc> ?loc } WHERE {
        |  ?e <urn:p:event_id> ?id .
        |  BIND(?id - FLOOR(?id/1.8e3)*1800 AS ?lm)
        |  BIND(?id*7 AS ?i7)
        |  BIND(?i7 - FLOOR(?i7/3.6e3)*3600 AS ?gm)
        |  BIND(?lm/1.0e1 - 9.0e1 AS ?la)
        |  BIND(?gm/1.0e1 - 1.8e2 AS ?lo)
        |  BIND(STRDT(CONCAT(STR(?la), "#", STR(?lo)), geo:geoSpatialLiteral) AS ?loc) }""".stripMargin
    val geoText =
      """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        |SELECT ?res ?lat ?lon WHERE {
        |  ?res geo:search "inCircle" ;
        |       geo:predicate <urn:p:loc> ;
        |       geo:spatialCircleCenter "30#40" ;
        |       geo:spatialCircleRadius "2000" ;
        |       geo:latValue ?lat ; geo:lonValue ?lon }""".stripMargin
    val withLoc = t("geo: INSERT WHERE (update)")(engine.Update(store, insertText))
    t("geo: search query")(println("rows " + engine.Engine.query(withLoc, geoText).count()))
    t("geo: search query 2nd")(engine.Engine.query(withLoc, geoText).count())
    // the update pieces, re-run standalone
    t("geo: WHERE solutions only") {
      val c = new engine.Compiler(store, engine.DatasetSpec.all)
      val parsed = sparql.Parser.parseUpdate(insertText)
      println("solutions " + c.compile(sparql.Algebra.lower(
        parsed.collect { case m: sparql.Ast.Modify => m }.head.where)).count())
    }
    // finer stages of the geo INSERT
    locally {
      val c = new engine.Compiler(store, engine.DatasetSpec.all, spreadScans = true)
      val parsed = sparql.Parser.parseUpdate(insertText)
      val m = parsed.collect { case x: sparql.Ast.Modify => x }.head
      val sol0 = c.compile(sparql.Algebra.lower(m.where))
      val projected = sol0.select(col("e"), col("loc"))
      t("geo stage: full-row compute (no ckpt)") {
        projected.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
      }
      t("geo stage: persist+count") {
        val p = projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p.unpersist()
      }
      println("sol partitions " + projected.queryExecution.toRdd.getNumPartitions)
      projected.explain("formatted")
      val sol = t("geo stage: sol ckpt")(projected.localCheckpoint())
      println("sol rows " + sol.count())
      val inst = t("geo stage: instantiate") {
        val d = sol.select(col("e").as("s"),
          graft.model.Term.iri("urn:p:loc").as("p"), col("loc").as("o"),
          graft.model.Term.nullTerm.as("g"))
        println("inst rows " + d.count()); d
      }
      val pruned = store.statements.filter(col("p_id") === engine.TermIds.iriId("urn:p:loc"))
      val fresh = t("geo stage: dedup+anti") {
        val keyed = inst.withColumn("__k", xxhash64(col("s")("id"), col("p")("id"),
          col("o")("id"), coalesce(col("g")("id"), lit(0L))))
        val f = keyed.dropDuplicates("__k").join(
          keyed.limit(0).select("__k"), Seq("__k"), "left_anti").drop("__k")
        println("fresh rows " + f.count()); f
      }
      t("geo stage: delta ckpt") {
        model.GraftStore.assemble(fresh
          .withColumn("stype", lit(model.GraftStore.STYPE_EXPLICIT).cast("byte")))
          .localCheckpoint().count()
      }
      println("pruned existing rows " + pruned.count())
    }
    t("q_truth_maint staged: closure 1")(inference.Rdfs.closure(store).statements.count())
    val closed = inference.Rdfs.closure(store)
    t("q_truth_maint staged: tm")(
      engine.Update.withTruthMaintenance(closed,
        """DELETE DATA { <urn:c:Customer>
          |  <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:c:Any> . }""".stripMargin)
        .statements.count())
    spark.stop()
  }
}
