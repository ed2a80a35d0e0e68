package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase attribution for q_update_insert's fixed per-mutation cost (~5 s for
  * a 6-row mutation, flat across rounds — r14 verdict #6). Times each op of
  * the entry separately against the warm sf store, plus the follow-up query,
  * with the rows-read listener separating data volume from plan/job overhead.
  *
  * Usage: runMain graft.tools.UpdProf [sfDir] [iters]
  */
object UpdProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-updprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recordsRead = new java.util.concurrent.atomic.AtomicLong()
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    val runMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) {
            recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
            cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
            runMs.addAndGet(te.taskMetrics.executorRunTime)
          }
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobT0.put(js.jobId, System.nanoTime())
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobT0.remove(je.jobId)
          if (t0 != null)
            println(f"UPDPROF   job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r0 = recordsRead.get(); val j0 = jobs.get()
      val c0 = cpuNs.get(); val m0 = runMs.get()
      val r = f
      Thread.sleep(200)
      println(f"UPDPROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"rows=${recordsRead.get() - r0}%9d jobs=${jobs.get() - j0}%3d " +
        f"cpu=${(cpuNs.get() - c0) / 1e9}%7.1f run=${(runMs.get() - m0) / 1e3}%7.1f")
      r
    }
    val store = graft.model.Tpch.store(spark, sfDir)
    store.statements.count()
    val ins =
      """INSERT DATA { <urn:t:region:99> a <urn:c:Region> .
        |  <urn:t:region:99> <urn:p:r_name> "ATLANTIS" }""".stripMargin
    val mod =
      """DELETE { ?r <urn:p:r_name> ?n } INSERT { ?r <urn:p:r_name> "SUNK" }
        |WHERE { ?r <urn:p:r_name> ?n . FILTER(?n = "ATLANTIS") }""".stripMargin
    val query =
      """SELECT ?name (COUNT(*) AS ?cnt) WHERE { ?r a <urn:c:Region> .
        |OPTIONAL { ?r <urn:p:r_name> ?name } } GROUP BY ?name ORDER BY ?name""".stripMargin
    // geo entry decomposition (r15: battery reading rose 4.8 -> 7.6 while
    // QBench steady state stayed ~2.5-3.0; attribute the first-iteration gap)
    if (args.contains("geo")) {
      t("prime-mgp")(store.multiGraphPids)
      t("prime-inf")(store.mayHaveInferred)
      t("prime-mgpo")(store.multiGraphPO)
      for (i <- 1 to iters) {
        println(s"---- geo iteration $i")
        // WHERE-evaluation control: the INSERT's pattern+BINDs as a bare
        // SELECT, so (geo-insert − geo-where) attributes delta construction
        // + the withLayout fold separately from pattern evaluation
        t("geo-where-only")(graft.engine.Engine.query(store,
          """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
            |SELECT ?e ?loc WHERE {
            |  ?e <urn:p:event_id> ?id .
            |  BIND(?id - FLOOR(?id/1.8e3)*1800 AS ?lm)
            |  BIND(?id*7 AS ?i7)
            |  BIND(?i7 - FLOOR(?i7/3.6e3)*3600 AS ?gm)
            |  BIND(?lm/1.0e1 - 9.0e1 AS ?la)
            |  BIND(?gm/1.0e1 - 1.8e2 AS ?lo)
            |  BIND(STRDT(CONCAT(STR(?la), "#", STR(?lo)), geo:geoSpatialLiteral) AS ?loc) }""".stripMargin)
          .count())
        // force the BIND expression work (CONCAT/STR/term minting) without
        // materializing rows: hash every field of both output terms
        t("geo-bind-forced")(graft.engine.Engine.query(store,
          """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
            |SELECT ?e ?loc WHERE {
            |  ?e <urn:p:event_id> ?id .
            |  BIND(?id - FLOOR(?id/1.8e3)*1800 AS ?lm)
            |  BIND(?id*7 AS ?i7)
            |  BIND(?i7 - FLOOR(?i7/3.6e3)*3600 AS ?gm)
            |  BIND(?lm/1.0e1 - 9.0e1 AS ?la)
            |  BIND(?gm/1.0e1 - 1.8e2 AS ?lo)
            |  BIND(STRDT(CONCAT(STR(?la), "#", STR(?lo)), geo:geoSpatialLiteral) AS ?loc) }""".stripMargin)
          .select(org.apache.spark.sql.functions.xxhash64(
              org.apache.spark.sql.functions.col("e")("id"),
              org.apache.spark.sql.functions.col("loc")("id"),
              org.apache.spark.sql.functions.col("loc")("str")).as("h"))
          .agg(org.apache.spark.sql.functions.expr("bit_xor(h)")).collect())
        val withLoc = t("geo-insert")(graft.engine.Update(store,
          """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
            |INSERT { ?e <urn:p:loc> ?loc } WHERE {
            |  ?e <urn:p:event_id> ?id .
            |  BIND(?id - FLOOR(?id/1.8e3)*1800 AS ?lm)
            |  BIND(?id*7 AS ?i7)
            |  BIND(?i7 - FLOOR(?i7/3.6e3)*3600 AS ?gm)
            |  BIND(?lm/1.0e1 - 9.0e1 AS ?la)
            |  BIND(?gm/1.0e1 - 1.8e2 AS ?lo)
            |  BIND(STRDT(CONCAT(STR(?la), "#", STR(?lo)), geo:geoSpatialLiteral) AS ?loc) }""".stripMargin))
        t("geo-search")(graft.engine.Engine.query(withLoc,
          """PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
            |SELECT ?res ?lat ?lon WHERE {
            |  ?res geo:search "inCircle" ;
            |       geo:predicate <urn:p:loc> ;
            |       geo:spatialCircleCenter "30#40" ;
            |       geo:spatialCircleRadius "2000" ;
            |       geo:latValue ?lat ; geo:lonValue ?lon }""".stripMargin)
          .count())
        System.gc()
      }
      spark.stop(); return
    }
    for (i <- 1 to iters) {
      println(s"---- iteration $i")
      val st1 = t("insert-data")(graft.engine.Update(store, ins))
      val st2 = t("modify-where")(graft.engine.Update(st1, mod))
      t("query-agg")(graft.engine.Engine.query(store, query).count())
      t("query-agg-mutated")(graft.engine.Engine.query(st2, query).count())
      // decomposition controls: WHERE evaluation alone, and the combined
      // 2-op entry as the battery runs it
      t("where-eval-only")(graft.engine.Engine.query(st1,
        """SELECT ?r ?n WHERE { ?r <urn:p:r_name> ?n . FILTER(?n = "ATLANTIS") }""")
        .count())
      t("modify-del-only")(graft.engine.Update(st1,
        """DELETE { ?r <urn:p:r_name> ?n }
          |WHERE { ?r <urn:p:r_name> ?n . FILTER(?n = "ATLANTIS") }""".stripMargin))
      t("modify-ins-only")(graft.engine.Update(st1,
        """INSERT { ?r <urn:p:r_name> "SUNK2" }
          |WHERE { ?r <urn:p:r_name> ?n . FILTER(?n = "ATLANTIS") }""".stripMargin))
      t("modify-cross-part")(graft.engine.Update(st1,
        """DELETE { ?r <urn:p:r_name> ?n } INSERT { ?r <urn:p:r_name2> "SUNK" }
          |WHERE { ?r <urn:p:r_name> ?n . FILTER(?n = "ATLANTIS") }""".stripMargin))
      t("modify-same-part")(graft.engine.Update(st1,
        """DELETE { ?r <urn:p:r_name> ?n } INSERT { ?r <urn:p:r_name> "SUNK" }
          |WHERE { ?r <urn:p:r_name> ?n . FILTER(?n = "ATLANTIS") }""".stripMargin))
      t("entry-combined")(graft.engine.Engine.query(
        graft.engine.Update(store, ins + " ;\n" + mod), query).count())
      System.gc()
    }
    spark.stop()
  }
}
