package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delta vs full-recompute truth maintenance A/B on an AT-REST closed store
  * (entailments materialized — the 100 TB posture, where they live in parquet).
  *
  * For each of K small DELETEs (one schema axiom + instance rows), times
  *   delta: Update.withTruthMaintenance (routes to Rdfs.truthMaintainDelta)
  *   full:  Rdfs.truthMaintain after the same applyOp
  * and cross-checks the two result stores' statement key sets are identical.
  *
  * Usage: runMain graft.tools.TmAB [sfDir] [deletes]
  */
object TmAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDel = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tmab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("mega")) { megaPhase(spark, sfDir); spark.stop(); return }

    // wall-clock plus TOTAL INPUT RECORDS read by all tasks in the section —
    // the scale-invariant cost: single-node wall-clock under-represents the
    // cluster gap, but rows-scanned is the quantity that multiplies by 10⁶ at
    // 100 TB
    val recordsRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      })
    def time[A](f: => A): (A, Double, Long) = {
      val t0 = System.nanoTime()
      val r0 = recordsRead.get()
      val r = f
      Thread.sleep(300) // let the listener bus drain task-end events
      (r, (System.nanoTime() - t0) / 1e9, recordsRead.get() - r0)
    }

    // at-rest closed store: closure saved as p_id-partitioned parquet and
    // reopened — the 100 TB posture where entailments live in storage and every
    // probe below is a PRUNED scan (an in-session checkpoint can't prune: RDD
    // block scans read everything, which would make the delta path O(corpus))
    val raw0 = graft.model.Tpch.store(spark, sfDir)
    raw0.statements.count()
    // a realistic ontology: rdfs:domain on every column predicate, so the full
    // recompute's rdfs2 pass must scan EVERY predicate partition while a small
    // delete's delta pass touches only the partitions its suspects implicate
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val domAxioms = tables.flatMap { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").columns.map(c =>
        s"<urn:p:$c> <http://www.w3.org/2000/01/rdf-schema#domain> <urn:c:${t.capitalize}> .")
    }
    // a transitive ontology slice: N chains of length 10 under one transitive
    // property. Its closure adds ~36·N pairs; any full recompute must re-run
    // the per-property fixpoint over ALL chains, while a single-edge delete's
    // delta cone touches one chain — the O(delta) case VERDICT r11 asked for.
    val nChains = args.lift(2).map(_.toInt).getOrElse(10000)
    // a sameAs slice: N/2 two-member equivalence classes over customer
    // resources (each customer's facts gain substituted alias copies in the
    // closure) — the materialized-sameAs store posture whose deletes the
    // r12 verdict flagged as always-recompute
    val nSame = math.max(2, nChains / 2)
    // offset past the custIds the plain-delete scenarios use, so those A/B
    // rows keep their original (sameAs-free) meaning
    val sameNt = (nSame until 2 * nSame).map(i =>
      s"<urn:t:customer:$i> <http://www.w3.org/2002/07/owl#sameAs> <urn:alias:c$i> .")
    // feeder-fed slice (r13): N/10 chains linked by :step ⊑ :next — the
    // transitive property's effective base edges span a FEEDER partition, the
    // family that recomputed before the effective-edge cone landed. Plus a
    // symmetric+transitive :conn slice (flipped self-feeder).
    val nFeed = math.max(2, nChains / 10)
    val feederNt = (0 until nFeed).flatMap { c =>
      (0 until 9).map(i => s"<urn:fch:$c:$i> <urn:p:step> <urn:fch:$c:${i + 1}> .")
    } ++ (0 until nFeed).flatMap { c =>
      (0 until 9).map(i => s"<urn:sch:$c:$i> <urn:p:conn> <urn:sch:$c:${i + 1}> .")
    } ++ Seq(
      "<urn:p:step> <http://www.w3.org/2000/01/rdf-schema#subPropertyOf> <urn:p:next> .",
      "<urn:p:conn> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> " +
        "<http://www.w3.org/2002/07/owl#TransitiveProperty> .",
      "<urn:p:conn> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> " +
        "<http://www.w3.org/2002/07/owl#SymmetricProperty> .")
    // FP slice (r16): N/10 violating fact pairs under :badge (declared
    // functional in the base store — its minted sameAs pairs are at rest) and
    // N/10 under :badge2 (left undeclared — the en-declaration scenario mints
    // its pairs through the class diff)
    val nFp = math.max(2, nChains / 10)
    val fpNt = (0 until nFp).flatMap { i =>
      Seq(s"<urn:fpu:$i> <urn:p:badge> <urn:bdg:$i> .",
        s"<urn:fpu:$i> <urn:p:badge> <urn:bdg2:$i> .",
        s"<urn:fpv:$i> <urn:p:badge2> <urn:bv:$i> .",
        s"<urn:fpv:$i> <urn:p:badge2> <urn:bv2:$i> .")
    } :+ ("<urn:p:badge> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> " +
      "<http://www.w3.org/2002/07/owl#FunctionalProperty> .")
    val chainNt = (0 until nChains).flatMap { c =>
      (0 until 9).map(i => s"<urn:ch:$c:$i> <urn:p:next> <urn:ch:$c:${i + 1}> .")
    } ++ sameNt ++ feederNt ++ fpNt :+ ("<urn:p:next> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> " +
      "<http://www.w3.org/2002/07/owl#TransitiveProperty> .")
    val raw1 = graft.engine.Update(raw0,
      s"INSERT DATA { ${domAxioms.mkString("\n")} }")
    val raw = new graft.model.GraftStore(spark, raw1.statements.unionByName(
      graft.sources.Rio.readTrig(spark, chainNt.mkString("\n"))))
    val atRestPath = "/tmp/graft_tmab_store"
    // GRAFT_TMAB_REUSE=1 reopens a previously-saved at-rest store (same
    // sfDir/chain args only — the path is not keyed) to iterate on the
    // mutation scenarios without paying the closure+save again
    val reuse = sys.env.contains("GRAFT_TMAB_REUSE") &&
      new java.io.File(atRestPath + "/_SUCCESS").exists()
    val (closed, tClose, _) = time {
      if (!reuse) graft.model.GraftStore.save(
        graft.inference.Rdfs.closure(raw).statements, atRestPath)
      graft.model.GraftStore.load(spark, atRestPath)
    }
    println(f"TMAB close+save+load $tClose%.2f s atRest=${graft.inference.Rdfs.inferredAtRest(closed)}")
    // stale derived-index dirs from a previous run would otherwise be
    // incrementally maintained against the wrong base by the save probes below
    Seq("-lexicon", "-lexicon-delta", "-lexicon-text").foreach(s =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(atRestPath + s)))

    // pick nDel customers to retract type rows for, plus one schema-axiom delete
    val custIds = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").limit(nDel).collect().map(_.getLong(0))
    // standalone text-maintenance probe (skips the scenario battery); expects
    // a store whose custIds(1) c_name row is still present — rebuild without
    // GRAFT_TMAB_REUSE after a prior textonly run
    if (args.contains("textonly")) {
      textProbe(spark, atRestPath, custIds(1), f => time(f))
      spark.stop()
      return
    }
    val updates =
      custIds.map(k =>
        s"DELETE DATA { <urn:t:customer:$k> a <urn:c:Customer> . }") ++ Seq(
      """DELETE DATA { <urn:c:Part>
        |  <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:c:Any> . }""".stripMargin,
      // transitive edge delete: one chain's cone vs the all-chains fixpoint
      "DELETE DATA { <urn:ch:0:4> <urn:p:next> <urn:ch:0:5> . }",
      // transitive edge insert (Modify → TM): links two chains, 30 new pairs
      """DELETE { <urn:ch:1:9> <urn:p:next> <urn:ch:1:9> . }
        |INSERT { <urn:ch:1:9> <urn:p:next> <urn:ch:2:0> . }
        |WHERE {}""".stripMargin,
      // sameAs-linked fact delete (Case A: classes unchanged — the alias map
      // is the at-rest sameAs partition; suspects = the substituted copies)
      s"DELETE DATA { <urn:t:customer:$nSame> a <urn:c:Customer> . }",
      // sameAs edge delete (Case B: class split — alias copies retract)
      s"DELETE DATA { <urn:t:customer:${nSame + 1}> " +
        s"<http://www.w3.org/2002/07/owl#sameAs> <urn:alias:c${nSame + 1}> . }",
      // sameAs edge insert via Modify (Case B: class merge — alias copies derive)
      s"""DELETE { <urn:x:none> <urn:x:never> <urn:x:nope> . }
        |INSERT { <urn:alias:c${nSame + 2}> <http://www.w3.org/2002/07/owl#sameAs> <urn:alias:c${nSame + 3}> . }
        |WHERE {}""".stripMargin,
      // feeder-edge delete (r13): one :step edge — :next's cone must run over
      // the effective (feeder-translated) base edges, one chain's cone vs the
      // all-chains fixpoint
      "DELETE DATA { <urn:fch:0:4> <urn:p:step> <urn:fch:0:5> . }",
      // symmetric-transitive edge delete: both orientations' reach retracts
      "DELETE DATA { <urn:sch:0:4> <urn:p:conn> <urn:sch:0:5> . }",
      // SCHEMA delta into the cone (r14): un-subproperty :step — its whole
      // partition stops being :next effective edges (bulk statesRem delta)
      """DELETE DATA { <urn:p:step>
        |  <http://www.w3.org/2000/01/rdf-schema#subPropertyOf> <urn:p:next> . }""".stripMargin,
      // transitive RE-DECLARATION (r14): de-declare :conn — reach collapses,
      // the symmetric flips stay derivable
      """DELETE DATA { <urn:p:conn>
        |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>
        |  <http://www.w3.org/2002/07/owl#TransitiveProperty> . }""".stripMargin,
      // symmetric RE-DECLARATION (r15): de-declare :conn's symmetry — the
      // flipped copies (and the reach pairs they fed) retract as a (p,p)
      // dIb schema delta + cone statesRem, no recompute
      """DELETE DATA { <urn:p:conn>
        |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>
        |  <http://www.w3.org/2002/07/owl#SymmetricProperty> . }""".stripMargin,
      // symmetric EN-DECLARATION (r15): mark :step symmetric — every :step
      // row's flip derives as a (p,p) dIb schema arm (:next's cone is
      // untouched: sym runs AFTER rdfs7, so a symmetric feeder's flips are
      // not :next edges per the stage grammar)
      """DELETE { <urn:x:none> <urn:x:never> <urn:x:nope> . }
        |INSERT { <urn:p:step>
        |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>
        |  <http://www.w3.org/2002/07/owl#SymmetricProperty> . }
        |WHERE {}""".stripMargin,
      // FP UN-DECLARATION (r16): de-declare :badge — its at-rest minted
      // sameAs pairs (and their all-pairs closure) retract via the class
      // diff, no recompute
      """DELETE DATA { <urn:p:badge>
        |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>
        |  <http://www.w3.org/2002/07/owl#FunctionalProperty> . }""".stripMargin,
      // FP EN-DECLARATION (r16): declare :badge2 functional — its violating
      // fact pairs mint sameAs classes through the minted-pair class diff
      """DELETE { <urn:x:none> <urn:x:never> <urn:x:nope> . }
        |INSERT { <urn:p:badge2>
        |  <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>
        |  <http://www.w3.org/2002/07/owl#FunctionalProperty> . }
        |WHERE {}""".stripMargin)

    def keySet(st: graft.model.GraftStore) = st.statements
      .select(xxhash64(col("s")("id"), col("p")("id"), col("o")("id"),
        coalesce(col("g")("id"), lit(0L)), col("stype")).as("k"))

    // independent deletes against the same at-rest store: isolates the
    // per-mutation cost (the chained/compaction cadence is a policy knob)
    // the contract both paths must meet: after the mutation the store answers
    // queries at at-rest speed again. The delta path delivers that by
    // construction (parquet + broadcast tombstones); the full recompute must
    // re-materialize its (corpus-sized) entailment table — the O(corpus) cost
    // this A/B exists to expose.
    def workload(st: graft.model.GraftStore): Long =
      graft.engine.Engine.query(st,
        "SELECT (COUNT(*) AS ?c) WHERE { ?x a <urn:c:Any> }").count() +
      graft.engine.Engine.query(st,
        "SELECT ?n WHERE { ?x a <urn:c:Nation> ; <urn:p:n_name> ?n }").count()
    for ((u, i) <- updates.zipWithIndex) {
      val (deltaSt, tDelta, rowsDelta) = time {
        graft.engine.Update.withTruthMaintenance(closed, u)
      }
      val path = graft.inference.Rdfs.lastTmPath
      val (_, tDeltaQ, rowsDeltaQ) = time(workload(deltaSt))
      val (fullSt, tFull, rowsFull) = time {
        val applied = graft.sparql.Parser.parseUpdate(u)
          .foldLeft(closed)(graft.engine.Update.applyOp)
        graft.inference.Rdfs.materialize(
          graft.inference.Rdfs.truthMaintain(applied))
      }
      val (_, tFullQ, rowsFullQ) = time(workload(fullSt))
      println(f"""TMAB-Q {"delete":$i,"delta_q_sec":$tDeltaQ%.2f,"full_q_sec":$tFullQ%.2f,""".stripMargin
        + s""""delta_q_rows":$rowsDeltaQ,"full_q_rows":$rowsFullQ}""")
      val onlyDelta = keySet(deltaSt).exceptAll(keySet(fullSt)).count()
      val onlyFull = keySet(fullSt).exceptAll(keySet(deltaSt)).count()
      println(f"""TMAB {"delete":$i,"path":"$path","delta_sec":$tDelta%.2f,"full_sec":$tFull%.2f,"""
        + s""""delta_rows_read":$rowsDelta,"full_rows_read":$rowsFull,"""
        + s""""only_delta":$onlyDelta,"only_full":$onlyFull}""")
    }

    // CHAINED mutations against ONE evolving store: the tombstone design's
    // point — every mutation stays on the delta path (tombstone layers count
    // as at rest; the stack compacts past its depth bound instead of routing
    // to the recompute). Cross-checked once at the end against the full
    // recompute of the whole op sequence.
    val chainKeys = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").orderBy(col("c_custkey").desc).limit(8)
      .collect().map(_.getLong(0))
    val chainOps = chainKeys.map(k =>
      s"DELETE DATA { <urn:t:customer:$k> a <urn:c:Customer> . }")
    var cur = closed
    for ((u, i) <- chainOps.zipWithIndex) {
      val (st2, tStep, rowsStep) = time {
        graft.engine.Update.withTruthMaintenance(cur, u)
      }
      cur = st2
      println(f"""TMAB-CHAIN {"step":$i,"path":"${graft.inference.Rdfs.lastTmPath}","""
        + f""""sec":$tStep%.2f,"rows_read":$rowsStep,"""
        + s""""tombstone_depth":${graft.inference.Rdfs.tombstoneDepth(cur).getOrElse(-1)}}""")
    }
    val fullChain = graft.inference.Rdfs.materialize(graft.inference.Rdfs.truthMaintain(
      chainOps.flatMap(graft.sparql.Parser.parseUpdate)
        .foldLeft(closed)(graft.engine.Update.applyOp)))
    val od = keySet(cur).exceptAll(keySet(fullChain)).count()
    val of = keySet(fullChain).exceptAll(keySet(cur)).count()
    println(s"""TMAB-CHAIN-CHECK {"only_delta":$od,"only_full":$of}""")

    // ---- durable write-back probe (saveInPlace): bytes written for a
    // single-partition mutation must be a small fraction of the store ----
    // runs LAST: it rewrites touched partitions of the shared at-rest store
    // (a fresh non-reuse run rebuilds it)
    {
      def dirBytes(p: java.io.File): Long =
        if (p.isFile) p.length()
        else Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
      val root = new java.io.File(atRestPath)
      val storeBytes = dirBytes(root)
      val st0 = graft.model.GraftStore.load(spark, atRestPath)
      val (mut, tMut, _) = time {
        graft.engine.Update.withTruthMaintenance(st0,
          s"DELETE DATA { <urn:t:customer:${custIds.head}> <urn:p:c_name> " +
            s""""Customer#${"%09d".format(custIds.head)}" . }""")
      }
      val nTouched = mut.layoutOpt.map(_.segPids.size).getOrElse(-1)
      val expectKeys = keySet(mut).localCheckpoint()
      val mark = System.currentTimeMillis()
      val (reopened, tSave, _) = time {
        graft.model.GraftStore.saveInPlace(mut, atRestPath)
      }
      def newBytes(p: java.io.File): Long =
        if (p.isFile) { if (p.lastModified() >= mark) p.length() else 0L }
        else Option(p.listFiles()).map(_.map(newBytes).sum).getOrElse(0L)
      val written = newBytes(root)
      val mismatch = keySet(reopened).exceptAll(expectKeys).count() +
        expectKeys.exceptAll(keySet(reopened)).count()
      println(f"""TMAB-SAVE {"path":"${graft.inference.Rdfs.lastTmPath}","touched_pids":$nTouched,"""
        + f""""mutate_sec":$tMut%.2f,"save_sec":$tSave%.2f,"bytes_written":$written,"""
        + f""""store_bytes":$storeBytes,"frac":${written.toDouble / storeBytes}%.4f,"""
        + s""""reopen_mismatch":$mismatch}""")
    }

    // ---- derived-index maintenance probe (TMAB-TEXT) ----
    textProbe(spark, atRestPath, custIds(1), f => time(f))
    spark.stop()
  }

  /** Derived-index maintenance probe: after a durable commit, the text-index
    * warm folds the lexicon's `-delta` side dir (re-tokenizing ONLY the
    * delta's literals, base postings re-read with fused broadcast anti-joins,
    * ZERO corpus-scale shuffles) instead of re-tokenizing the statement
    * corpus (two corpus-token-sized shuffles: the tf groupBy and the mag
    * join). The shared-dictionary fold (store.nodeTerms — paid once per
    * session by ANY query work, not text-specific) is timed separately so the
    * A/B attributes honestly.
    */
  def textProbe(spark: SparkSession, atRestPath: String, k: Long,
                time: (=> Any) => (Any, Double, Long)): Unit = {
    val lexDir = atRestPath + "-lexicon"
    val st0 = new graft.model.GraftStore(spark,
      graft.model.GraftStore.load(spark, atRestPath).statements,
      lexiconPath = Some(lexDir), atRestPath = Some(atRestPath))
    // one-time derived-index persist, outside the probe's timed region
    val (_, tPersist, _) = time {
      st0.nodeTerms
      graft.search.TextIndex.forStore(st0)
    }
    val mut = graft.engine.Update(st0,
      s"""DELETE DATA { <urn:t:customer:$k> <urn:p:c_name> "Customer#${"%09d".format(k)}" . } ;
        |INSERT DATA { <urn:doc:tmab1> <urn:p:c_comment> "tmab probe quixotic zephyr text" . }""".stripMargin)
    val (re0, tSave, rSave) = time {
      graft.model.GraftStore.saveInPlace(mut, atRestPath)
    }
    val reopened = re0.asInstanceOf[graft.model.GraftStore]
    // shared dictionary fold: any post-commit query pays this once per
    // session regardless of text search
    val (_, tLex, rLex) = time(reopened.nodeTerms.count())
    val (idx0, tWarm, rWarm) = time {
      val i = graft.search.TextIndex.forStore(reopened)
      i.postings.count(); i.lits.count(); i
    }
    val idx = idx0.asInstanceOf[graft.search.TextIndex]
    val (fresh0, tFull, rFull) = time {
      val b = graft.search.TextIndex.build(reopened)
      b.postings.count(); b.lits.count(); b
    }
    val fresh = fresh0.asInstanceOf[graft.search.TextIndex]
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("token"), col("lit_id"), round(col("weight"), 12))
    val mismatch = key(idx.postings).exceptAll(key(fresh.postings)).count() +
      key(fresh.postings).exceptAll(key(idx.postings)).count()
    val hitNew = idx.search("zephyr").count()
    // matchAllTerms: the digit token alone also matches the same-numbered
    // supplier's name literal — requiring BOTH tokens isolates the deleted
    // customer name
    val hitDead = idx.search("customer %09d".format(k), matchAllTerms = true).count()
    println(f"""TMAB-TEXT {"persist_sec":$tPersist%.2f,"save_sec":$tSave%.2f,"""
      + f""""save_rows":$rSave,"lex_fold_sec":$tLex%.2f,"lex_fold_rows":$rLex,"""
      + f""""warm_sec":$tWarm%.2f,"warm_rows":$rWarm,"""
      + f""""full_sec":$tFull%.2f,"full_rows":$rFull,"postings_mismatch":$mismatch,"""
      + s""""hit_new":$hitNew,"hit_dead":$hitDead}""")
  }

  /** Mega-sameAs phase (run with `mega` anywhere in args): one equivalence
    * class whose all-pairs closure exceeds the 2M-pair driver bound, layered
    * over the full sf corpus — the case that ALWAYS recomputed before the
    * distributed class diff. A/Bs one edge delete (class split)
    * delta-vs-recompute; self-contained (own listener/timer).
    */
  def megaPhase(spark: SparkSession, sfDir: String): Unit = {
    val recordsRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      })
    def time[A](f: => A): (A, Double, Long) = {
      val t0 = System.nanoTime()
      val r0 = recordsRead.get()
      val r = f
      Thread.sleep(300)
      (r, (System.nanoTime() - t0) / 1e9, recordsRead.get() - r0)
    }
    def keySet(st: graft.model.GraftStore) = st.statements
      .select(xxhash64(col("s")("id"), col("p")("id"), col("o")("id"),
        coalesce(col("g")("id"), lit(0L)), col("stype")).as("k"))
    val members = 1500 // 1500·1499 ≈ 2.25M all-pairs > the 2M driver bound
    val megaNt = (1 until members).map(i =>
      s"<urn:m:0> <http://www.w3.org/2002/07/owl#sameAs> <urn:m:$i> .") ++ Seq(
      "<urn:m:0> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:c:Mega> .")
    val raw0 = graft.model.Tpch.store(spark, sfDir)
    raw0.statements.count()
    val raw = new graft.model.GraftStore(spark, raw0.statements.unionByName(
      graft.sources.Rio.readTrig(spark, megaNt.mkString("\n"))))
    val megaPath = "/tmp/graft_tmab_mega"
    val reuse = sys.env.contains("GRAFT_TMAB_REUSE") &&
      new java.io.File(megaPath + "/_SUCCESS").exists()
    val (closed, tClose, _) = time {
      if (!reuse) graft.model.GraftStore.save(
        graft.inference.Rdfs.closure(raw).statements, megaPath)
      graft.model.GraftStore.load(spark, megaPath)
    }
    val nPairs = closed.statements
      .filter(col("p")("str") === "http://www.w3.org/2002/07/owl#sameAs").count()
    println(f"TMAB-MEGA close+save+load $tClose%.2f s atRest=${graft.inference.Rdfs.inferredAtRest(closed)} saPairs=$nPairs")
    val u = "DELETE DATA { <urn:m:0> <http://www.w3.org/2002/07/owl#sameAs> <urn:m:1> . }"
    val (deltaSt, tDelta, rowsDelta) = time {
      graft.engine.Update.withTruthMaintenance(closed, u)
    }
    val path = graft.inference.Rdfs.lastTmPath
    val (fullSt, tFull, rowsFull) = time {
      val applied = graft.sparql.Parser.parseUpdate(u)
        .foldLeft(closed)(graft.engine.Update.applyOp)
      graft.inference.Rdfs.materialize(
        graft.inference.Rdfs.truthMaintain(applied))
    }
    val onlyDelta = keySet(deltaSt).exceptAll(keySet(fullSt)).count()
    val onlyFull = keySet(fullSt).exceptAll(keySet(deltaSt)).count()
    println(f"""TMAB-MEGA {"path":"$path","delta_sec":$tDelta%.2f,"full_sec":$tFull%.2f,"""
      + s""""delta_rows_read":$rowsDelta,"full_rows_read":$rowsFull,"""
      + s""""only_delta":$onlyDelta,"only_full":$onlyFull}""")
  }
}
