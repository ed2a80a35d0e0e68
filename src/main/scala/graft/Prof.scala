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
    // GAS BFS staging
    locally {
      val li = spark.read.parquet(dir + "/lineitem.parquet")
      val edges = li.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val adj = t("bfs adjacency build") {
        edges.select("src", "dst")
          .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
          .dropDuplicates("src", "dst")
          .repartition(col("src")).sortWithinPartitions("src")
          .localCheckpoint()
      }
      println("PROF adj rows " + adj.count())
      val src = t("bfs min src")(edges.agg(min("src")).first().getLong(0))
      import spark.implicits._
      var visited = Seq((src, 0)).toDF("vertex", "level").localCheckpoint()
      var frontier = visited
      var level = 0
      var n = 1L
      while (n > 0 && level < 50) {
        level += 1
        val t0 = System.nanoTime()
        val next = frontier.join(adj, col("vertex") === col("src"))
          .select(col("dst").as("vertex")).dropDuplicates("vertex")
          .join(visited, Seq("vertex"), "left_anti")
          .withColumn("level", lit(level)).localCheckpoint()
        n = next.count()
        println(f"PROF bfs round $level frontier=$n%8d  ${(System.nanoTime() - t0) / 1e9}%6.3f s")
        if (n > 0) { visited = visited.unionByName(engine.DfOps.reid(next)); frontier = next }
      }
    }
    // q_collection staging
    val stU = t("update: insert list") {
      engine.Update(store, "INSERT DATA { <urn:q:list> <urn:p:items> ( 10 20 30 ) . }")
    }
    t("updated statements count")(stU.statements.count())
    t("collection query") {
      engine.Engine.query(stU,
        """SELECT ?m WHERE { <urn:q:list> <urn:p:items> ?l .
          |  ?l (<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>)*/<http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?m }""".stripMargin).count()
    }
    t("collection query 2nd") {
      engine.Engine.query(stU,
        """SELECT ?m WHERE { <urn:q:list> <urn:p:items> ?l .
          |  ?l (<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>)*/<http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?m }""".stripMargin).count()
    }
    // minhash staging
    val d = spark.read.parquet(dir + "/documents.parquet")
    println("PROF docs rows " + d.count())
    d.agg(avg("n_chars"), avg(size(split(col("text"), "\\s+")))).show()
    t("split+explode tokens") {
      println("PROF tok rows " + d.select(explode(split(lower(trim(col("text"))), "\\s+"))).count())
    }
    t("shingle explode only") {
      println("PROF shingle rows " +
        d.select(col("doc_id"), explode(pipeline.Dedup.shingles(col("text"), 3)).as("sh")).count())
    }
    t("shingle+hash explode") {
      d.select(col("doc_id"),
        explode(transform(pipeline.Dedup.shingles(col("text"), 3), s => xxhash64(s))).as("h"))
        .agg(bit_xor(col("h"))).collect()
    }
    t("map-only signature") {
      val withH = d.select(col("doc_id").as("id"),
        transform(pipeline.Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("hs"))
        .filter(size(col("hs")) > 0)
      val sigCol = transform(sequence(lit(0), lit(31)),
        i => array_min(transform(col("hs"), h => xxhash64(h, i))))
      withH.select(col("id"), sigCol.as("sig")).agg(bit_xor(element_at(col("sig"), 1))).collect()
    }
    val sig = t("minhash signatures") {
      pipeline.Dedup.minhashSignature(d, "doc_id", "text").localCheckpoint()
    }
    t("minhash signatures warm") {
      pipeline.Dedup.minhashSignature(d, "doc_id", "text").count()
    }
    println("PROF sig rows " + sig.count())
    t("minhash pairs (from sig)") {
      // band + self-join part only, replicated from minhashPairs
      val bands = 8; val rows = 4; val k = 32
      val banded = sig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      val l = banded.select(col("band"), col("bh"), col("id").as("a"), col("sig").as("siga"))
      val r = banded.select(col("band"), col("bh"), col("id").as("b"), col("sig").as("sigb"))
      val cand = l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
        .select("a", "b", "siga", "sigb").dropDuplicates("a", "b")
      val n = cand.withColumn("est_jaccard",
        aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc2, v) => acc2 + v).cast("double") / k)
        .filter(col("est_jaccard") >= 0.7).count()
      println("PROF pairs rows " + n)
    }
    t("full minhashPairs")(pipeline.Dedup.minhashPairs(d, "doc_id", "text").count())
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
