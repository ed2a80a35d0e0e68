package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch main: within-session A/B of GAS variants (cross-process timings on this
  * box swing ±50% with page-cache state; only same-JVM alternation is trustworthy).
  * Not part of the API.
  */
object GasProf {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(32)
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[info] PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    val edges = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count()

    // old CC: full label propagation every round (pre-round-7 shape)
    def ccFull(edges: DataFrame): DataFrame = {
      val adj = edges.select("src", "dst")
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .dropDuplicates("src", "dst")
        .repartition(col("src")).sortWithinPartitions("src")
        .localCheckpoint()
      var labels = adj.select(col("src").as("vertex"))
        .unionByName(adj.select(col("dst").as("vertex")))
        .dropDuplicates("vertex").withColumn("label", col("vertex")).localCheckpoint()
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 50) {
        iter += 1
        val nbrMin = labels.join(adj, col("vertex") === col("src"))
          .groupBy(col("dst").as("v2")).agg(min("label").as("nl"))
        val updated = labels.join(nbrMin, col("vertex") === col("v2"), "left_outer")
          .select(col("vertex"),
            least(col("label"), coalesce(col("nl"), col("label"))).as("label2"),
            col("label"))
          .localCheckpoint()
        changed = updated.filter(col("label2") < col("label")).count()
        labels = updated.select(col("vertex"), col("label2").as("label"))
      }
      labels.withColumnRenamed("label", "component")
    }

    // warmup both once
    ccFull(edges).count(); gas.Gas.connectedComponents(edges).count()
    for (i <- 1 to 3) {
      t(s"cc-old-$i") { ccFull(edges).count() }
      t(s"cc-new-$i") { gas.Gas.connectedComponents(edges).count() }
    }
    val o = spark.read.parquet(dir + "/orders.parquet")
      .select(col("o_custkey").as("src"), col("o_orderkey").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    o.count()
    for (i <- 1 to 3) t(s"pagerank-$i") { gas.Gas.pageRank(o, iters = 5).count() }
    val src = edges.agg(min("src")).first().getLong(0)
    for (i <- 1 to 3) t(s"bfs-$i") { gas.Gas.bfs(edges, src).count() }
    spark.stop()
  }
}
