package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the connected-components pointer-jump heuristic on a given store's
  * part–supplier graph (the p_gas_cc input): runs the fixpoint with the jump
  * enabled (default gate) and disabled (jumpAfter = maxIter), printing wall
  * seconds per variant. Isolates whether the adaptive jump helps or taxes the
  * benchmark's low-diameter bipartite graph at a given scale.
  * Usage: runMain graft.tools.GasAB [sfDir] [iters]
  */
object GasAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gas-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val edges = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst")).localCheckpoint()
    edges.count()
    for (i <- 1 to iters; (label, jumpAfter) <- Seq("jump" -> 3, "nojump" -> 50)) {
      val t0 = System.nanoTime()
      val n = graft.gas.Gas.connectedComponents(edges, maxIter = 50,
        jumpAfter = jumpAfter).count()
      println(f"""GASAB {"variant":"$label","iter":$i,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
    }
    spark.stop()
  }
}
