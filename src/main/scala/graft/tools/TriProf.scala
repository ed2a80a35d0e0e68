package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of p_gas_triangles: where do the seconds go —
  * edge build, canonicalization, orientation, wedge join, closure join?
  * Usage: runMain graft.tools.TriProf [sfDir]
  */
object TriProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-triprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TRIPROF $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (iter <- 1 to 2) {
      println(s"--- iter $iter ---")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .dropDuplicates("o", "p")
      val edges = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      time("edges-build")(println("  n=" + edges.count()))
      val e = edges
        .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).dropDuplicates("a", "b")
      val eM = time("canonical-ckpt")(e.localCheckpoint())
      val deg = eM.select(col("a").as("v")).unionByName(eM.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val wd = eM
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      val aFirst = (col("da") < col("db")) || (col("da") === col("db") && col("a") < col("b"))
      val o = wd.select(
          when(aFirst, col("a")).otherwise(col("b")).as("src"),
          when(aFirst, col("b")).otherwise(col("a")).as("dst"),
          when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
      val oM = time("orient-ckpt")(o.localCheckpoint())
      val x = oM.select(col("src"), col("dst").as("v"), col("ddeg").as("vd"))
      val y = oM.select(col("src"), col("dst").as("w"), col("ddeg").as("wdg"))
      val wedges = x.join(y, Seq("src"))
        .filter(col("vd") < col("wdg") || (col("vd") === col("wdg") && col("v") < col("w")))
        .select("v", "w")
      time("wedge-count")(println("  wedges=" + wedges.count()))
      val t = time("closure-join")(
        wedges.join(oM.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w")).count())
      println("  triangles=" + t)
    }
    spark.stop()
  }
}
