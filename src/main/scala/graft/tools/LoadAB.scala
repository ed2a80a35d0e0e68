package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the cold bulk load with and without the geo lexical-canonicalizer
  * branch in `Term.literalFromParts` — isolates whether the registered
  * datatype rewrite slows the load scan (codegen bloat) or not.
  * Usage: runMain graft.tools.LoadAB [sfDir]
  */
object LoadAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def coldLoad(label: String): Unit = {
      val base = graft.model.Tpch.storePath(dir)
      for (sfx <- Seq("", "-lexicon", "-lexicon-text"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base + sfx))
      graft.model.Tpch.dropRegistry()
      val t0 = System.nanoTime()
      graft.model.Tpch.store(spark, dir).statements.count()
      println(f"""LOADAB {"label":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    coldLoad("warmup") // JIT/page-cache warm pass
    coldLoad("with-geo")
    graft.search.GeoDatatypes.unregister(graft.search.GeoDatatypes.GeoLiteral)
    coldLoad("no-geo")
    graft.search.GeoDatatypes.register(graft.search.GeoDatatypes.Config(
      graft.search.GeoDatatypes.GeoLiteral, Seq(
        graft.search.GeoDatatypes.Field("DOUBLE", 100000L, "LATITUDE"),
        graft.search.GeoDatatypes.Field("DOUBLE", 100000L, "LONGITUDE"),
        graft.search.GeoDatatypes.Field("LONG", 1L, "TIME"))))
    coldLoad("with-geo-2")
    spark.stop()
  }
}
