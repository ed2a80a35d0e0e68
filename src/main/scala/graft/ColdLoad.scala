package graft
object ColdLoad {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(32)
    val t0 = System.nanoTime()
    model.Tpch.store(spark, "/root/testdata/sf0.1").statements.count()
    println(f"COLD LOAD ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
