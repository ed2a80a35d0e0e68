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
    val dir = "/root/testdata/sf0.1"
    val d = graft.engine.DfOps.spread(spark.read.parquet(dir + "/documents.parquet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("docs " + d.count())

    // current shingles: split() referenced INSIDE the transform lambda
    for (r <- 1 to 2) t(s"shingles current (run $r)") {
      d.select(col("doc_id"), explode(pipeline.Dedup.shingles(col("text"), 3)).as("g"))
        .agg(count(lit(1))).collect()
    }
    // pre-tokenized: split projected once per row, lambda slices a column ref
    def shinglesPre(toks: org.apache.spark.sql.Column, n: Int) = {
      val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
      array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }
    for (r <- 1 to 2) t(s"shingles pre-tokenized (run $r)") {
      d.withColumn("__toks", split(lower(trim(col("text"))), "\\s+"))
        .select(col("doc_id"), explode(shinglesPre(col("__toks"), 3)).as("g"))
        .agg(count(lit(1))).collect()
    }
    // decontam current vs pre-tokenized shape
    val probes = d.filter(col("doc_id") % 50 === 0)
    val corpus = d.filter(col("doc_id") % 50 =!= 0)
    for (r <- 1 to 2) t(s"decontam current (run $r)") {
      pipeline.Decontaminate.overlap(corpus, probes, "doc_id", "text").count()
    }
    spark.stop()
  }
}
