package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Phase profiler for the minhash near-dup pipeline (VERDICT r9 item 6: is the
  * x30 exponent 0.63 shingle-explode-bound or band-join-bound?). Times the
  * signature phase (shingle explode → k-min map-side agg) separately from the
  * full candidate pipeline (signature + band-bucket self-join + verify) at
  * 1× and K× amplified sf0.1 documents. Usage: runMain graft.tools.MinhashProf [K]
  */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val amp = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.Dev.session(32)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()

    def amplify(k: Int): DataFrame =
      if (k == 1) base
      else base.select(explode(sequence(lit(0), lit(k - 1))).as("rep"),
          col("doc_id"), col("text"))
        .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          // distinct leading token per replica so replicas are near-dups of
          // each other only through their shared tail (mirrors the stress
          // harness's FK-offset amplification)
          concat(lit("rep"), col("rep"), lit(" "), col("text")).as("text"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    // first k=1 iteration is JIT warmup — read the SECOND k=1 line
    for (k <- Seq(1, 1, amp)) {
      val d = amplify(k).localCheckpoint()
      val (tSig, nSig) = time(Dedup.minhashSignature(d, "doc_id", "text").count())
      val (tFull, nPairs) = time(Dedup.minhashPairs(d, "doc_id", "text").count())
      println(f"MINHASH-PROF k=$k%d docs=${d.count()}%d sig=$tSig%.2fs ($nSig%d sigs) " +
        f"full=$tFull%.2fs ($nPairs%d pairs) bandShare=${(tFull - tSig) / tFull}%.2f")
    }
    spark.stop()
  }
}
