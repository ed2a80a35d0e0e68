package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word n-grams with an
  * evaluation/benchmark set — the standard train-set hygiene pass before model
  * training.
  *
  * Scale shape: the probe (benchmark) n-gram set is deduped and BROADCAST — eval
  * suites are tiny next to the corpus — so the corpus side is one linear shingle
  * scan with a map-side hash-join; only the (rare) matched grams reach the
  * per-document aggregation shuffle. A 100 TB corpus is never shuffled.
  */
object Decontaminate {

  /** Per-document overlap counts against the probe documents' n-gram set.
    * Returns (idCol, n_overlap) for documents with ≥ `minOverlap` distinct
    * matching n-grams.
    */
  def overlap(corpus: DataFrame, probes: DataFrame, idCol: String, textCol: String,
              n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val probeGrams = probes
      .select(split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("g"))
      .dropDuplicates("g")
    corpus
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(col(idCol), explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("g"))
      .join(broadcast(probeGrams), Seq("g"))
      .groupBy(idCol).agg(countDistinct(col("g")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }
}
