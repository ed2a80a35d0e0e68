package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus curation: per-stratum sampling and the composed
  * quality → language → dedup → decontamination pass a training-data pipeline runs
  * before a model sees the data.
  */
object Curate {

  /** Deterministic per-stratum downsampling — the data-mixing knob: keep
    * 1-in-`rates(stratum)` rows by id modulus. The rate table is
    * vocabulary-sized, so selection compiles to a when-chain inside the scan —
    * no shuffle, no join, reproducible across runs and engines.
    */
  def stratifiedSample(df: DataFrame, stratCol: String, idCol: String,
                       rates: Map[String, Int], defaultRate: Int = 1): DataFrame = {
    val denom = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), denom) === 0)
  }

  /** End-to-end curation pass, composed from the individual operators:
    * quality floor → language allowlist → exact-dup keepers → drop documents
    * overlapping the probe (benchmark) set. Stays ONE lazy DataFrame plan — no
    * materialization between stages, so Catalyst fuses the scans and the only
    * shuffles are the dedup groupBy and the (matched-grams-only) overlap
    * aggregation; the decontamination probe set broadcasts.
    */
  def curate(docs: DataFrame, probes: DataFrame, idCol: String, textCol: String,
             langCol: String, langs: Seq[String], minScore: Double): DataFrame = {
    val filtered = docs
      .filter(TextStats.qualityScoreCol(col(textCol)) >= minScore)
      .filter(col(langCol).isin(langs: _*))
    val keepers = Dedup.exactKeepers(filtered, idCol, textCol)
    val contaminated = Decontaminate.overlap(filtered, probes, idCol, textCol)
      .select(col(idCol))
    keepers.join(contaminated, Seq(idCol), "left_anti")
  }
}
