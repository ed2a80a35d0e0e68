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

  /** Engine-portable uniform draw in [0,1): 60-bit md5 fold of the key string
    * over 2^60 (see Dedup.md5TokenHash). Deterministic and bit-identical in any
    * SQL engine, so sampling decisions are reproducible across runs AND engines.
    */
  def uniformOf(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Dedup.md5TokenHash(key.cast("string")).cast("double") / lit(math.pow(2.0, 60))

  /** Temperature-weighted source sampling — the data-mixing law of multi-source
    * training corpora (sampling rate ∝ mass^(1/T), T>1 upweights small sources).
    * Keeps an expected `targetFrac` of the total mass, allocated across sources by
    * tempered weight; per-document decisions are the deterministic md5 uniform, so
    * the sample is stable under re-runs, engine changes, and partitioning.
    *
    * Scale shape: one vocabulary-sized aggregate (per-source masses), rates
    * broadcast back onto the scan — the document table is filtered in place, no
    * data-sized shuffle anywhere.
    */
  def temperatureSample(df: DataFrame, srcCol: String, idCol: String,
                        massCol: String, temperature: Double,
                        targetFrac: Double): DataFrame = {
    val mass = df.groupBy(srcCol).agg(sum(col(massCol)).cast("double").as("__m"))
      .withColumn("__w", pow(col("__m"), lit(1.0 / temperature)))
    val tot = mass.agg(sum("__m").as("__tm"), sum("__w").as("__tw"))
    val rates = mass.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0),
        lit(targetFrac) * col("__tm") * col("__w") / (col("__tw") * col("__m"))))
      .select(col(srcCol), col("__rate"))
    df.join(broadcast(rates), Seq(srcCol))
      .filter(uniformOf(col(idCol)) < col("__rate"))
      .select(df.columns.map(col): _*)
  }

  /** Greedy sequence packing over token counts — the sample-packing layout pass
    * that groups documents into fixed-size context windows before tokenization.
    * Documents are laid out in deterministic (source, id) order; a document's bin
    * is the window its first token lands in (cumulative-sum law, document
    * boundaries preserved). Returns per-bin occupancy: (source, bin, n_docs,
    * sum_toks) — the fill-ratio report that sizes a packing run.
    *
    * Scale shape: the running sum is windowed PER SOURCE, never globally — the
    * sort is within a source's partition. For a 100 TB corpus a single source
    * still outgrows one reducer: pre-shard the source column (e.g. append
    * `pmod(id, shards)`) and pack within shards — the law is unchanged.
    */
  def packSequences(df: DataFrame, srcCol: String, idCol: String,
                    textCol: String, window: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(srcCol).orderBy(idCol)
    df.select(col(srcCol), col(idCol), TextStats.tokenCount(col(textCol)).as("__toks"))
      .withColumn("__cum", sum(col("__toks")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("__toks")) / lit(window.toDouble)).cast("long"))
      .groupBy(col(srcCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("sum_toks"))
  }

  /** Fixed-size token-window chunking with overlap — the context-window prep
    * stage of RAG / pretraining pipelines: each document becomes ⌈tokens/stride⌉
    * chunks of `chunkSize` tokens, consecutive chunks sharing `overlap` tokens.
    * Output: (id, chunk_id, chunk_text, n_tokens); the final chunk is short.
    *
    * Scale shape: a pure per-row map — tokenize once, explode the stride-spaced
    * start offsets, slice. ZERO shuffles; chunking 100 TB is scan-bound, and the
    * chunk rows inherit the input partitioning for the downstream embed/index
    * stage.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int = 512, overlap: Int = 64): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkSize))).cast("long")
          .as("n_tokens"))
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

  /** Deterministic train/val/test fold assignment — the last step before a
    * training corpus ships. A document's fold is a pure function of its id
    * (the engine-portable md5 uniform), so the split is stable under re-runs,
    * engine changes, repartitioning, and incremental corpus growth: adding
    * documents never migrates an existing one between folds (the leakage-free
    * property random splits lose). val and test are carved off the bottom of
    * the uniform range; everything else is train.
    *
    * Scale shape: one map-side expression per row — no shuffle, no join, no
    * state. The fold column composes directly with partitioned writes
    * (`partitionBy("fold")`).
    */
  def trainValTestSplit(df: DataFrame, idCol: String,
                        valFrac: Double, testFrac: Double): DataFrame = {
    val u = uniformOf(col(idCol))
    df.withColumn("fold",
      when(u < valFrac, "val")
        .when(u < valFrac + testFrac, "test")
        .otherwise("train"))
  }

  /** Per-key document cap — the "at most K documents per domain/source"
    * curation rule that stops a handful of giant crawl domains from dominating
    * a corpus. Deterministic keeper: the K smallest `idCol` values per key.
    * One keyed exchange (window over keyCol); a skewed mega-key costs a single
    * partition's sort of ITS OWN rows only — at 100 TB, pre-aggregate counts
    * tell you the skew before you pay for it (Dedup.dupRate does the same).
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic shard manifest for reproducible corpus exports: every doc
    * routes to `pmod(md5(id), shards)` — stable under re-runs, engines, and
    * input partitioning (unlike `repartition`'s round-robin) — and the
    * manifest row per shard carries (doc count, char mass, order-independent
    * content checksum). A consumer re-derives the same shards from the same
    * corpus and validates them against the manifest; at 100 TB this is one
    * map-side-combined keyed aggregate over `shards` groups. The checksum
    * sums per-doc 31-bit md5 folds (bounded far below long overflow), so it
    * is commutative across partitions and exact in any engine.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    shards: Int): DataFrame =
    df.select(
        pmod(Dedup.md5TokenHash(col(idCol).cast("string")), lit(shards.toLong)).as("shard"),
        length(col(textCol)).cast("long").as("len"),
        pmod(Dedup.md5TokenHash(col(textCol)), lit(1L << 31)).as("h31"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("n_chars"),
        sum("h31").as("checksum"))

  /** One-pass dataset profile — the audit a corpus runs before training: per
    * column, row count, null count, distinct count, and min/max (as strings).
    * Compiles to ONE aggregate over the table (multiple COUNT DISTINCTs plan
    * through Expand — still a single scan) and a driver-free unpivot of the
    * one result row; at 100 TB it is the cheapest complete QA sweep there is.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val all = count(lit(1)).as("__n") +: aggs
    val row = df.agg(all.head, all.tail: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select(col("p")("col_name").as("col_name"), col("p")("n_rows").as("n_rows"),
        col("p")("n_nulls").as("n_nulls"), col("p")("n_distinct").as("n_distinct"),
        col("p")("min_value").as("min_value"), col("p")("max_value").as("max_value"))
  }
}
