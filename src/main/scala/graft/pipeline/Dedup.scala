package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * All operators are pure DataFrame pipelines: shingle/token explosion, columnar hashing
  * (xxhash64 = codegen'd), aggregation with map-side partial combine, and band-bucket
  * self-joins instead of all-pairs comparison — the standard shape that scales to
  * billions of documents (candidate generation is linear in corpus size; only
  * within-bucket pairs are compared).
  */
object Dedup {

  /** Exact dedup: canonical keeper (min id) per identical text. Groups on the
    * 8-byte content hash, NOT the text column — the exchange carries (id, hash)
    * instead of whole documents, which is the difference between shuffling
    * ~16 B/doc and shuffling the full 100 TB corpus. (64-bit collisions are
    * negligible below billions of docs; pair (hash, length) or a 128-bit hash
    * when they are not.)
    */
  def exactKeepers(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), xxhash64(col(textCol)).as("__th"))
      .groupBy("__th").agg(min(col(idCol)).as(idCol)).select(idCol)

  /** Exact-dup groups of size > 1: (keeper, dup) pairs. */
  def exactPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = docs.select(col(idCol).as("id"), xxhash64(col(textCol)).as("th"))
    val keep = h.groupBy("th").agg(min("id").as("keeper"))
    h.join(keep, "th").filter(col("id") =!= col("keeper"))
      .select(col("keeper"), col("id").as("dup"))
  }

  /** Cross-document segment dedup — the boilerplate-removal pass of web-corpus
    * curation pipelines (drop any fixed-width token span that repeats across more
    * than `maxDf` documents: navbars, footers, license blurbs), per the approach
    * popularized by the CCNet/RefinedWeb line of work. Documents are chunked into
    * consecutive `w`-token segments; each distinct segment's document frequency is
    * counted corpus-wide; documents are rebuilt in order from the segments with
    * df ≤ maxDf. Output: (id, text, n_kept, n_dropped) — one row per input doc,
    * text possibly empty when every segment was boilerplate.
    *
    * Scale shape: segment chunking is O(tokens) map-side; the df count is a
    * map-side-combined aggregate on the segment hash; the join back is
    * co-partitioned on that same hash; reassembly is one per-doc aggregate with an
    * order-preserving sorted collect. No all-pairs comparison anywhere. md5 keys
    * keep the hash family engine-portable for the oracle.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   w: Int = 12, maxDf: Long = 1): DataFrame = {
    val withSegs = graft.engine.DfOps.spread(docs)
      .withColumn("__w", tokens(col(textCol)))
      .withColumn("__segs", transform(
        sequence(lit(0), greatest((ceil(size(col("__w")) / w.toDouble) - 1).cast("int"), lit(0))),
        i => array_join(slice(col("__w"), i * w + 1, lit(w)), " ")))
      .select(col(idCol), posexplode(col("__segs")).as(Seq("pos", "seg")))
    val seg = withSegs.withColumn("sh", md5(col("seg")))
    val segDf = seg.groupBy("sh").agg(countDistinct(col(idCol)).as("df"))
    val kept = seg.join(segDf, "sh").filter(col("df") <= maxDf)
    val tot = seg.groupBy(idCol).agg(count(lit(1)).as("n_seg"))
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
        s => s("seg")), " ").as(textCol),
      count(lit(1)).as("n_kept"))
    tot.join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_seg") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  private def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles of a text column (lower-cased, whitespace-tokenized). */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(split(lower(trim(text)), "\\s+"), n)

  /** Sliding n-grams over a PRE-SPLIT token array. Hot operators project the
    * token array into a column first and pass the column reference here: an
    * expression tree referenced inside the `transform` lambda is re-evaluated
    * per element, so inlining the split costs O(tokens²) per document (measured
    * 2.4× on the shingle scan at sf0.1) — a bound column reference costs O(1).
    */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    // sliding n-grams via transform over index range
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(transform(idx, i => concat_ws(" ",
      slice(toks, i + 1, lit(n)))))
  }


  /** MinHash signatures: k independent hash mins over the shingle set.
    *
    * Explode + partial-aggregate: the k mins compute map-side (HashAggregate partial)
    * before the per-doc shuffle, so the exchange carries one k-long signature per doc —
    * shuffle volume is O(docs·k), not O(shingles). (A fully map-only variant via
    * `array_min∘zip_with` over the shingle array measured ~40% slower here: per-row
    * array allocation beats the partial-agg shuffle only when signatures are recomputed
    * many times per doc.)
    */
  /** Hash family for MinHash/LSH. The default xxhash64 family hashes each shingle
    * string once and mixes the 8-byte value per member (k× cheaper than re-hashing
    * the string). The md5 family is ENGINE-PORTABLE — md5 hex strings are identical
    * in any SQL engine, and the lexicographic min of hex strings is a valid
    * min-hash — so an external oracle can reproduce signatures, bands and
    * candidate pairs bit-for-bit. Use xx for production scale, md5 under
    * verification.
    */
  final case class HashFamily(shingle: Column => Column,
                              member: (Column, Int) => Column,
                              band: (Column, Column) => Column)
  val xxFamily: HashFamily = HashFamily(
    s => xxhash64(s), (h, i) => xxhash64(h, lit(i)), (c, b) => xxhash64(c, b))
  val md5Family: HashFamily = HashFamily(
    s => md5(s), (h, i) => md5(concat(h, lit("#" + i))),
    (c, b) => md5(concat(c, lit("@"), b.cast("string"))))

  def minhashSignature(docs0: DataFrame, idCol: String, textCol: String,
                       k: Int = 32, shingleN: Int = 3,
                       family: HashFamily = xxFamily): DataFrame = {
    val docs = graft.engine.DfOps.spread(docs0)
    // tokens projected once per row (see shinglesOfTokens — lambda-inlined split
    // would re-split per shingle index)
    val sh = docs.select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(col("id"),
        explode(transform(shinglesOfTokens(col("__toks"), shingleN), family.shingle)).as("h"))
    val mins = (0 until k).map(i => min(family.member(col("h"), i)).as(s"m$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup candidate pairs with signature-estimated Jaccard.
    * bands×rows = k; two docs collide if any band of `rows` consecutive minhashes
    * matches. Returns (a, b, est_jaccard) with a < b, est ≥ threshold.
    *
    * `bucketCap` (0 = off) is the pair-explosion guard: a band bucket holding n
    * docs yields n(n−1)/2 candidate pairs, so one pathological mega-family (a
    * mirror-heavy crawl with millions of near-identical pages) turns the
    * otherwise-linear candidate stage quadratic no matter how good the banding
    * is. With a cap, buckets larger than `bucketCap` are DROPPED before the
    * self-join (their members report no pairs through that band) and the
    * dropped mass is logged — the corpus-level dup-rate governance
    * (`dupRateBySource`) still surfaces the family itself. The cap bounds
    * worst-case pairs at docs·bands·bucketCap/2 — linear again.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                   threshold: Double = 0.7,
                   family: HashFamily = xxFamily,
                   bucketCap: Int = 0): DataFrame = {
    val rows = k / bands
    val sig = minhashSignature(docs, idCol, textCol, k, shingleN, family).localCheckpoint()
    val banded0 = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => family.band(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val banded = if (bucketCap <= 0) banded0 else {
      // one count aggregation over the (docs·bands)-row banded frame — the same
      // (band,bh) keys the self-join below shuffles on, and `sig` is already
      // checkpointed, so the guard costs one small keyed exchange, not a rescan
      // of the corpus. The dropped-mass probe is an eager bounded aggregate:
      // governance must be observable, not silent (SCALE.md "no silent caps").
      val counted = banded0.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bh")))
        .localCheckpoint()
      val d = counted.filter(col("__n") > bucketCap)
        .agg(count(lit(1)).as("r"), approx_count_distinct("bh").as("b"))
        .collect()(0)
      if (d.getLong(0) > 0)
        System.err.println(s"graft.Dedup.minhashPairs: bucketCap=$bucketCap dropped " +
          s"${d.getLong(0)} banded rows across ~${d.getLong(1)} over-cap buckets " +
          "(mega-family guard; dup-rate governance still reports the family)")
      counted.filter(col("__n") <= bucketCap).drop("__n")
    }
    val l = banded.select(col("band"), col("bh"), col("id").as("a"), col("sig").as("siga"))
    val r = banded.select(col("band"), col("bh"), col("id").as("b"), col("sig").as("sigb"))
    val cand = l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select("a", "b", "siga", "sigb").dropDuplicates("a", "b")
    cand.withColumn("est_jaccard",
      aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select("a", "b", "est_jaccard")
  }

  /** Exact n-gram Jaccard for candidate pairs (verification stage after LSH). */
  def ngramJaccard(docs0: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, shingleN: Int = 3): DataFrame = {
    val docs = graft.engine.DfOps.spread(docs0)
    val sh = docs.select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(col("id"), shinglesOfTokens(col("__toks"), shingleN).as("sh"))
    pairs.select("a", "b")
      .join(sh.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sh.select(col("id").as("b"), col("sh").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard", col("inter") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .select("a", "b", "jaccard")
  }

  /** Content-blocked exact near-dup pairs: block on the lexicographically smallest
    * shingle (identity-ordered MinHash, k=1 — near-dups almost always share their
    * minimum shingle), verify exact n-gram Jaccard within the block. Fully
    * deterministic, so an external SQL oracle can reproduce it — the hashed MinHash
    * family can't be. Same linear candidate-generation scaling as LSH.
    */
  def minShinglePairs(docs0: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = graft.engine.DfOps.spread(docs0)
    // the block key stays the lexicographic-min shingle STRING (oracle-reproducible);
    // the verification arrays carry 8-byte shingle hashes, not 40-char strings — the
    // within-block join shuffles ~10× less and the shingling computes once
    val sh = docs.select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(col("id"), shinglesOfTokens(col("__toks"), shingleN).as("shs"))
      .select(col("id"), array_min(col("shs")).as("key"),
        transform(col("shs"), s => xxhash64(s)).as("hs"))
      .localCheckpoint()
    val l = sh.select(col("key"), col("id").as("a"), col("hs").as("ha"))
    val r = sh.select(col("key"), col("id").as("b"), col("hs").as("hb"))
    l.join(r, Seq("key")).filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("double"))
      .withColumn("jaccard", col("inter") /
        (size(col("ha")) + size(col("hb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Near-dup clusters: candidate pairs → connected components → canonical keeper
    * (min doc id per component). Transitively-linked near-dups (A≈B≈C with A≉C)
    * collapse to ONE keeper — the standard corpus-dedup semantics that pairwise
    * drop-lists get wrong. Returns (doc_id, keeper) for every doc in a cluster.
    * Scale shape: pairs are block-bucketed (linear), CC runs in id space over the
    * pair graph only (dup clusters ≪ corpus).
    */
  def dupClusters(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = minShinglePairs(docs, idCol, textCol, shingleN, threshold)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
    val cc = graft.gas.Gas.connectedComponents(edges)
    cc.select(col("vertex").as("doc_id"), col("component").as("keeper"))
  }

  /** Survivorship over near-dup clusters: within each `dupClusters` component
    * keep the best document by (quality desc, id asc) instead of blindly keeping
    * the min id — the curation decision real pipelines make (keep the longest /
    * highest-quality member, drop the rest). Returns (doc_id, canonical_id,
    * is_dup) for every clustered doc.
    *
    * Scale shape: the cluster relation holds only docs with a candidate pair
    * (≪ corpus); the quality join is co-partitioned on the doc id and the
    * per-component window sorts component-local rows, so nothing here touches
    * corpus-sized data beyond the candidate generation itself.
    */
  def canonicalKeepers(docs: DataFrame, idCol: String, textCol: String,
                       qualityCol: String, shingleN: Int = 3,
                       threshold: Double = 0.5): DataFrame = {
    val clusters = dupClusters(docs, idCol, textCol, shingleN, threshold)
    val q = docs.select(col(idCol).as("doc_id"), col(qualityCol).as("__q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("keeper").orderBy(col("__q").desc, col("doc_id").asc)
    clusters.join(q, "doc_id")
      .withColumn("canonical_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }

  /** Per-group duplication-rate report — the corpus-governance metric that
    * decides which sources need dedup attention: for each `groupCol` value,
    * how many docs, how many are exact dups of an earlier doc (same content
    * hash, higher id — anywhere in the corpus, not just within the group), and
    * the dup fraction.
    *
    * Scale shape: one exchange on the 8-byte content hash (first-occurrence
    * ranking), then a map-side-combined rollup on the group key. Documents
    * themselves never shuffle.
    */
  def dupRate(docs: DataFrame, idCol: String, textCol: String,
              groupCol: String): DataFrame = {
    // "is a dup" = id ≠ min(id) of its content-hash group. A min aggregate +
    // co-partitioned join keeps mega-duplicate groups (boilerplate pages with
    // millions of copies) in map-side partial aggregation — a row_number window
    // over the hash partition would sort every copy through ONE reducer.
    val h = docs.select(col(groupCol), col(idCol), xxhash64(col(textCol)).as("__th"))
    val first = h.groupBy("__th").agg(min(col(idCol)).as("__keep"))
    h.join(first, "__th")
      .groupBy(groupCol).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(idCol) =!= col("__keep"), 1L).otherwise(0L)).as("n_dups"))
      .withColumn("dup_frac", round(col("n_dups") / col("n_docs"), 6))
  }

  /** Exact-substring (span-level) dedup signal — the sliding-window complement
    * of [[segmentDedup]]'s fixed chunks: a k-token window appearing verbatim in
    * ≥2 DISTINCT documents marks a cross-document duplicated span at ANY
    * offset (fixed chunks miss spans that straddle chunk boundaries; this is
    * the window-hash approximation of suffix-array exact-substring dedup from
    * the "Deduplicating Training Data Makes Language Models Better" line of
    * work). Output per doc: (id, n_windows, n_dup) — total k-token windows and
    * how many of its window occurrences are cross-document duplicated spans.
    *
    * Scale shape: window hashing is O(tokens·k) map-side; the doc-frequency
    * count is a map-side-combined aggregate on the 8-byte window hash; the
    * dup-marking join is co-partitioned on that same hash (exchange reuse);
    * no all-pairs work anywhere. Exchanges carry (hash, id, count) rows only —
    * the corpus text never shuffles.
    */
  def duplicatedSpans(docs0: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    val toked = graft.engine.DfOps.spread(docs0)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
    val wins = toked
      .filter(size(col("__t")) >= k)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__t")) - k),
        i => xxhash64(concat_ws(" ", slice(col("__t"), i + 1, lit(k)))))).as("__wh"))
    val wd = wins.groupBy(col("__wh"), col(idCol)).agg(count(lit(1)).as("__n"))
    val docFreq = wd.groupBy("__wh").agg(count(lit(1)).as("__docs"))
    val dup = wd.join(docFreq, "__wh").filter(col("__docs") >= 2)
      .groupBy(idCol).agg(sum("__n").as("n_dup"))
    toked.select(col(idCol),
        greatest(size(col("__t")) - (k - 1), lit(0)).cast("long").as("n_windows"))
      .join(dup, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"), coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** 64-bit SimHash over tf-weighted tokens. */
  /** Engine-portable 60-bit token hash: exact integer fold of the first 15 md5 hex
    * digits — any SQL engine reproduces it (the oracle's list_reduce mirrors the
    * conv()). Production callers use the default xxhash64 (full 64 bits, cheaper).
    */
  val md5TokenHash: Column => Column = t =>
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  def simhash(docs0: DataFrame, idCol: String, textCol: String,
              tokenHash: Column => Column = xxhash64(_), nBits: Int = 64): DataFrame = {
    val docs = graft.engine.DfOps.spread(docs0)
    val toks = docs.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("th", tokenHash(col("tok")))
    val bitSums = (0 until nBits).map { i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"b$i")
    }
    val agg = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until nBits).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (pigeonhole banding on 4 equal
    * chunks: any pair within hamming ≤3 shares at least one exact chunk).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   tokenHash: Column => Column = xxhash64(_), nBits: Int = 64): DataFrame = {
    val sh = simhash(docs, idCol, textCol, tokenHash, nBits).localCheckpoint()
    val chunkW = nBits / 4
    val mask = (1L << chunkW) - 1L
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * chunkW).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cv")
    val l = chunked.select(col("chunk"), col("cv"), col("id").as("a"), col("simhash").as("ha"))
    val r = chunked.select(col("chunk"), col("cv"), col("id").as("b"), col("simhash").as("hb"))
    l.join(r, Seq("chunk", "cv")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
