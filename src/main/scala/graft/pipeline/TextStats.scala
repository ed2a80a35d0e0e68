package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting, quality
  * scoring, language identification, document fingerprinting. All pure columnar
  * expressions (codegen'd) — no UDFs in the hot path.
  */
object TextStats {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-style pre-tokenizer pattern (BPE-ish): contraction suffixes, letter runs,
    * digit runs, punctuation runs — each with an optional leading space. RE2-safe
    * (no lookarounds) so external engines reproduce the same splits.
    */
  val BPE_PATTERN = "'[a-z]{1,2}| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** Pre-tokenization token count — the LLM-pipeline "how many BPE-ish tokens"
    * estimator (a real BPE then splits within these pieces, so this lower-bounds
    * and tightly tracks the true count).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BPE_PATTERN), lit(0))).cast("long")

  /** Quality features: chars, words, avg word length, punctuation ratio, digit ratio,
    * uppercase ratio, stopword ratio — the usual cheap heuristics.
    */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val chars = length(t).cast("double")
    val words = tokenCount(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("double")
    val digits = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val uppers = (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    val stop = stopwordCount(t, EN_STOP).cast("double")
    docs.select(col(idCol),
      chars.as("chars"), words.as("words"),
      (chars / words).as("avg_word_len"),
      (punct / chars).as("punct_ratio"),
      (digits / chars).as("digit_ratio"),
      (uppers / chars).as("upper_ratio"),
      (stop / words).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1] as a single Column over the text (streaming-
    * composable: pure expression, no projection).
    */
  def qualityScoreCol(t: Column): Column = {
    val chars = length(t).cast("double")
    val words = tokenCount(t).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("double")
    val digits = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val stop = stopwordCount(t, EN_STOP).cast("double")
    least(words / 20.0d, lit(1.0d)) * 0.25d +
      least((stop / words) * 3.0d, lit(1.0d)) * 0.35d +
      greatest(lit(0.0d), lit(1.0d) - (punct / chars) * 8.0d) * 0.2d +
      greatest(lit(0.0d), lit(1.0d) - (digits / chars) * 5.0d) * 0.2d
  }

  /** Composite quality score in [0,1]: penalize extreme lengths, high punct/digit
    * ratios, low stopword ratio (boilerplate/code smell).
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), qualityScoreCol(col(textCol)).as("quality"))

  private val EN_STOP = Seq("the", "of", "and", "to", "a", "in", "is", "it", "that",
    "was", "for", "on", "are", "with", "as", "be", "at", "by", "this", "have", "from")
  private val DE_STOP = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu",
    "den", "von", "mit", "nicht", "auf", "sich", "des", "im", "dem", "für", "an", "auch")
  private val FR_STOP = Seq("le", "la", "les", "de", "des", "et", "est", "un", "une",
    "du", "dans", "que", "qui", "pour", "sur", "pas", "avec", "au", "par", "ce")
  private val ES_STOP = Seq("el", "la", "los", "las", "de", "y", "es", "un", "una",
    "en", "que", "del", "se", "por", "con", "para", "su", "al", "lo", "como")

  private def stopwordCount(text: Column, stops: Seq[String]): Column =
    size(filter(tokens(text), tk => tk.isin(stops: _*)))

  /** Stopword-profile language ID over {en,de,fr,es}: argmax of per-language stopword
    * hit counts, "und" → unknown when no profile fires (n-gram-free heuristic; a
    * production version adds char-trigram profiles the same columnar way).
    */
  def langIdCol(text: Column): Column = {
    val tk = tokens(text)
    def hits(stops: Seq[String]) = size(filter(tk, t => t.isin(stops: _*)))
    val (en, de, fr, es) = (hits(EN_STOP), hits(DE_STOP), hits(FR_STOP), hits(ES_STOP))
    val best = greatest(en, de, fr, es)
    when(best === 0, "und")
      .when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .otherwise("es")
  }

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), langIdCol(col(textCol)).as("lang_pred"))

  /** Repetition ratio in [0,1): fraction of word n-gram shingles that are repeats
    * (1 − distinct/total) — the cheap detector for degenerate/boilerplate text
    * (crawler nav bars, model loops). 0 = no repeated n-gram.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column =
    repetitionRatioOfTokens(tokens(text), n)

  /** Same over a pre-split token column — use from a projection so the split is
    * not re-evaluated per shingle index inside the lambda (see
    * Dedup.shinglesOfTokens for the measured cost).
    */
  def repetitionRatioOfTokens(toks: Column, n: Int = 3): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    val all = transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    lit(1.0d) - size(array_distinct(all)).cast("double") / size(all).cast("double")
  }

  /** Per-document token-concentration signals (the Gopher-style "most common
    * word fraction" quality rule): `top_tok_frac` = occurrences of the most
    * frequent token / total tokens, `distinct_frac` = distinct/total. Computed
    * SHUFFLE-FREE per document: sort the token array and run-length scan it with
    * one `aggregate` lambda (O(n log n) per doc inside the map task) — no
    * explode, no (doc, token) exchange, so it holds at corpus scale where an
    * explode would multiply the shuffle by average document length.
    */
  def tokenConcentration(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(tokens(col(textCol)), x => x =!= "")
    val sorted = array_sort(toks)
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("mx"), lit(0L).as("dis"))
    val acc = aggregate(sorted, zero, (a, x) => {
      val run = when(a("prev") === x, a("run") + 1L).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"), greatest(a("mx"), run).as("mx"),
        (a("dis") + when(a("prev") === x, 0L).otherwise(1L)).as("dis"))
    })
    docs
      .withColumn("__tc", acc).withColumn("__n", size(toks).cast("long"))
      .select(col(idCol),
        when(col("__n") > 0, col("__tc")("mx").cast("double") / col("__n"))
          .otherwise(0.0).as("top_tok_frac"),
        when(col("__n") > 0, col("__tc")("dis").cast("double") / col("__n"))
          .otherwise(0.0).as("distinct_frac"))
  }

  /** PII pattern counts (emails, phone-shaped numbers, IPv4) — the filter/redaction
    * pre-pass of a training-data pipeline. Pure regexp counts; RE2-safe patterns.
    */
  val EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE_PATTERN = "\\+?[0-9][0-9()\\- ]{7,14}[0-9]"
  val IPV4_PATTERN = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def piiCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      size(regexp_extract_all(t, lit(EMAIL_PATTERN), lit(0))).cast("long").as("emails"),
      size(regexp_extract_all(t, lit(PHONE_PATTERN), lit(0))).cast("long").as("phones"),
      size(regexp_extract_all(t, lit(IPV4_PATTERN), lit(0))).cast("long").as("ipv4s"))
  }

  /** PII redaction: replace matched spans with typed placeholder tokens — the
    * mutation counterpart of piiCounts (count → filter threshold, redact → keep
    * the document). Pure regexp_replace chain: linear scan, codegen'd, no shuffle.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EMAIL_PATTERN, "[EMAIL]"),
          IPV4_PATTERN, "[IP]"),
        PHONE_PATTERN, "[PHONE]").as("redacted"))

  /** Corpus-wide heavy hitters: the k most frequent tokens, exactly. Two-stage
    * shape: explode → map-side-combined count (shuffle = distinct tokens, not
    * token instances) → TakeOrderedAndProject for the top k (per-partition heads
    * only, never a global sort). Ties break lexicographically so the cut is
    * deterministic. The approximate analog at unbounded vocabulary is a
    * count-min/space-saving sketch; for natural-language token distributions the
    * exact aggregate is already scale-safe (vocabulary ≪ corpus).
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame =
    graft.engine.DfOps.spread(docs)
      .select(explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)

  /** Winnowing-style document fingerprint: min hash over word 3-gram shingles
    * (robust to small edits; equal fingerprints → near-dup candidates). The hash is
    * md5-hex rather than xxhash64 so the min is engine-portable (cross-checkable in
    * any SQL engine) while still randomizing WHICH shingle wins — a lexicographic
    * min over raw shingles would bias toward punctuation-led text.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .select(col(idCol),
        array_min(transform(Dedup.shinglesOfTokens(col("__toks"), n), sh => md5(sh)))
          .as("fingerprint"))

  /** Corpus-relative unigram frequency statistics — the frequency/perplexity
    * quality signal of C4/RefinedWeb-style pipelines (documents whose tokens are
    * rare under the corpus' own unigram distribution read as unnatural). Returns
    * exact integers per document: token count and the sum of corpus frequencies
    * of its tokens (exact → externally verifiable; divide for the mean, or take
    * -log for a perplexity proxy).
    *
    * Scale shape: the token-count table is built by one map-side-combined
    * aggregate over the exploded corpus; the per-document stats re-join tokens
    * against it on the token key — both linear, no all-pairs anything.
    */
  /** Distributed BPE-merge learning — the tokenizer-training primitive: learn
    * the top `merges` byte-pair merges over the corpus, greedy-left-to-right
    * merge semantics (the standard BPE tokenizer-training rule). Returns the
    * merge table (merge_rank, lhs, rhs, cnt) with deterministic tie-breaking
    * (count desc, then lexicographic).
    *
    * Scale shape: sequences live per DISTINCT word with a frequency — the
    * corpus collapses to its vocabulary before any per-character work, so each
    * round is one map-side-combined bigram count over vocab-sized data plus a
    * columnar re-merge fold; only the single argmax row hits the driver per
    * round. 100 TB of text with a 10M-word vocabulary iterates over 10M rows,
    * not the corpus.
    */
  /** One greedy left-to-right BPE merge pass over a piece sequence: adjacent
    * (a, b) becomes a+b, and a pair merges only when its left member was NOT
    * itself consumed by the preceding merge — the fold's last element can never
    * equal `a` right after a merge (merged = a+b ≠ a).
    */
  private def mergeFold(seq: Column, a: String, b: String): Column =
    aggregate(seq, array().cast("array<string>"),
      (acc, t) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && t === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(t))))

  /** Apply TRAINED merges to a corpus and report the per-document BPE piece
    * count — the tokenizer-application pass of a training pipeline. The encode
    * runs on DISTINCT WORDS (vocabulary-sized, one `mergeFold` per merge rank
    * in order), and the corpus only broadcast-joins the word→pieces map — at
    * 100 TB the expensive part never touches the documents, mirroring
    * bpeTrainMerges' vocab-sized iteration.
    */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val vocab = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0).dropDuplicates("w")
    var enc = vocab.select(col("w"), array_remove(split(col("w"), ""), "").as("seq"))
    // one select per merge keeps each generated expression bounded (a single
    // nested column tree across N merges would stack N aggregate lambdas)
    merges.foreach { case (a, b) =>
      enc = enc.select(col("w"), mergeFold(col("seq"), a, b).as("seq"))
    }
    val pieces = enc.select(col("w"), size(col("seq")).cast("long").as("n"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(pieces), "w")
      .groupBy(idCol).agg(sum("n").as("n_pieces"))
  }

  def bpeTrainMerges(docs: DataFrame, idCol: String, textCol: String,
                     merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = graft.engine.DfOps.spread(docs)
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // Java split("", -1) keeps a trailing "" element; drop it or every word
      // contributes a phantom (lastChar, "") bigram to the merge counts.
      .select(array_remove(split(col("w"), ""), "").as("seq"), col("freq"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to merges) {
      val top = words
        .select(col("freq"), explode(zip_with(
          slice(col("seq"), lit(1), size(col("seq")) - 1),
          slice(col("seq"), lit(2), size(col("seq")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p")("l").as("l"), col("p")("r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((r, a, b, c))
        words = words.select(mergeFold(col("seq"), a, b).as("seq"), col("freq"))
          .localCheckpoint()
      }
    }
    out.toSeq.toDF("merge_rank", "lhs", "rhs", "cnt")
  }

  /** Bigram collocation extraction by pointwise mutual information —
    * PMI(l,r) = ln( c(l,r)·N / (c(l)·c(r)) ) over adjacent token pairs: the
    * standard corpus-statistics pass for phrase mining / tokenizer-vocabulary
    * seeding over a training corpus. `minCount` drops one-off pairs (PMI is
    * noise-dominated at low counts); output is the global top-k by PMI.
    *
    * Scale shape: bigram and unigram counts are map-side-combined aggregates of
    * the token explode; the PMI joins are keyed on token over VOCABULARY-sized
    * relations (never the corpus); N is a broadcast 1-row aggregate; the top-k
    * is TakeOrderedAndProject. No all-pairs work anywhere.
    */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val base = graft.engine.DfOps.spread(docs).select(tokens(col(textCol)).as("a"))
    val pairs = base.select(explode(zip_with(
        slice(col("a"), lit(1), greatest(size(col("a")) - 1, lit(0))),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .filter(length(col("p")("l")) > 0 && length(col("p")("r")) > 0)
      .groupBy(col("p")("l").as("l"), col("p")("r").as("r"))
      .agg(count(lit(1)).as("cnt"))
    val uni = base.select(explode(col("a")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum("c").cast("double").as("n"))
    pairs.filter(col("cnt") >= minCount)
      .join(uni.select(col("tok").as("l"), col("c").as("cl")), "l")
      .join(uni.select(col("tok").as("r"), col("c").as("cr")), "r")
      .crossJoin(broadcast(n))
      .select(col("l"), col("r"), col("cnt"),
        round(log(col("cnt").cast("double") * col("n") /
          (col("cl").cast("double") * col("cr").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("l").asc, col("r").asc)
      .limit(topK)
  }

  /** Per-document top-k TF-IDF keywords — keyword extraction / document
    * labeling. score = tf · ln(N/df), ties broken on the token so the cut is
    * deterministic. The rank column makes the k-cut explicit for consumers.
    *
    * Scale shape: one token explode → per-(doc,token) counts (map-side
    * combined); document frequency is a vocabulary-sized aggregate OF that
    * count table (no second corpus pass); N is a broadcast 1-row aggregate; the
    * top-k is a window over doc-partitioned data — no global sort, no skew
    * (a document's distinct-token set bounds its partition's row count).
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.engine.DfOps.spread(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).cast("double").as("nd"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(nDocs))
      .select(col(idCol), col("tok"),
        round(col("tf").cast("double") * log(col("nd") / col("df").cast("double")), 6)
          .as("score"))
    // rank over the ROUNDED score: the oracle recomputes the same 6-dp value, so
    // near-ties cut identically on both sides
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def unigramFreqStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.engine.DfOps.spread(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    toks.join(counts, "tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"), sum(col("cnt")).as("sum_freq"))
  }

  /** Pairwise Jensen-Shannon divergence between per-source unigram
    * distributions — the data-mixture planning table (how lexically distinct are
    * the corpus sources feeding a training mix). JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M),
    * M = (P+Q)/2; tokens present in only one source contribute ½·ln2·(their
    * probability mass), so the shared-vocabulary join plus the exclusive-mass
    * remainder gives the exact value without materializing the vocabulary union.
    *
    * Scale shape: token explode is map-side; per-(source, token) counts are one
    * map-side-combined aggregate; the pair join is keyed on token (sources are
    * vocabulary-sized, so the pair blow-up is bounded by #sources²); one final
    * tiny aggregate per source pair. Output: (src_a, src_b, js), src_a < src_b,
    * js rounded to 6 dp so float-sum association noise never reaches the value.
    */
  def sourceDivergence(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val tok = graft.engine.DfOps.spread(docs)
      .select(col(sourceCol).as("src"), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val cnt = tok.groupBy("src", "tok").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("src").agg(sum("c").as("n"))
    val p = cnt.join(tot, "src")
      .select(col("src"), col("tok"), (col("c").cast("double") / col("n")).as("p"))
    val a = p.select(col("src").as("src_a"), col("tok"), col("p").as("pa"))
    val b = p.select(col("src").as("src_b"), col("tok"), col("p").as("pb"))
    val ov = a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(lit(0.5) * (col("pa") * log(lit(2) * col("pa") / (col("pa") + col("pb"))) +
          col("pb") * log(lit(2) * col("pb") / (col("pa") + col("pb"))))).as("js_ov"),
        sum("pa").as("ma"), sum("pb").as("mb"))
      .select(col("src_a"), col("src_b"),
        round(col("js_ov") + lit(0.5 * math.log(2.0)) * ((lit(1) - col("ma")) + (lit(1) - col("mb"))),
          6).as("js"))
    // a zero-overlap pair yields NO row from the token join, but it is the MOST
    // divergent pair (js = ln 2) — outer-join the source cross product (sources
    // are vocabulary-sized → broadcast) so mixture planners see every pair
    val pairs = broadcast(tot.select(col("src").as("src_a")))
      .crossJoin(broadcast(tot.select(col("src").as("src_b"))))
      .filter(col("src_a") < col("src_b"))
    pairs.join(ov, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("js"), round(lit(math.log(2.0)), 6)).as("js"))
  }

  /** Convenience float score: mean -log2 of the token's corpus probability. */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val total = docs.select(sum(tokenCount(col(textCol))).as("__total"))
    unigramFreqStats(docs, idCol, textCol)
      .crossJoin(broadcast(total))
      .select(col(idCol),
        (-log2(col("sum_freq").cast("double") /
          (col("n_toks") * col("__total")).cast("double"))).as("surprisal"))
  }
}
