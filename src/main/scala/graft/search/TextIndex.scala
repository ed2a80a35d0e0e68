package graft.search

import graft.model.{GraftStore, Term}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Full-text search over string literals — the BDS search service analog.
  *
  * The reference maintains token→(docId, weight) postings in a B+Tree
  * (`bigdata/src/java/com/bigdata/search/FullTextIndex.java`, cosine/TF-IDF relevance in
  * `Hit.java`/`Hiterator.java`) queried through the `bds:search` magic predicates
  * (vocabulary `rdf/store/BDS.java:94-143`, plan hook
  * `rdf/sparql/ast/eval/SearchServiceFactory.java`). Here the postings are a DataFrame
  * built in one pass over the distinct string literals of the store — token explode →
  * tf per (literal, token) → df/idf per token — and a search is a token semi-join +
  * map-side TF-IDF sum: linear scans and shuffles on the postings table only, which is
  * the scalable shape (the postings build is a one-time cost, like the reference's text
  * index maintained at load).
  */
final class TextIndex(val postings: DataFrame, val lits: DataFrame, val nDocs: Long) {

  /** Match literals for a whitespace/OR query; returns (lit term, relevance[, rank]).
    * Scoring runs entirely on (lit_id, token, tfidf) — 8-byte keys; the literal term
    * struct attaches once, after ranking, against the (small, ranked) hit set.
    *
    * Ranking is scale-aware: a bound maxRank compiles to orderBy+limit
    * (TakeOrderedAndProject — per-partition top-k, only k rows reach the driver
    * side of the sort), and the dense rank attaches via a window over those ≤ k
    * rows. Only an UNBOUNDED rank request pays a global single-partition window;
    * with no rank var at all the sort is skipped entirely.
    */
  def search(query: String, matchAllTerms: Boolean = false,
             minRelevance: Double = 0.0, maxRank: Int = Int.MaxValue,
             needRank: Boolean = true, prefixMatch: Boolean = false,
             matchRegex: Boolean = false): DataFrame = {
    // bds:matchRegex (BDS.java matchRegex): the query is a regex over the whole
    // literal — a post-filter scan of the literal dictionary, no token postings
    // (the reference likewise bypasses the keyword index for regex)
    if (matchRegex) {
      val ord = Seq(col("lit_str").asc, asc_nulls_first("lit_lang"), col("lit_id").asc)
      val m = lits.filter(col("lit_str").rlike(query))
        .withColumn("relevance", lit(0.0d))
      val limited = if (maxRank != Int.MaxValue) m.orderBy(ord: _*).limit(maxRank) else m
      val ranked =
        if (needRank) TextIndex.rankBounded(limited, ord, bounded = maxRank != Int.MaxValue)
        else limited.withColumn("rank", lit(null).cast("int"))
      return ranked.select(Term.strLit(col("lit_str"), col("lit_lang")).as("lit"),
        col("relevance"), col("rank"))
    }
    // a '*' in the search string means prefix match ("Mi*" — the reference's
    // wildcard form, TestSearch search-prefix-match / search-query)
    val usePrefix = prefixMatch || query.contains("*")
    val terms = TextIndex.tokenize(query.replace("*", ""))
    // query vector: unit-normalized term frequencies, mirroring the document side
    // (FullTextIndex.java:1490 passes md.getLocalTermWeight() per query term)
    val qCounts = terms.groupBy(identity).view.mapValues(_.size).toMap
    val qMag = math.sqrt(qCounts.values.map(c => c.toDouble * c).sum)
    val qDistinct = qCounts.keys.toSeq
    // bds:prefixMatch (BDS.java prefix match, the B+Tree key-range scan analog):
    // a term matches every postings token it prefixes; nmatched counts QUERY
    // terms (not tokens) so matchAllTerms keeps its semantics
    val base =
      if (usePrefix) {
        val qt = coalesce(qDistinct.map(t =>
          when(col("token").startsWith(t), lit(t))): _*)
        postings.withColumn("qterm", qt).filter(col("qterm").isNotNull)
      } else postings.filter(col("token").isin(qDistinct: _*))
        .withColumn("qterm", col("token"))
    val qw = qDistinct.map(t => when(col("qterm") === t, lit(qCounts(t) / qMag)))
      .reduce((a, b) => coalesce(a, b))
    val hits = base
      .groupBy("lit_id")
      .agg(sum(qw * col("weight")).as("relevance"),
        countDistinct(col("qterm")).as("nmatched"))
    val filtered = if (matchAllTerms) hits.filter(col("nmatched") === terms.length) else hits
    // rank ties break on the lexical form (reproducible by external oracles — the
    // internal hash id is not), then lang and id to make the order total; the
    // relevance sort key rounds to 12 digits so float summation-order ulps can't
    // flip ranks between engines
    val ord = Seq(round(col("relevance"), 12).desc, col("lit_str").asc,
      asc_nulls_first("lit_lang"), col("lit_id").asc)
    val scored = filtered
      .filter(col("relevance") >= minRelevance)
      .join(lits, "lit_id")
    // top-k first: TakeOrderedAndProject (per-partition top-k, only k rows cross
    // the exchange); the rank attaches afterwards — and only when requested
    val limited =
      if (maxRank != Int.MaxValue) scored.orderBy(ord: _*).limit(maxRank) else scored
    val ranked =
      if (needRank) TextIndex.rankBounded(limited, ord, bounded = maxRank != Int.MaxValue)
      else limited.withColumn("rank", lit(null).cast("int"))
    // terms are self-describing: the plain-string literal struct reconstructs
    // canonically from its lexical form — no struct dictionary needed
    ranked.select(Term.strLit(col("lit_str"), col("lit_lang")).as("lit"),
      col("relevance"), col("rank"))
  }
}

object TextIndex {

  /** Attach the rank column. A `bounded` input (already orderBy+limit'ed to
    * ≤ maxRank rows — TakeOrderedAndProject) ranks via a plain window: the input
    * is k-row by construction, so one task over k rows is trivially scale-safe
    * and avoids globalRowNumber's three extra jobs (range repartition +
    * localCheckpoint + per-partition counts collect). Only the UNBOUNDED rank
    * request pays the partition-offset global row_number — the shape that never
    * funnels a 100 TB corpus's full hit set through one task.
    */
  private[search] def rankBounded(df: org.apache.spark.sql.DataFrame,
                                  ord: Seq[org.apache.spark.sql.Column],
                                  bounded: Boolean)
      : org.apache.spark.sql.DataFrame =
    if (bounded) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
      df.withColumn("rank", row_number().over(w))
    } else
      graft.engine.DfOps.globalRowNumber(df, ord, "rank")
        .withColumn("rank", col("rank").cast("int"))

  def tokenize(s: String): Seq[String] =
    s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq

  /** The reference stores doc term weights through Lucene's norm-byte codec
    * (`FullTextIndexTupleSerializer.java:136` → DefaultSimilarity.encodeNormValue,
    * i.e. SmallFloat.floatToByte315): FLOOR to 2 explicit mantissa bits (byte315). Columnar replica —
    * weights live in (0, 1], so the sub/overflow byte branches never fire.
    */
  private[search] def luceneNormRoundTrip(w: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val b0 = pow(lit(2.0), floor(log2(w)))
    val b = when(w < b0, b0 / 2).when(w >= b0 * 2, b0 * 2).otherwise(b0)
    when(w <= 0.0, lit(0.0))
      .otherwise((lit(1.0) + floor((w / b - 1.0) * 4) / 4.0) * b)
  }

  /** Per-literal postings (token, lit_id, weight) for a (lit_id, lit_str, …)
    * frame. Deterministic per literal — a literal's rows depend on nothing but
    * its own lexical form — which is what makes the durable-commit maintenance
    * below idempotent: re-deriving a literal's postings and replacing the
    * at-rest rows by lit_id is a semantic no-op.
    */
  private def postingsFor(lits: DataFrame): DataFrame = {
    val tf = lits.select(col("lit_id"),
      explode(split(lower(col("lit_str")), "[^\\p{L}\\p{N}]+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("lit_id", "token")
      .agg(count(lit(1)).as("tf"))
    val mag = tf.groupBy("lit_id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("mag"))
    tf.join(mag, "lit_id")
      .withColumn("weight", luceneNormRoundTrip(col("tf").cast("double") / col("mag")))
      .select("token", "lit_id", "weight")
  }

  /** Build postings over every distinct plain-string literal in object position. */
  def build(store: GraftStore): TextIndex = {
    val lits = store.statements
      .filter(col("o")("kind") === Term.KIND_LITERAL && col("o")("dt").isNull)
      .select(col("o")("id").as("lit_id"), col("o")("str").as("lit_str"),
        col("o")("lang").as("lit_lang"))
      .dropDuplicates("lit_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = lits.count()
    // postings carry ids only (the dictionary-encoding shuffle-width payoff); the
    // struct re-attach lives in search(), against the ranked hit set. Weights
    // are the per-literal UNIT term-frequency vector
    // (TermFrequencyData.normalize():114 — weight = tf / sqrt(Σ tf²));
    // relevance is then the reference's cosine, with a single-term query over
    // a one-token literal scoring exactly 1.0.
    val postings = postingsFor(lits).persist(StorageLevel.MEMORY_AND_DISK)
    new TextIndex(postings, lits, n)
  }

  private val cache = new java.util.WeakHashMap[GraftStore, TextIndex]()
  // path-keyed so the staging store handle used during bulk load and the reopened
  // query-serving handle share one postings build; the Long is the lexicon
  // generation (_SUCCESS mtime) so a store rebuilt at the same path invalidates
  // the cached index instead of serving stale postings
  private val pathCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, TextIndex)]

  /** Drop the path-keyed entry for lexicon path `p`. Called by
    * `GraftStore.invalidateLex` after a durable commit: the entry is keyed on
    * the lexicon generation (`_SUCCESS` mtime), and two commits landing within
    * one filesystem mtime tick would otherwise serve the pre-commit postings.
    */
  private[graft] def invalidatePath(p: String): Unit = pathCache.remove(p)

  /** Per-store index handle. A store with a lexicon path also parquet-persists its
    * postings alongside (the reference maintains its full-text index at load,
    * `rdf/store/DataLoader.java` → text indexer hook) — later sessions re-open the
    * postings instead of re-tokenizing the corpus.
    */
  def forStore(store: GraftStore): TextIndex = cache.synchronized {
    // combined generation: base lexicon OR its durable-commit `-delta` side
    // dir, whichever is newer — a saveInPlace append rolls the key
    val lexGen = store.lexiconPath.map(GraftStore.lexGen).getOrElse(-1L)
    store.lexiconPath.flatMap(pathCache.get).foreach { case (gen, hit) =>
      if (gen == lexGen) return hit
      else store.lexiconPath.foreach(pathCache.remove) // store rolled → stale index
    }
    var idx = cache.get(store)
    if (idx == null) {
      idx = store.lexiconPath match {
        case Some(p) =>
          val tp = p + "-text"
          // at-rest postings are reusable only if written at-or-after the
          // BASE lexicon generation; older postings belong to a previous
          // store build (or predate a lexicon compaction). Newer delta-dir
          // appends do NOT force a rebuild — they fold in below.
          val postingsGen = GraftStore.parquetGen(tp + "/postings")
          val schemaOk = postingsGen >= 0 &&
            (try store.spark.read.parquet(tp + "/postings").columns.contains("weight")
            catch { case _: Exception => false })
          if (postingsGen < 0 || postingsGen < GraftStore.parquetGen(p) || !schemaOk) {
            val built = build(store)
            built.lits.write.mode("overwrite").parquet(tp + "/lits")
            built.postings.write.mode("overwrite").parquet(tp + "/postings")
            built
          } else if (GraftStore.parquetGen(p + "-delta") >= 0) maintained(store, p, tp)
          else {
            val spark = store.spark
            val lits = spark.read.parquet(tp + "/lits")
              .persist(StorageLevel.MEMORY_AND_DISK)
            val postings = spark.read.parquet(tp + "/postings")
              .persist(StorageLevel.MEMORY_AND_DISK)
            new TextIndex(postings, lits, lits.count())
          }
        case None => build(store)
      }
      cache.put(store, idx)
      store.lexiconPath.foreach(p => pathCache.put(p, (lexGen, idx)))
    }
    idx
  }

  /** Durable-commit maintenance: the at-rest postings predate the lexicon's
    * `-delta` appends (GraftStore.saveInPlace). Instead of re-tokenizing the
    * corpus, fold the delta in session: literals the commits net-added are
    * re-derived from the (delta-sized) side dir and REPLACE their at-rest
    * rows by lit_id (tokenization is deterministic per literal, so the
    * replace is idempotent across re-adds); literals whose folded refcount
    * died anti-join away by the lexicon fold's dead list. Rows read: the
    * delta dir plus ONE pass over the at-rest postings — the same pass the
    * plain warm path pays; the statement corpus is never touched. This is the
    * O(delta) analog of the reference maintaining its full-text index inside
    * addTerms (`rdf/lexicon/LexiconRelation.java:454-456`).
    */
  private def maintained(store: GraftStore, p: String, tp: String): TextIndex = {
    val spark = store.spark
    import spark.implicits._
    store.nodeTerms // force the lexicon fold so the dead list is current
    val deadDf = GraftStore.deadNids(p).toSeq.toDF("lit_id")
    val added = spark.read.parquet(p + "-delta")
      .groupBy("nid").agg(first(col("n")).as("n"), sum(col("d")).as("d"))
      .filter(col("d") > 0 &&
        col("n")("kind") === Term.KIND_LITERAL && col("n")("dt").isNull)
      .select(col("nid").as("lit_id"), col("n")("str").as("lit_str"),
        col("n")("lang").as("lit_lang"))
      .localCheckpoint()
    val addedIds = added.select("lit_id")
    def patch(base: DataFrame): DataFrame = base
      .join(broadcast(deadDf), Seq("lit_id"), "left_anti")
      .join(broadcast(addedIds), Seq("lit_id"), "left_anti")
    val lits = patch(spark.read.parquet(tp + "/lits"))
      .unionByName(added)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val postings = patch(spark.read.parquet(tp + "/postings"))
      .unionByName(postingsFor(added))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new TextIndex(postings, lits, lits.count())
  }
}
