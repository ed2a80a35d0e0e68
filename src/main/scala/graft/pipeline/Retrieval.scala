package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: sparse lexical candidate generation + dense embedding rerank —
  * the standard two-stage shape of training-data curation / RAG pipelines (cheap
  * recall stage over the whole corpus, expensive precision stage over candidates).
  *
  * Scale shape: corpus stats (N, per-term document frequency) are ONE map-side
  * combined aggregate broadcast to the scoring pass; lexical scoring is a linear
  * columnar scan (no explode, no shuffle); candidate selection is
  * TakeOrderedAndProject (never a global sort); the rerank joins the candidate set
  * (broadcast-small by construction: ≤ candK rows) against the embedding table, so
  * the dense stage touches only candidates. At 100 TB the recall stage would read
  * the persisted postings index (`search.TextIndex`) instead of re-tokenizing; the
  * formula here matches that index's TF-IDF (tf · ln((N+1)/(df+1))) so the two are
  * interchangeable.
  */
object Retrieval {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** TF-IDF of `queryTerms` per document, columnar (whitespace tokens, lowercased). */
  def lexicalScores(docs: DataFrame, idCol: String, textCol: String,
                    queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tk = split(lower(trim(col(textCol))), "\\s+")
    val aggs = count(lit(1)).as("__n") +:
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(tk, t), 1L).otherwise(0L)).as(s"__df$i")
      }
    val stats = docs.agg(aggs.head, aggs.tail: _*)
    // tf · ln((N+1)/(df+1)) summed over terms, left-to-right (bit-stable, so an
    // external engine recomputing the same fold matches exactly)
    val score = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(tk, x => x === t)).cast("double") *
        log((col("__n") + 1.0d) / (col(s"__df$i") + 1.0d))
    }.reduce(_ + _)
    graft.engine.DfOps.spread(docs).crossJoin(broadcast(stats))
      .select(col(idCol), score.as("lex"))
  }

  /** Two-stage hybrid top-k for the query (`queryTerms`, embedding of `queryVecId`):
    * top `candK` lexical candidates, reranked by cosine against the query vector.
    */
  def hybridTopK(docs: DataFrame, embs: DataFrame,
                 idCol: String, textCol: String, embIdCol: String, vecCol: String,
                 queryTerms: Seq[String], queryVecId: Long,
                 candK: Int, k: Int): DataFrame = {
    graft.functions.VectorExprs.register(embs.sparkSession)
    val cand = lexicalScores(docs, idCol, textCol, queryTerms)
      .filter(col("lex") > 0d)
      .orderBy(col("lex").desc, col(idCol).asc).limit(candK) // TakeOrdered, no global sort
    val qv = embs.filter(col(embIdCol) === queryVecId)
      .select(asDouble(col(vecCol)).as("qv"))
    embs.join(broadcast(cand), col(embIdCol) === col(idCol))
      .crossJoin(broadcast(qv))
      .select(col(idCol), col("lex"),
        Similarity.cosineFast(asDouble(col(vecCol)), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
