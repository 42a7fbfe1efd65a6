package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-style relevance scoring over a document corpus.
  *
  * BM25 is the workhorse of corpus curation adjacent to training-data
  * pipelines: scoring documents against a probe query (quality filtering by
  * topicality, eval-set leakage triage, targeted subset extraction).
  *
  * Scale shape: the corpus-level statistics BM25 needs — N, average doc
  * length, and per-term document frequencies — are all algebraic
  * aggregates, so they are computed in ONE map-side-combining pass
  * producing ONE row (`k + 2` numbers), which then cross-joins back into
  * a narrow per-document projection. No explode, no per-term join, no
  * shuffle of document rows at any point: the whole operator is one
  * aggregation of tiny width plus one embarrassingly-parallel scoring
  * pass. Query terms are literals in the plan (queries are small by
  * contract; a thousand-term "query" is a join problem, not BM25).
  */
object Retrieval {

  /** Occurrences of literal `term` among the whitespace tokens of `text`.
    * `aggregate` over the token array (codegen'd) rather than a regex —
    * exact token equality, no metacharacter hazards.
    */
  private def termFreq(text: Column, term: String): Column =
    size(filter(TextAnalysis.words(text), w => w === lit(term))).cast("long")

  /** BM25 scores of every document against `terms`.
    *
    * Output: (doc_id, score) for documents with score > 0 — i.e. documents
    * containing at least one query term (absent terms contribute exactly 0,
    * so the filter is semantic, not an optimization).
    *
    * Arithmetic is double-precision with the standard Robertson/Sparck
    * Jones idf `ln(1 + (N - df + 0.5)/(df + 0.5))`; the returned score is
    * rounded to 6 decimals (the repo's cross-engine determinism
    * convention).
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val dl = TextAnalysis.tokenCount(col("text"))
    // one row: corpus size, mean doc length, and df per query term — each
    // df a sum of 0/1 contains-flags (algebraic, partial-aggregated)
    val statCols = count(lit(1)).as("_n") +: avg(dl).as("_avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(TextAnalysis.words(col("text")), t), 1L)
          .otherwise(0L)).as(s"_df$i")
      }
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      val tf = termFreq(col("text"), t).cast("double")
      val idf = log(lit(1.0) +
        (col("_n") - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl.cast("double") / col("_avgdl")))
    }
    docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(perTerm.reduce(_ + _), 6).as("score"))
      .filter(col("score") > 0.0)
  }
}
