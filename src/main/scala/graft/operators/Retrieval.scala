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
    // [dl, tf_0, …, tf_{k-1}] in ONE traversal of the text
    // ([[graft.functions.ProbeTermStats]]): the composed
    // size/filter/array_contains spelling re-ran the regex split k+1 times
    // per row in EACH of the two passes — at x100 that tokenization tax
    // was ~3/4 of both scan stages (0.29 s + 0.69 s → 0.10 s + 0.21 s
    // fused, min-of-3 same session). Values are identical: the kernel
    // mirrors split(text, " ", -1) token structure and exact byte
    // equality, so the DuckDB oracle is unchanged.
    val ps = graft.functions.TextFunctions.probe_term_stats(col("text"), terms)
    val dl = ps.getItem(0)
    // one row: corpus size, mean doc length, and df per query term — each
    // df a sum of 0/1 tf>0 flags (algebraic, partial-aggregated)
    val statCols = count(lit(1)).as("_n") +: avg(dl).as("_avgdl") +:
      terms.indices.map { i =>
        sum(when(ps.getItem(i + 1) > 0L, 1L).otherwise(0L)).as(s"_df$i")
      }
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val perTerm = terms.indices.map { i =>
      val tf = col("_ps").getItem(i + 1).cast("double")
      val idf = log(lit(1.0) +
        (col("_n") - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("_ps").getItem(0).cast("double") / col("_avgdl")))
    }
    docs.select(col("doc_id"), ps.as("_ps"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(perTerm.reduce(_ + _), 6).as("score"))
      .filter(col("score") > 0.0)
  }
}
