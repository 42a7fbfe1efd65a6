package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring — the CCNet-style quality
  * signal (Wenzek et al. 2020: documents are ranked by the perplexity of a
  * reference-corpus LM; low-perplexity text is "wiki-like", high-perplexity
  * text is noise). A production system plugs a KenLM binary into the scorer;
  * here the LM itself is relational — counts tables built from a reference
  * corpus with one aggregation each — so the whole operator stays inside
  * Spark's engine, is exactly reproducible, and has a full DuckDB oracle.
  *
  * Model: bigram LM with add-one smoothing over the reference vocabulary,
  *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
  * where `c(w1 ·)` is the bigram-start count (proper conditional
  * normalization: sum over w2 of c(w1 w2)) and `V` the reference corpus'
  * distinct-token count. Unseen contexts fall back to the uniform 1/V.
  * The score is the document's cross-entropy under that model in nats per
  * bigram — `avg(-ln P)` — monotone with perplexity (`ppl = exp(score)`)
  * but numerically tamer to compare across engines.
  *
  * Scale shape (100 TB corpus, reference corpus possibly itself large):
  *  - the counts tables are ONE hash aggregation each over the reference's
  *    exploded bigrams — map-side partials make the shuffle vocabulary-
  *    sized (Zipf-bounded), not corpus-sized;
  *  - scoring is two equi-joins keyed on the bigram / its first token. Both
  *    sides arrive hash-partitioned on token keys; when the vocabulary fits
  *    an executor the planner (or an explicit hint) broadcasts the counts
  *    and the scan stays shuffle-free except the final per-doc aggregation;
  *  - no driver state: V rides along as a 1-row broadcast cross join.
  *
  * Bigram extraction reuses the codegen'd shingle kernel
  * ([[graft.functions.TextFunctions.shingle_array_all]] with k=2): tokens
  * are space-delimited, so the "w1 w2" string is an injective bigram key
  * and `substring_index(bg, ' ', 1)` recovers the context token.
  */
object LanguageModel {

  /** All bigrams of every document, one row per occurrence:
    * `(doc_id, bg)` with `bg = "w1 w2"`. Single-token documents vanish.
    */
  def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingle_array_all(col("text"), 2)).as("bg"))

  /** Bigram counts of the reference corpus: `(bg, c12)`. */
  def bigramCounts(reference: DataFrame): DataFrame =
    docBigrams(reference).groupBy("bg").agg(count(lit(1)).as("c12"))

  /** Bigram-START counts (conditional-probability denominators):
    * `(w1, c1)` with `c1 = Σ_w2 c(w1 w2)` — derived by re-aggregating
    * [[bigramCounts]] rather than re-exploding the reference corpus: the
    * input is vocabulary-sized (Zipf-bounded), not corpus-sized, and when
    * [[crossEntropy]] composes both tables the shared bigram-count
    * exchange executes once (ReuseExchange collapses the identical
    * subtrees).
    */
  def contextCounts(reference: DataFrame): DataFrame =
    contextCountsFrom(bigramCounts(reference))

  private def contextCountsFrom(c12: DataFrame): DataFrame =
    c12.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))

  /** Distinct-token count of the reference corpus as a 1-row frame `(v)`. */
  def vocabSize(reference: DataFrame): DataFrame =
    reference.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))

  /** Cross-entropy of every document in `docs` under the bigram LM of
    * `reference`: `(doc_id, n_bigrams, cross_entropy)` — nats per bigram,
    * rounded to 6 decimals (the repo's cross-engine determinism convention
    * for accumulation-order-sensitive double sums). Documents with fewer
    * than two tokens have no bigrams and are absent from the output.
    */
  def crossEntropy(reference: DataFrame, docs: DataFrame): DataFrame = {
    val c12 = bigramCounts(reference)
    val scored = docBigrams(docs)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c12, Seq("bg"), "left")
      .join(contextCountsFrom(c12), Seq("w1"), "left")
      .crossJoin(vocabSize(reference))
    scored
      .select(col("doc_id"),
        (-log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))).as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 6).as("cross_entropy"))
  }
}
