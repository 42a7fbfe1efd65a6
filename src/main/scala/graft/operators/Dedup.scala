package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Four families, in increasing fuzziness:
  *  - exact (hash-groupBy on content / normalized content)
  *  - n-gram Jaccard via an inverted shingle index (no O(n^2) cross join)
  *  - MinHash + LSH banding (candidate generation sub-quadratic in docs)
  *  - SimHash bit-signatures
  *
  * Design notes for 100 TB:
  *  - Every pipeline is a sequence of narrow projections + hash shuffles on
  *    content-derived keys (md5 / shingle / band hash), which distribute and
  *    parallelize trivially; no driver-side state.
  *  - The shingle inverted index joins docs on *shared shingles* rather than
  *    crossing all pairs, so cost is proportional to actual collisions.
  *    Hot shingles (stop-phrases) would skew the join at scale; cap them by
  *    filtering postings lists longer than a bound before the self-join
  *    (standard df-cut), which also removes useless candidates.
  *  - MinHash uses md5(seed || shingle) minima, so signatures are computed
  *    in one pass over an exploded shingle table with 16 per-seed `min`
  *    partial aggregates (map-side combine shrinks the shuffle to one row
  *    per doc).
  */
object Dedup {

  /** Exact-duplicate groups by content hash: one row per distinct content,
    * with the group size and the kept (minimum) doc_id.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))

  /** Exact duplicates after normalization (case/punct/whitespace). */
  def normalizedGroups(docs: DataFrame): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))

  /** Distinct k-shingles per doc, exploded: (doc_id, shingle). */
  def shingleTable(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), explode(TextAnalysis.shingles(col("text"), k)).as("s"))

  /** Exact n-gram Jaccard near-dup pairs >= `threshold`, via inverted index:
    * join docs that share at least one shingle, count the intersection,
    * then Jaccard = inter / (|A| + |B| - inter). `maxPostings` drops
    * degenerate stop-shingles shared by more than that many docs (df-cut)
    * so one hot key cannot skew the shuffle at scale.
    */
  def jaccardPairs(docs: DataFrame, k: Int, threshold: Double,
                   maxPostings: Long = 1000000L): DataFrame = {
    // deliberately lazy and persist-free: unlike the minhash pipeline there
    // is no per-row hashing here, so re-deriving the shingle explode per
    // consumer is cheaper than materializing it to cache (measured: a
    // persist+eager variant was ~30% slower at sf0.1 and pins memory)
    val sh = shingleTable(docs, k).repartition(col("doc_id"))
    val pruned = sh.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .filter(col("df") <= maxPostings).drop("df")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = pruned.as("a").join(pruned.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Mersenne prime modulus for the affine MinHash permutation family. */
  val MinhashPrime: Long = 2147483647L

  /** Band-bucket df-cut shared by [[lshCandidates]] AND the
    * `dedup_minhash_lsh` DuckDB oracle SQL (SparkEntry.oracleSql mirrors
    * it), so the two engines agree even on a corpus with a degenerate
    * bucket above the cap. */
  val DefaultMaxBucket: Long = 100000L

  /** Deterministic (multiplier, offset) pairs for h_i = (a*h + b) mod p —
    * shared by the Spark operator and the DuckDB oracle so both engines
    * realize the identical permutation family.
    */
  def minhashCoeffs(numPerm: Int): Seq[(Long, Long)] =
    (0 until numPerm).map { i =>
      ((1103515245L * (i + 1) + 7L) % MinhashPrime,
        (12345L + 104729L * i) % MinhashPrime)
    }

  /** MinHash signature columns m0..m{numPerm-1} over an exploded shingle
    * table (doc_id, s): one md5 per shingle row (first 8 hex chars as a
    * 32-bit base hash), then numPerm cheap affine permutations
    * (a_i*h + b_i) mod 2^31-1 — the classic construction, ~numPerm times
    * cheaper than hashing per permutation, which at corpus scale is the
    * dominant cost of the whole pipeline. Partial (map-side) min
    * aggregation shrinks the shuffle to one row per doc per partition.
    */
  def minhashSignaturesFromShingles(sh: DataFrame, numPerm: Int): DataFrame =
    minhashSignaturesFromHashes(sh.select(col("doc_id"), shingleHash31(col("s"))), numPerm)

  /** The 31-bit base hash of a shingle string: first 8 hex chars of md5,
    * mod the Mersenne prime — shared by the Spark operators and every
    * DuckDB oracle re-derivation.
    */
  def shingleHash31(s: Column): Column =
    (conv(substring(md5(s), 1, 8), 16, 10).cast("long") % MinhashPrime).as("h31")

  /** Exploded (doc_id, h31) hashed-shingle table: each distinct shingle of
    * a document reduced to its 31-bit base hash AT THE SOURCE. Downstream,
    * the cached table carries 8-byte longs instead of multi-10-byte
    * strings, signatures reuse the hash without re-hashing, and verify
    * intersections join on longs. The post-hash DISTINCT keeps per-doc
    * multiplicity identical in both engines even under (vanishingly rare,
    * ~n²/2³²) within-doc collisions; cross-doc collisions perturb
    * intersection counts identically in the oracle, which applies the same
    * md5-prefix hash.
    */
  def shingleHashes(docs: DataFrame, k: Int): DataFrame =
    shingleTable(docs, k)
      .select(col("doc_id"), shingleHash31(col("s")))
      .distinct()

  def minhashSignaturesFromHashes(shH: DataFrame, numPerm: Int): DataFrame = {
    val aggs = minhashCoeffs(numPerm).zipWithIndex.map { case ((a, b), i) =>
      min((col("h31") * a + b) % MinhashPrime).as(s"m$i")
    }
    shH.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  def minhashSignatures(docs: DataFrame, k: Int, numPerm: Int): DataFrame =
    minhashSignaturesFromShingles(shingleTable(docs, k), numPerm)

  /** LSH banding over the MinHash signature: band b hashes rows
    * [b*rowsPerBand, (b+1)*rowsPerBand). Output: (doc_id, band, bh).
    */
  def lshBands(sigs: DataFrame, numPerm: Int, bands: Int): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val r = numPerm / bands
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bh"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
  }

  /** Candidate near-dup pairs: docs sharing at least one LSH band bucket.
    * `sh` is an exploded (doc_id, s) shingle table.
    *
    * `maxBucket` is the band-bucket df-cut, mirroring [[jaccardPairs]]'s
    * `maxPostings`: the self-join is quadratic in the largest bucket, so one
    * degenerate bucket (a flood of empty/boilerplate docs all hashing to the
    * same band value) would hand a single reducer O(bucket^2) pairs at scale.
    * Buckets that large carry no near-dup signal (LSH theory: a bucket
    * holding a large fraction of the corpus is indistinguishable from
    * chance), so they are dropped before the join, bounding candidate count
    * by bands * maxBucket^2 / 2 regardless of corpus skew.
    */
  def lshCandidates(sh: DataFrame, numPerm: Int, bands: Int,
                    maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val (out, cleanup) = lshCandidatesLazy(sh, numPerm, bands, maxBucket)
    out.count()
    cleanup()
    out
  }

  /** Lazy variant of [[lshCandidates]]: the candidate set is persisted but
    * NOT materialized, so a caller composing a larger pipeline (e.g.
    * [[minhashLshDedup]]) can fill every cache inside its one final action
    * instead of paying a separate job per stage. The caller MUST invoke
    * `cleanup` after its materializing action to release the internal band
    * cache (and later unpersist the returned candidates).
    */
  private[operators] def lshCandidatesLazy(
      sh: DataFrame, numPerm: Int, bands: Int,
      maxBucket: Long = DefaultMaxBucket): (DataFrame, () => Unit) = {
    // persist the one-row-per-doc-per-band table for the self-join: exchange
    // reuse does NOT cover it once AQE broadcast-converts one side (the two
    // sides end up in different query-stage shapes), so without a persist
    // the whole signature aggregation runs twice.
    val bandsDf = lshBands(minhashSignaturesFromShingles(sh, numPerm), numPerm, bands)
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("bn") <= maxBucket).drop("bn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = bandsDf.as("a").join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (out, () => bandsDf.unpersist(blocking = false))
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates, then exact Jaccard
    * verification of candidates only (the scale path: verification cost is
    * proportional to candidates, not to n^2).
    *
    * Lifecycle: the verified-pair result is computed eagerly, persisted
    * (CacheManager-registered, so `unpersist()`/`spark.catalog.clearCache()`
    * releases it), and the shingle intermediate is unpersisted before
    * returning. Repeated invocations in a long-lived session therefore hold
    * at most the (small) result — not the exploded shingle table, which at
    * corpus scale dwarfs executor memory.
    */
  def minhashLshDedup(docs: DataFrame, k: Int, numPerm: Int, bands: Int,
                      threshold: Double, maxBucket: Long = DefaultMaxBucket): DataFrame = {
    // the exploded shingle table feeds signatures, both sides of the
    // intersection join, and the size table — materialize it once instead
    // of re-exploding (and re-reading) the corpus four times. Hash-
    // repartition by doc_id: a narrow source (one input file = one
    // partition locally; one task per file at scale) would otherwise leave
    // every downstream partial aggregation single-task, and both the
    // signature and size groupBys reuse this partitioning shuffle-free.
    val sh = shingleTable(docs, k).repartition(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager candidates: measured both ways at sf0.1 with no significant
    // difference (host noise dominates); eager is kept because it rules
    // out duplicated cache-fill when AQE materializes the self-join's two
    // query stages concurrently against a cold cache
    val (cand, candCleanup) = lshCandidatesLazy(sh, numPerm, bands, maxBucket)
    cand.count()
    // verification touches only docs that appear in some candidate pair —
    // semi-join the shingle table down to those ids first, so the pair-
    // intersection join (and the size aggregation) runs over |cand docs|
    // shingle rows, not the whole corpus. LSH exists precisely because
    // candidates are a vanishing fraction of docs at scale, so this prunes
    // almost everything; a doc's full shingle set survives the semi-join,
    // so intersection counts and sizes are unchanged (exact verify).
    val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val shCand = sh.join(candIds, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = shCand.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val result = cand
      .join(shCand.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shCand.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count() // materialize; every upstream cache fills inside this job
    candCleanup()
    shCand.unpersist(blocking = false)
    cand.unpersist(blocking = false)
    sh.unpersist(blocking = false)
    result
  }

  /** 16-bit SimHash from the high bit of each hex nibble of md5(token):
    * bit b of the signature is the sign of the sum over tokens of
    * (+1 if nibble b of md5(token) >= 8 else -1). Integer arithmetic only,
    * so it is bit-stable across engines and SQL-expressible. Native
    * codegen'd expression; [[simhash16Composed]] is the built-in-composed
    * formulation it is bit-matched against in the spec.
    */
  def simhash16(text: Column): Column =
    graft.functions.TextFunctions.simhash16(text)

  def simhash16Composed(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.words(text))
    val hashes = transform(toks, t => md5(t))
    val bits = (0 until 16).map { b =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(substring(h, b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash16(col("text")).as("simhash"))

  /** Duplicate clusters from a near-dup pair list: connected components by
    * iterative min-label propagation. Each vertex starts labeled with
    * itself; every round each vertex takes the minimum label in its
    * neighborhood; converged when no label changes. Rounds needed =
    * graph diameter (near-dup clusters are tiny, so 3-5 rounds); each
    * round is two hash joins + one aggregation — all shuffle-partitioned
    * by vertex id, no driver-side graph state.
    *
    * Input: (doc_a, doc_b) pairs. Output: (doc_id, component) where
    * component = min doc_id reachable — the canonical "keep" id.
    */
  /** Eager localCheckpoint plus the ids of the RDD blocks it pinned.
    * localCheckpoint storage lives outside the CacheManager —
    * `spark.catalog.clearCache()` does NOT release it — so iterative
    * algorithms must free superseded checkpoints explicitly or a long-lived
    * session accumulates dead blocks until executors spill and thrash.
    *
    * The before/after `getPersistentRDDs` diff assumes no CONCURRENT
    * persist activity on the same SparkContext during this single call
    * (true for the sequential driver loops this library targets); a foreign
    * persist landing inside the window would be mis-tracked and freed.
    */
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    (out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  private def freeCheckpoints(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) after every step: iterative algorithms must
    // truncate lineage, or each round's logical plan nests all previous
    // rounds and analysis/optimization time compounds. Each round frees the
    // checkpoint it supersedes (see checkpointTracked).
    // both edge directions from ONE pass over pairs: a union of two selects
    // would execute the (potentially expensive) upstream pair pipeline twice
    val (edges, edgeIds) = checkpointTracked(
      pairs.select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")))
    // initial labels already carry one propagation round fused in:
    // label₀(v) = min(v ∪ neighbors) instead of the identity — for the
    // clique-shaped clusters near-dup pairs produce, that alone is the
    // fixpoint, so the loop's first pass just confirms convergence (saves
    // one full checkpoint+scan round per invocation)
    var (labels, labelIds) = checkpointTracked(
      edges.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("component"))
        .select(col("src").as("doc_id"), col("component")))
    // empty pair list: no vertices, nothing to propagate (and no aggregate
    // to probe — a sum-based witness would NPE here on the null sum)
    var converged = labels.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("component")).as("n_min"))
      // `lowered` rides along in the same pass so convergence detection is a
      // scan of the just-materialized checkpoint, not an extra join; a
      // count-of-changes witness (unlike sum-of-labels) cannot overflow Long
      // however large the id space
      val (next, nextIds) = checkpointTracked(
        labels.join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("component"), coalesce(col("n_min"), col("component")))
              .as("component"),
            (coalesce(col("n_min"), col("component")) < col("component"))
              .as("lowered")))
      converged = next.filter(col("lowered")).isEmpty
      freeCheckpoints(labels, labelIds)
      labels = next
      labelIds = nextIds
      i += 1
    }
    // hand the (small: one row per doc appearing in any pair) result to the
    // CacheManager so callers release it with unpersist()/clearCache(), and
    // free every remaining checkpoint block. localCheckpoint data is not
    // fault-tolerant anyway, so the risk profile is unchanged — this just
    // makes every block this operator pinned releasable by public API.
    val out = labels.select(col("doc_id"), col("component"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    freeCheckpoints(labels, labelIds)
    freeCheckpoints(edges, edgeIds)
    out
  }

  /** The user-facing endgame of corpus dedup: resolve near-dup pairs to
    * clusters, keep ONE representative per cluster (longest text, ties to
    * the smallest doc_id), pass singleton docs through untouched, and
    * return the surviving rows with their cluster id and size. Lifecycle
    * matches [[minhashLshDedup]]: eager, CacheManager-registered result,
    * intermediates released before returning.
    */
  def dedupCorpus(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labels = duplicateClusters(pairs) // persisted by contract
    val labeled = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
      .orderBy(desc("len"), col("doc_id"))
    val result = labeled.withColumn("len", length(col("text")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_in_cluster", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("component")))
      .filter(col("rn") === 1)
      .select((docs.columns.map(col) :+ col("component") :+ col("n_in_cluster")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    labels.unpersist(blocking = false)
    result
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, restricted to
    * an LSH-style blocking key (sign of the first `signBits` components) so
    * the self-join is bucketed rather than a full cross product.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double, signBits: Int = 8): DataFrame = {
    val keyed = emb.select(col("vec_id"), col("embedding"),
      Similarity.signBucket(col("embedding"), signBits).as("bucket"))
    keyed.as("a").join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
