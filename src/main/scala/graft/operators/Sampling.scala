package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic sampling for training-data curation.
  *
  * Hash-ranked rather than RNG-based: the sample is a pure function of the
  * data, so it is reproducible across runs, engines, retries and cluster
  * sizes (a `rand()`-based sample silently changes under task retry, which
  * poisons dataset lineage at scale). The whole-corpus variant
  * (`sample_hash` in SparkEntry: filter on an md5 prefix) keeps a fixed
  * *fraction*; [[stratified]] keeps a fixed *quota per stratum*, the
  * balance-the-domains operation of corpus curation — a skewed stratum
  * cannot crowd out rare ones.
  */
object Sampling {

  /** Deterministic weighted Bernoulli thinning: keep each row with
    * probability `weightCol` (clamped to [0, 1]), decided by comparing the
    * row's 32-bit md5 prefix of `key` — a content-derived uniform in
    * [0, 1) — against the weight. The quality-weighted resampling step of
    * corpus mixing (up/down-weighting sources or quality bands) as a pure
    * narrow filter: no shuffle, no RNG state, identical keep-set under
    * retry, re-partitioning or engine change. Rows with a NULL key are
    * dropped (no hash to decide by; a weighted sample has no
    * deterministic place for them).
    */
  def weightedBernoulli(df: DataFrame, key: String,
                        weight: org.apache.spark.sql.Column): DataFrame = {
    val hNum = conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val p = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(hNum.cast("double") < p * 4294967296.0)
  }

  /** Domain mixing to target proportions: downsample each group of
    * `groupCol` so the output distribution over groups matches `weights`
    * (relative, need not sum to 1) while keeping as many rows as possible —
    * the binding group (largest count/weight deficit) is kept whole and
    * every other group thins to match. The canonical re-balance step of
    * corpus curation ("40% web, 30% books, 30% code"), as ONE bounded
    * per-group aggregate (driver state ≤ #groups) plus a narrow
    * content-hash Bernoulli filter — same determinism contract as
    * [[weightedBernoulli]].
    *
    * Groups absent from `weights` are dropped (weight 0). A weighted group
    * absent from the data just caps what the others can scale against —
    * reported proportions then match the weights restricted to present
    * groups. Output proportions are exact in expectation (hash-uniform
    * thinning), not row-exact: use [[stratified]] for exact quotas.
    */
  def mixToWeights(df: DataFrame, groupCol: String, key: String,
                   weights: Map[String, Double], maxGroups: Int = 100000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixToWeights: weights must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .limit(maxGroups + 1).collect()
    require(counts.length <= maxGroups,
      s"mixToWeights: over $maxGroups distinct values of '$groupCol'")
    // weights are keyed by the group's STRING form; the Row keeps the RAW
    // value so the broadcast-join frame matches the column's actual type
    // (storing the string into e.g. an int-typed field fails at runtime)
    val present = counts.collect {
      case r if r.get(0) != null && weights.contains(r.get(0).toString) =>
        r.get(0) -> r.getLong(1)
    }.toMap
    if (present.isEmpty) return df.filter(lit(false))
    val scale = present.map { case (g, n) => n.toDouble / weights(g.toString) }.min
    val fracRows = present.toSeq.map { case (g, n) =>
      org.apache.spark.sql.Row(g, math.min(1.0, weights(g.toString) * scale / n))
    }
    val fracs = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(fracRows: _*),
      StructType(Seq(df.schema(groupCol).copy(name = "_g"),
        StructField("_frac", org.apache.spark.sql.types.DoubleType))))
    val hNum = conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.join(broadcast(fracs), col(groupCol) === col("_g"))
      .filter(hNum.cast("double") < col("_frac") * 4294967296.0)
      .drop("_g", "_frac")
  }

  /** Up to `quota` rows per distinct value of `stratum`, chosen by md5 rank
    * of `key`.
    *
    * PRECONDITION: `key` must be unique per row (a primary key). The rank
    * order is (md5(key), key), so rows sharing a key value tie on both sort
    * terms and `row_number` breaks the tie nondeterministically — the
    * reproducibility guarantee holds only for unique keys. Rows with a NULL
    * key rank FIRST within their stratum (nulls-first sort, the single-
    * phase definition) and are routed straight to the exact phase-2 window
    * — the md5-prefix cut cannot see them (null comparisons), so they
    * bypass it rather than silently vanish.
    *
    * `maxStrata` bounds the driver state: strata are curation domains
    * (sources, languages, statuses), one row each on the driver — a
    * near-unique stratum column is a caller bug that would otherwise OOM
    * the driver, so the collect is limited and overflow fails fast.
    *
    * Two-phase at scale: a naive single window sorts every full stratum
    * through one task — a 100 TB stratum spills through a single sort.
    * Phase 1 computes per-stratum cardinalities (one row per stratum,
    * broadcast back) and keeps only rows whose 32-bit md5 prefix falls
    * under a threshold sized for ~`oversample`×quota expected survivors,
    * so the exact window in phase 2 sorts a bounded set. Because the
    * prefix filter admits a *prefix of the rank order* (md5 ascending),
    * any stratum whose survivors still cover the quota yields exactly the
    * single-phase sample; the rare stratum whose survivors fall short
    * (adversarial hash distribution) is re-run over its full row set, so
    * the result is identical to the single-phase definition in all cases.
    */
  def stratified(df: DataFrame, stratum: String, key: String, quota: Int,
                 oversample: Double = 4.0, maxStrata: Int = 100000): DataFrame = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val h = md5(col(key).cast("string"))
    // numeric 32-bit md5 prefix: same ordering as the lowercase fixed-width
    // hex string, long-comparable against the thresholds
    val hNum = conv(substring(h, 1, 8), 16, 10).cast("long")
    val keepAll = 4294967296L // > any 32-bit prefix — keep-all sentinel
    val sField = df.schema(stratum)

    // phase 1: per-stratum cardinality. Driver collect is bounded by the
    // maxStrata limit (one row per stratum). Collecting (same pattern as
    // the 32 IVF centroids) lets the thresholds re-enter the plan as a
    // LocalRelation instead of an aggregation subtree that the planner
    // would otherwise duplicate in every branch referencing it. (A fused
    // variant computing counts AND survivor counts in one job was measured
    // SLOWER at sf0.1 — the in-plan counts subtree gets evaluated twice,
    // costing a third full scan; two small jobs with LocalRelation
    // thresholds keep it at one scan each.)
    val countRows = df.groupBy(col(stratum)).agg(count(lit(1)).as("_n"))
      .limit(maxStrata + 1).collect()
    require(countRows.length <= maxStrata,
      s"Sampling.stratified: over $maxStrata distinct values of '$stratum' — " +
        "per-stratum thresholds live on the driver by design; a near-unique " +
        "stratum column defeats stratification (raise maxStrata only if the " +
        "strata really are that many and that small)")
    val thrRows = countRows.toSeq.map { r =>
      val n = r.getLong(1).toDouble
      // md5-prefix threshold keeping an expected oversample×quota rows;
      // fraction >= 1 ⇒ keep-all sentinel
      val t = if (oversample * quota >= n) keepAll
              else (oversample * quota / n * 4294967296.0).toLong
      org.apache.spark.sql.Row(r.get(0), t)
    }
    val thr = spark.createDataFrame(thrRows.asJava, StructType(Seq(
      sField.copy(name = "_stratum"), StructField("_thr", LongType))))
    // null-key rows are admitted unconditionally: they are invisible to the
    // md5-prefix cut (null comparison) but rank FIRST in the phase-2 window
    // (nulls-first sort — the single-phase definition), so they must reach
    // it rather than silently vanish; same scan, no extra branch.
    val pre = df.join(broadcast(thr), col(stratum) <=> col("_stratum"))
      .filter(col(key).isNull || hNum <= col("_thr"))

    // phase 2 + exactness guard IN ONE JOB: rank the survivor set (bounded
    // — ~oversample×quota rows per stratum) and materialize the quota'd
    // result directly. The prefix filter admits a prefix of the rank
    // order, so a stratum whose survivors cover the quota yields exactly
    // the single-phase sample. The guard needs no extra scan of `df`: after
    // the `rn <= quota` cut a stratum holds min(survivors, quota) rows, so
    // "survivors fell short" ⟺ "result rows < quota" — read off the CACHED
    // (small) result with a ≤ #strata-row aggregation. Only a cut stratum
    // (threshold below keep-all) can be short by hash adversity; those rare
    // strata are re-run over their full row sets.
    val w = Window.partitionBy(stratum).orderBy(h, col(key))
    val ranked = pre
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .drop("rn", "_stratum", "_thr")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE materializing action: the per-stratum result counts the guard
    // needs come back from the same job that fills the cache
    val got: Map[Any, Long] = ranked.groupBy(col(stratum)).agg(count(lit(1)).as("_m"))
      .collect().map(r => (r.get(0), r.getLong(1))).toMap
    // zero-survivor strata (no row left to count) fall out of `got` and are
    // caught by the same `< quota` comparison against the phase-1 counts
    val underRows = thrRows.filter { r =>
      r.getLong(1) != keepAll && got.getOrElse(r.get(0), 0L) < quota.toLong
    }.map(r => org.apache.spark.sql.Row(r.get(0)))

    if (underRows.isEmpty) ranked
    else {
      // rare path: exact single-phase window over the full row set of the
      // underfilled strata only, unioned with the covered strata's sample
      val under = spark.createDataFrame(
        java.util.Arrays.asList(underRows: _*),
        StructType(Seq(sField.copy(name = "_stratum"))))
      val rerun = df.join(broadcast(under), col(stratum) <=> col("_stratum"), "left_semi")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= quota).drop("rn")
      val result = ranked.join(broadcast(under), col(stratum) <=> col("_stratum"), "left_anti")
        .unionByName(rerun)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      result.count()
      ranked.unpersist(blocking = false)
      result
    }
  }
}
