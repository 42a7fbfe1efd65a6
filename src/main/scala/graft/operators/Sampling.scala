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
    * `df` must not already contain the injected working columns
    * `__graft_g` / `__graft_frac`.
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
      StructType(Seq(df.schema(groupCol).copy(name = "__graft_g"),
        StructField("__graft_frac", org.apache.spark.sql.types.DoubleType))))
    val hNum = conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.join(broadcast(fracs), col(groupCol) === col("__graft_g"))
      .filter(hNum.cast("double") < col("__graft_frac") * 4294967296.0)
      .drop("__graft_g", "__graft_frac")
  }

  /** Up to `quota` rows per distinct value of `stratum`, chosen by md5 rank
    * of `key`.
    *
    * PRECONDITION: `key` must be unique per row (a primary key). The rank
    * order is (md5(key), key), so rows sharing a key value tie on both sort
    * terms and `row_number` breaks the tie nondeterministically — the
    * reproducibility guarantee holds only for unique keys. Rows with a NULL
    * key rank FIRST within their stratum (nulls-first sort, the single-
    * phase definition) and are routed straight to the exact window — the
    * md5-prefix cut cannot see them (null comparisons), so they bypass it
    * rather than silently vanish. `df` must not already contain the
    * injected working columns (`__graft_s` / `__graft_thr` / `__graft_rn`
    * / `__graft_short` / `__graft_h`).
    *
    * Two-phase at scale: a naive single window sorts every full stratum
    * through one task — a 100 TB stratum spills through a single sort.
    * Per-stratum cardinalities (a map-side-combining aggregate, one row
    * per stratum) become md5-prefix thresholds sized for
    * ~`oversample`×quota expected survivors, broadcast against the scan,
    * so the exact window sorts a bounded set. Because the prefix filter
    * admits a *prefix of the rank order* (md5 ascending), any stratum
    * whose survivors cover the quota yields exactly the single-phase
    * sample; the rare stratum whose survivors fall short (adversarial
    * hash distribution) is re-ranked over its full row set, so the result
    * is identical to the single-phase definition in all cases.
    *
    * On the two-phase path the thresholds come from ONE driver collect
    * (bounded by `maxStrata` — strata are curation domains, one row each;
    * a near-unique stratum column would otherwise push an unbounded
    * per-stratum table through the driver-side broadcast, so overflow
    * fails fast with a named error instead of an opaque broadcast OOM)
    * and re-enter the plan as a LocalRelation. Everything ELSE — cut,
    * shortfall guard, rerun — is one lazy plan with no further driver
    * round-trips and no persist. In the overwhelmingly common case of no
    * short stratum, AQE sees the empty short-set broadcast at runtime and
    * prunes the rerun branch's scan to an empty relation — the guard
    * costs one tiny aggregation over the already-cut result, not a third
    * scan. The caller therefore pays: one counts job, then a single
    * action over filtered scan + bounded window (the previous
    * formulation added a second driver round-trip and a cache writeback
    * before the caller's action even started).
    *
    * SIZE-ADAPTIVE, the same way Spark's own planner picks broadcast vs
    * shuffle joins: when Catalyst's cost statistics bound the input under
    * `smallBytes` (a driver-side plan property — no job), the two-phase
    * scaffolding is pure overhead — a single stratum's sort fits one task
    * comfortably — so the operator emits the SINGLE-PHASE window plan
    * (one exchange, one sort, zero auxiliary stages), which is the
    * definition itself and needs no guard. Inputs that are large, or
    * whose size the optimizer cannot bound, take the two-phase path. Both
    * plans produce the identical row set, so the switch is invisible to
    * results — it only picks the right constant factor for the scale.
    */
  def stratified(df: DataFrame, stratum: String, key: String, quota: Int,
                 oversample: Double = 4.0,
                 smallBytes: Long = 32L << 20,
                 maxStrata: Int = 100000): DataFrame = {
    require(quota > 0, "Sampling.stratified: quota must be positive")
    val h = md5(col(key).cast("string"))
    if (AdaptiveGate.isSmall(df, smallBytes)) {
      // small inputs are typically also few-files, so the scan stage has
      // little parallelism — a round-robin repartition ahead of an
      // EXPLICIT hash column forces the md5 work into a full-width stage
      // instead of the (often single-task) scan or the (few-strata) sort.
      // Harmless here by construction: the shuffle moves < smallBytes.
      val par = df.sparkSession.sparkContext.defaultParallelism
      return df.repartition(par)
        .withColumn("__graft_h", md5(col(key).cast("string")))
        .withColumn("__graft_rn", row_number().over(
          Window.partitionBy(stratum).orderBy(col("__graft_h"), col(key))))
        .filter(col("__graft_rn") <= quota)
        .drop("__graft_rn", "__graft_h")
    }
    // numeric 32-bit md5 prefix: same ordering as the lowercase fixed-width
    // hex string, long-comparable against the thresholds
    val hNum = conv(substring(h, 1, 8), 16, 10).cast("long")
    val keepAll = 4294967296L // > any 32-bit prefix — keep-all sentinel

    // per-stratum cardinality → md5-prefix threshold keeping an expected
    // oversample×quota rows; fraction >= 1 ⇒ keep-all sentinel. ONE
    // bounded driver collect (fails fast on a near-unique stratum column
    // — the thresholds must broadcast, so unbounded strata would
    // otherwise surface as a driver/broadcast OOM deep in the job), and
    // the LocalRelation result costs no AQE aggregation stages in-plan.
    import scala.jdk.CollectionConverters._
    val sField = df.schema(stratum)
    val countRows = df.groupBy(col(stratum)).agg(count(lit(1)).as("__graft_n"))
      .limit(maxStrata + 1).collect()
    require(countRows.length <= maxStrata,
      s"Sampling.stratified: over $maxStrata distinct values of '$stratum' — " +
        "per-stratum thresholds are broadcast, so strata must stay bounded " +
        "(curation domains, not row keys); raise maxStrata only if the " +
        "strata really are that many and that small")
    val thrRows = countRows.toSeq.map { r =>
      val n = r.getLong(1).toDouble
      val t = if (oversample * quota >= n) keepAll
              else (oversample * quota / n * 4294967296.0).toLong
      org.apache.spark.sql.Row(r.get(0), t)
    }
    val thr = df.sparkSession.createDataFrame(thrRows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        sField.copy(name = "__graft_s"),
        org.apache.spark.sql.types.StructField("__graft_thr",
          org.apache.spark.sql.types.LongType))))
    // null-key rows are admitted unconditionally: they are invisible to the
    // md5-prefix cut (null comparison) but rank FIRST in the window
    // (nulls-first sort — the single-phase definition), so they must reach
    // it rather than silently vanish; same scan, no extra branch.
    val pre = df.join(broadcast(thr), col(stratum) <=> col("__graft_s"))
      .filter(col(key).isNull || hNum <= col("__graft_thr"))
    val w = Window.partitionBy(stratum).orderBy(h, col(key))
    val cut = pre.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= quota)

    // exactness guard, in-plan: after the rn <= quota cut a stratum holds
    // min(survivors, quota) rows, so "survivors fell short" ⟺ "cut rows <
    // quota" — and only a BINDING threshold (below keep-all) can be short
    // by hash adversity. The LEFT join from thresholds catches the
    // zero-survivor stratum that is absent from the cut entirely.
    val gotc = cut.groupBy(col(stratum).as("__graft_s2"))
      .agg(count(lit(1)).as("__graft_m"))
    val short = thr.join(gotc, col("__graft_s") <=> col("__graft_s2"), "left")
      .filter(col("__graft_thr") =!= keepAll &&
        coalesce(col("__graft_m"), lit(0L)) < quota)
      .select(col("__graft_s").as("__graft_short"))
    // covered strata keep their cut sample; short strata re-rank their full
    // row set (exact single-phase window, restricted by the semi-join).
    // Both arms reference the same window subtree / the same broadcast of
    // `short`, which ReuseExchange collapses to one execution each.
    val kept = cut.join(broadcast(short), col(stratum) <=> col("__graft_short"), "left_anti")
      .drop("__graft_rn", "__graft_s", "__graft_thr")
    val rerun = df.join(broadcast(short), col(stratum) <=> col("__graft_short"), "left_semi")
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= quota)
      .drop("__graft_rn")
    kept.unionByName(rerun)
  }
}
