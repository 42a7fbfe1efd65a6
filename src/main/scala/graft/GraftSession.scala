package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory. Every entry point (Verify, Bench, TimeOne,
  * demos, the shared test fixture) builds its session here, so the Graft
  * planner extensions ([[graft.plans.PrefixJoinStrategy]] via
  * [[graft.plans.GraftPlanExtensions]]) and the engine-parity configs
  * (UTC session timezone) can never be silently lost — a plain
  * `SparkSession.builder()` without the strategy would degrade prefix
  * joins to BroadcastNestedLoopJoin without any error.
  *
  * External users embedding the library get the identical wiring with
  * `--conf spark.sql.extensions=graft.plans.GraftPlanExtensions`.
  */
object GraftSession {

  /** Build the standard Graft session. `configure` lets a caller layer
    * entry-point-specific configs (bench tuning, warehouse dirs) on top of
    * the canonical base; extensions are injected before `configure` runs
    * and cannot be removed by it.
    */
  def create(configure: SparkSession.Builder => SparkSession.Builder = identity): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val base = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // InferFiltersFromGenerate turns explode(f(x)) into an inferred
      // `size(f(x)) > 0` filter that predicate pushdown then sinks through
      // repartitions into the scan — for the dedup pipelines that re-runs
      // the (deliberately post-shuffle, parallel) native shingle-hash
      // expression serially inside the single-file scan task. Explode
      // already skips empty/null arrays by itself; the inference only
      // MOVES that work, so excluding the rule costs nothing here.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // let AQE re-plan (notably: coalesce post-shuffle partitions of)
      // plans that feed a persisted relation — off by default so cached
      // data keeps a stable output partitioning for downstream reuse, but
      // the eager persist-count-unpersist lifecycle our operators use
      // (stratified sampling, LSH dedup, cluster labels) never relies on
      // that partitioning, and without AQE the cached subtree runs every
      // stage at full shuffle width however tiny the data
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .withExtensions(new graft.plans.GraftPlanExtensions)
    val spark = configure(base).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
