package graft.operators

import org.apache.spark.sql.DataFrame

/** The single size gate behind every size-adaptive operator
  * ([[TrainOrder]], [[Packing.packSequences]], [[Sampling.stratified]],
  * [[TextAnalysis.contaminationBloom]]): route to the one-exchange
  * small-input plan only when Catalyst statistics bound the optimized plan
  * STRICTLY under `smallBytes`.
  *
  * Strict `<` so `smallBytes = 0` pins the large/two-phase path
  * unconditionally — including on inputs whose stats report 0 bytes (an
  * empty local relation), which under a `<=` gate would silently take the
  * small path and make plan-pinning specs audit the wrong shape. There is
  * no unknown-stats sentinel to guard against: Catalyst's `sizeInBytes` is
  * a non-negative BigInt, and unknown stats surface as
  * `defaultSizeInBytes` (huge), routing to the large path by magnitude.
  */
private[graft] object AdaptiveGate {

  /** Cap on stats-derived exchange widths (GATES.md): past this on one
    * node the per-node memory pool binds, not parallelism — a bigger
    * cluster relieves the pool, a wider exchange doesn't.
    */
  val MaxDerivedPartitions: Long = 2048L

  /** Stats-bytes per partition for post-explode exchanges (GATES.md):
    * explode fanout hides from Catalyst stats ~70x, so 256 KB of stats
    * ≈ ~20 MB of real per-task hash build.
    */
  val PostingStatsPerPartition: Long = 256L << 10

  def isSmall(df: DataFrame, smallBytes: Long): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes < smallBytes

  /** The optimized plan's stats estimate, clamped into Long range — for
    * gates that need the magnitude (e.g. deriving a partition count),
    * not just the boolean.
    */
  def statBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong

  /** `shuffle_hash` hint gated on the hinted side's stats: hash-join
    * builds are per-task and NON-spillable, so an unconditional hint
    * converts memory pressure into a dead stage at scale ("Can't acquire
    * ... to build hash relation" — measured on j4's 15 GB build before
    * its gate). Below `smallBytes` the hint sticks (hash beats
    * sort-merge when the build fits — every hinted site here measured
    * that at bench scale); above it the hint drops and Spark's default
    * sort-merge spills instead of failing. Stats are estimates — for
    * the intermediate tables these sites join, overestimates drop the
    * hint early, which degrades to the SAFE plan, never the fatal one.
    */
  def hashHinted(df: DataFrame, smallBytes: Long = 256L << 20): DataFrame =
    if (isSmall(df, smallBytes)) df.hint("shuffle_hash") else df

  /** Partition count for a hash-hinted exchange over a POST-EXPLODE
    * subtree (posting/occurrence tables). Catalyst's stats for these are
    * the parquet-compressed scan size scaled by column-width ratio — they
    * never see the explode fanout, so they under-report the unsafe-row
    * bytes ~70x (measured: the x1000 posting table reports 216 MB stats
    * for 250M rows ≈ 15 GB of hash-relation build, and the stable
    * 0.6-0.9 stat-bytes/row ratio holds from sf0.1 up — it derives from
    * compression x width ratio, both scale-invariant per table). Rather
    * than inflating the boolean gate, size the exchange so one
    * partition's build always fits: 256 KB of STATS per partition ≈
    * ~20 MB real build. Floor = the session's shuffle parallelism (the
    * plan at bench scale is byte-identical to the ungated one), cap =
    * 2048 (same rationale as j4: past that the per-node pool is the
    * constraint a bigger cluster relieves — and the 256 MB [[hashHinted]]
    * gate drops the hint before the cap can make builds grow again:
    * hinted implies statBytes/256KB <= 1024 < cap).
    */
  def postingPartitions(df: DataFrame): Int = {
    val floor = df.sparkSession.sessionState.conf.numShufflePartitions
    math.max(floor, math.min(MaxDerivedPartitions,
      statBytes(df) / PostingStatsPerPartition)).toInt
  }
}
