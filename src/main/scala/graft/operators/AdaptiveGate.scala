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
  def isSmall(df: DataFrame, smallBytes: Long): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes < smallBytes

  /** The optimized plan's stats estimate, clamped into Long range — for
    * gates that need the magnitude (e.g. deriving a partition count),
    * not just the boolean.
    */
  def statBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong
}
