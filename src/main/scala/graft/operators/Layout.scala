package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional data skipping — the
  * Z-ORDER op of lakehouse table formats (Delta `OPTIMIZE ZORDER BY`,
  * Iceberg's sort-order rewrite): interleave the bits of several columns
  * into one sort key so that sorting by the key co-locates rows that are
  * close in EVERY dimension, and per-file min/max stats then prune
  * multi-predicate scans that a lexicographic sort could only prune on
  * its leading column.
  *
  * The key is composed from built-in bit ops (`shiftright`/`&`/`|`) —
  * `bits` terms, all inside whole-stage codegen, no UDF and no custom
  * expression needed — and the clustering itself is Spark's own
  * `repartitionByRange` (range exchange with sampled bounds) plus an
  * intra-partition sort: exactly the two physical pieces a distributed
  * Z-ORDER rewrite needs, both scale-proven.
  */
object Layout {

  /** The interleaved key of two non-negative dimensions: bit i of `x`
    * lands at even position 2i, bit i of `y` at odd position 2i+1. Both
    * inputs must already lie in [0, 2^bits) — clip with `pmod`/`least`
    * at the call site (a silent internal mask would make two far-apart
    * values collide without the caller ever deciding that).
    */
  def zorderKey2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zorderKey2: bits must be in [1, 31]")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x, i) bitwiseAND lit(1L), 2 * i)
      val yb = shiftleft(shiftright(y, i) bitwiseAND lit(1L), 2 * i + 1)
      xb bitwiseOR yb
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `numPartitions` z-clustered partitions: range
    * partition on the interleaved key (sampled bounds, so partitions are
    * balanced even on skewed dimensions), then sort each partition by it.
    * Writing the result gives files whose per-file min/max envelopes are
    * tight in BOTH dimensions — the property data-skipping stats need.
    */
  def clusterByZorder(df: DataFrame, x: Column, y: Column, bits: Int,
                      numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "clusterByZorder: numPartitions must be positive")
    val keyed = df.withColumn("__graft_z", zorderKey2(x, y, bits))
    keyed.repartitionByRange(numPartitions, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }
}
