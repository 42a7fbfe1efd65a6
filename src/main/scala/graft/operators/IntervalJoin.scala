package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan.
  *
  * `points ⋈ intervals ON start <= p < end` has no equi-key, so Spark's
  * planner can only produce BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) work however selective the predicate, and a broadcast of
  * whichever side is "small". The classic scale-out rewrite is bin
  * bucketing:
  *
  *  - pick a bucket width W (time units of the domain);
  *  - each point lands in exactly ONE bucket, `floor(p / W)`;
  *  - each interval is replicated to EVERY bucket it overlaps,
  *    `floor(start / W) .. floor((end - 1) / W)` (end exclusive);
  *  - equi-join on the bucket id, then re-check the exact range predicate.
  *
  * Each qualifying (point, interval) pair meets exactly once — in the
  * point's bucket — so no post-join dedup is needed. Cost:
  * |points| + Σ interval spans/W replicated rows through one hash shuffle,
  * and the join fans out per bucket instead of per relation. W trades
  * replication (long intervals → many buckets) against bucket population;
  * set it near the median interval length.
  *
  * Intervals with `end <= start` are empty by the half-open semantics and
  * are dropped before replication (the `sequence()` would otherwise run
  * backwards and fabricate buckets).
  */
object IntervalJoin {

  /** Inner point-in-interval join: every column of `points` plus every
    * column of `intervals`, one output row per (point, containing
    * interval). `pointCol`, `startCol` (inclusive) and `endCol` (exclusive)
    * must be INTEGER-valued (epoch seconds/millis — the last-overlapped
    * bucket is `floor((end - 1) / W)`, which assumes a unit-granular
    * domain; magnitudes must stay under 2^53 for the floor-division).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "pointInInterval: bucketWidth must be positive")
    val p = points.withColumn("_pb",
      expr(s"CAST(floor($pointCol / ${bucketWidth}D) AS BIGINT)"))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_pb", explode(sequence(
        expr(s"CAST(floor($startCol / ${bucketWidth}D) AS BIGINT)"),
        expr(s"CAST(floor(($endCol - 1) / ${bucketWidth}D) AS BIGINT)"))))
    p.join(iv, Seq("_pb"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_pb")
  }

  /** Interval-overlap join (half-open: overlap ⟺ `ls < re && rs < le`),
    * same bin-bucketing rewrite. Both sides replicate to their overlapped
    * buckets, so an overlapping pair can share SEVERAL buckets; the pair
    * is kept only in the FIRST bucket both occupy — `max(floor(ls / W),
    * floor(rs / W))` — which restores exactly-once output without any
    * dedup shuffle (the filter is a per-row predicate on values already in
    * hand). Column names must be disjoint across the two inputs.
    */
  def intervalOverlap(left: DataFrame, ls: String, le: String,
                      right: DataFrame, rs: String, re: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "intervalOverlap: bucketWidth must be positive")
    def bucketed(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("_b", explode(sequence(
        expr(s"CAST(floor($s / ${bucketWidth}D) AS BIGINT)"),
        expr(s"CAST(floor(($e - 1) / ${bucketWidth}D) AS BIGINT)"))))
    bucketed(left, ls, le).join(bucketed(right, rs, re), Seq("_b"))
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("_b") === greatest(
        expr(s"CAST(floor($ls / ${bucketWidth}D) AS BIGINT)"),
        expr(s"CAST(floor($rs / ${bucketWidth}D) AS BIGINT)")))
      .drop("_b")
  }
}
