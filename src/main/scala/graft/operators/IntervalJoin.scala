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

  /** Exact floor-division of an integer column by positive `w`, valid over
    * the FULL Long domain: integer `DIV` truncates toward zero, so the
    * quotient is lowered by one when the remainder is negative. (The
    * earlier `floor(x / w)` double formulation silently lost exactness
    * past 2^53 — the same precision cliff Packing avoids with DIV.)
    */
  private def floorDiv(x: String, w: Long): org.apache.spark.sql.Column =
    expr(s"(($x) DIV ${w}L) - (CASE WHEN ($x) % ${w}L < 0 THEN 1 ELSE 0 END)")

  /** Inner point-in-interval join: every column of `points` plus every
    * column of `intervals`, one output row per (point, containing
    * interval). `pointCol`, `startCol` (inclusive) and `endCol` (exclusive)
    * must be INTEGER-valued (epoch seconds/millis — the last-overlapped
    * bucket is `floorDiv(end - 1, W)`, which assumes a unit-granular
    * domain). Column names must be disjoint across the two inputs (the
    * output carries both sides unqualified), and neither side may already
    * contain the injected bucket column `__graft_pb`.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "pointInInterval: bucketWidth must be positive")
    val p = points.withColumn("__graft_pb", floorDiv(pointCol, bucketWidth))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__graft_pb", explode(sequence(
        floorDiv(startCol, bucketWidth),
        floorDiv(s"$endCol - 1", bucketWidth))))
    p.join(iv, Seq("__graft_pb"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_pb")
  }

  /** Interval-overlap join (half-open: overlap ⟺ `ls < re && rs < le`),
    * same bin-bucketing rewrite. Both sides replicate to their overlapped
    * buckets, so an overlapping pair can share SEVERAL buckets; the pair
    * is kept only in the FIRST bucket both occupy — `max(floor(ls / W),
    * floor(rs / W))` — which restores exactly-once output without any
    * dedup shuffle (the filter is a per-row predicate on values already in
    * hand). Column names must be disjoint across the two inputs, and
    * neither side may already contain the injected bucket column
    * `__graft_b`.
    */
  def intervalOverlap(left: DataFrame, ls: String, le: String,
                      right: DataFrame, rs: String, re: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "intervalOverlap: bucketWidth must be positive")
    def bucketed(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__graft_b", explode(sequence(
        floorDiv(s, bucketWidth),
        floorDiv(s"$e - 1", bucketWidth))))
    bucketed(left, ls, le).join(bucketed(right, rs, re), Seq("__graft_b"))
      .filter(col(ls) < col(re) && col(rs) < col(le))
      .filter(col("__graft_b") === greatest(
        floorDiv(ls, bucketWidth), floorDiv(rs, bucketWidth)))
      .drop("__graft_b")
  }
}
