package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Training-sequence packing: concatenate documents in a fixed global
  * order and cut every `capacity` tokens — the standard GPT-style
  * pre-training layout (documents may straddle a cut; each document
  * records the sequence where it STARTS and its offset inside it).
  *
  * The core primitive is an exact GLOBAL prefix sum of token counts in
  * `id` order, which a naive window (`ORDER BY id` with no partition)
  * computes through ONE task's sort — the classic scale cliff. Here it is
  * the textbook two-phase scan instead:
  *
  *   1. bucket documents by a MONOTONE function of the id (order-aligned
  *      range buckets), so bucket i's ids all precede bucket i+1's;
  *   2. cumulative-sum WITHIN each bucket (parallel windows, one hash
  *      exchange on the bucket key);
  *   3. per-bucket totals (a map-side-combining aggregate — its own pass;
  *      a two-phase scan is inherently two passes) are prefix-summed on
  *      the driver (bounded state, same contract as the IVF centroid
  *      collect) and broadcast back as per-bucket offsets.
  *
  * global_cumsum = bucket_offset + local_cumsum, exactly.
  *
  * Bucket boundaries derive from the observed id range (one min/max/count
  * aggregate), assuming ids spread roughly uniformly across their range —
  * true for ingestion-assigned ids. A pathologically clustered id space
  * degrades parallelism (one bucket holds everything), not correctness.
  */
object Packing {

  /** Pack `docs` (must have unique, non-null numeric `idCol`; `tokenCol` long) into
    * sequences of `capacity` tokens. Returns one row per document:
    * (idCol, tokenCol, start_offset, seq_id, seq_offset).
    *
    * `buckets` caps the driver-side offset state (one long per bucket).
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    capacity: Long, buckets: Int = 1024): DataFrame = {
    require(capacity > 0, "packSequences: capacity must be positive")
    val spark = docs.sparkSession
    // id range → monotone bucket width (ceil so the max id still lands in
    // the last bucket). Empty input short-circuits: no range to bucket.
    val r = docs.agg(min(col(idCol)).cast(LongType).as("lo"),
      max(col(idCol)).cast(LongType).as("hi")).collect()(0)
    if (r.isNullAt(0))
      return docs.select(col(idCol), col(tokenCol).cast(LongType).as(tokenCol),
        lit(0L).as("start_offset"), lit(0L).as("seq_id"), lit(0L).as("seq_offset"))
        .limit(0) // same LongType tokenCol as the non-empty path's schema
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1)
    // integer DIV, not `/`: Spark's `/` on longs is double division, which
    // silently loses exactness past 2^53 — ids and token offsets are longs
    val bucket = expr(s"(CAST($idCol AS BIGINT) - ${lo}L) DIV ${width}L")

    val keyed = docs.select(col(idCol), col(tokenCol).cast(LongType).as(tokenCol))
      .withColumn("_b", bucket)
      .repartition(col("_b"))
    val wIn = Window.partitionBy(col("_b")).orderBy(col(idCol))
    val local = keyed.withColumn("_cum", sum(col(tokenCol)).over(wIn))

    // per-bucket totals: its own (map-side-combining) pass — a two-phase
    // scan is inherently two passes over the input; what stays bounded is
    // the DRIVER state, ≤ `buckets` longs, prefix-summed into "tokens
    // before this bucket"
    val totals = keyed.groupBy(col("_b")).agg(sum(col(tokenCol)).as("_t"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsetRows = totals.map { case (bId, t) =>
      val row = org.apache.spark.sql.Row(bId, acc); acc += t; row
    }
    val offsets = spark.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(StructField("_b", LongType), StructField("_off", LongType))))

    local.join(broadcast(offsets), Seq("_b"))
      .withColumn("start_offset", col("_off") + col("_cum") - col(tokenCol))
      .select(col(idCol), col(tokenCol),
        col("start_offset"),
        expr(s"start_offset DIV ${capacity}L").as("seq_id"),
        pmod(col("start_offset"), lit(capacity)).as("seq_offset"))
  }
}
