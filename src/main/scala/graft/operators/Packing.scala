package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Pack `docs` (must have unique, non-null numeric `idCol`; `tokenCol`
    * long, non-null) into sequences of `capacity` tokens. Returns one row
    * per document: (idCol, tokenCol, start_offset, seq_id, seq_offset).
    * Null ids or token counts violate the contract and fail fast with a
    * named error (a null would otherwise poison the bucket totals into a
    * bare NPE / silently skip rows in the cumsum). `docs` must not already
    * contain the injected working columns `__graft_b` / `__graft_cum` /
    * `__graft_off`.
    *
    * `buckets` caps the driver-side offset state (one long per bucket).
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    capacity: Long, buckets: Int = 1024,
                    smallBytes: Long = 256L << 20): DataFrame = {
    require(capacity > 0, "packSequences: capacity must be positive")
    val spark = docs.sparkSession
    // size-adaptive (same gate as Sampling.stratified): when Catalyst
    // stats bound the NARROW (id, count) projection under `smallBytes`,
    // the exact cumsum is one in-plan global window — zero driver
    // actions, one exchange — instead of the two-phase path's id-range
    // probe action. The single sort task moves < smallBytes by
    // construction; the null contract is enforced in-plan (raise_error)
    // on both paths (r13). Unknown stats (negative) or big inputs take
    // the two-phase path.
    val proj = docs.select(col(idCol), col(tokenCol).cast(LongType).as(tokenCol))
    if (AdaptiveGate.isSmall(proj, smallBytes)) {
      val guarded = proj.withColumn(tokenCol,
        when(col(idCol).isNull || col(tokenCol).isNull, raise_error(lit(
          s"packSequences: null '$idCol' or '$tokenCol' — both must be " +
            "non-null (unique id, token count) for an exact global prefix sum")))
          .otherwise(col(tokenCol)))
      val w = Window.orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return guarded
        .withColumn("start_offset", sum(col(tokenCol)).over(w) - col(tokenCol))
        .select(col(idCol), col(tokenCol), col("start_offset"),
          expr(s"start_offset DIV ${capacity}L").as("seq_id"),
          pmod(col("start_offset"), lit(capacity)).as("seq_offset"))
    }
    // id range → monotone bucket width (ceil so the max id still lands in
    // the last bucket). Empty input short-circuits: no range to bucket.
    // r13: the range probe scans the ID COLUMN ONLY — null ids are counted
    // on the same narrow action (min/max skip nulls), while the tokenCol
    // contract moved IN-PLAN (raise_error at the action, like the small
    // path), so this probe never evaluates the token expression — for the
    // common docs.select(id, tokenCount(text)) input that means the probe
    // reads ids, not the corpus text.
    val r = docs.agg(min(col(idCol)).cast(LongType).as("lo"),
      max(col(idCol)).cast(LongType).as("hi"),
      count(when(col(idCol).isNull, 1)).as("bad")).collect()(0)
    require(r.getLong(2) == 0L,
      s"packSequences: ${r.getLong(2)} row(s) with null '$idCol' — " +
        "both id and token count must be non-null (unique id, token count) " +
        "for an exact global prefix sum")
    if (r.isNullAt(0))
      return docs.select(col(idCol), col(tokenCol).cast(LongType).as(tokenCol),
        lit(0L).as("start_offset"), lit(0L).as("seq_id"), lit(0L).as("seq_offset"))
        .limit(0) // same LongType tokenCol as the non-empty path's schema
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1)
    // integer DIV, not `/`: Spark's `/` on longs is double division, which
    // silently loses exactness past 2^53 — ids and token offsets are longs
    val bucket = expr(s"(CAST($idCol AS BIGINT) - ${lo}L) DIV ${width}L")
    val guardedTok = when(col(tokenCol).isNull, raise_error(lit(
        s"packSequences: null '$tokenCol' — both id and token count must be " +
          "non-null (unique id, token count) for an exact global prefix sum")))
      .otherwise(col(tokenCol).cast(LongType))

    val base = docs.select(col(idCol), guardedTok.as(tokenCol))
      .withColumn("__graft_b", bucket)
    val wIn = Window.partitionBy(col("__graft_b")).orderBy(col(idCol))

    // r13: bucket offsets IN-PLAN (the tokenBudgetHead redesign) — a
    // map-side-combining totals aggregate (tiny partial-row exchange)
    // plus a ≤`buckets`-row running-sum window replace the r12 driver
    // collect, so constructing the plan runs ZERO jobs and the null
    // contract is uniformly lazy. The stats pass stays a second scan of
    // the input — structural for an exact two-phase prefix sum.
    val wOff = Window.orderBy(col("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__graft_b"))
      .agg(sum(col(tokenCol)).as("__graft_bt"))
      .select(col("__graft_b"),
        coalesce(sum(col("__graft_bt")).over(wOff), lit(0L)).as("__graft_off"))

    base.repartition(col("__graft_b"))
      .withColumn("__graft_cum", sum(col(tokenCol)).over(wIn))
      .join(broadcast(offsets), Seq("__graft_b"))
      .withColumn("start_offset", col("__graft_off") + col("__graft_cum") - col(tokenCol))
      .select(col(idCol), col(tokenCol),
        col("start_offset"),
        expr(s"start_offset DIV ${capacity}L").as("seq_id"),
        pmod(col("start_offset"), lit(capacity)).as("seq_offset"))
  }

  /** MATERIALIZE packed training sequences: where [[packSequences]] only
    * assigns offsets, this emits the sequences themselves — one row per
    * `seq_id` with the concatenated token-id slice of every document (or
    * document part) that lands in it, in global id order. Every sequence
    * holds exactly `capacity` ids except the final tail; documents
    * straddling a cut are split across the adjacent sequences, exactly
    * like the GPT-style token stream they model. Output:
    * (seq_id, ids, n_docs, n_tokens) — n_docs counts the doc PARTS in the
    * sequence.
    *
    * Scale shape: the offset assignment runs on the NARROW (id, count)
    * projection through the two-phase scan above — the heavy id arrays
    * never enter the prefix sum. The arrays then move twice, and only
    * twice: the assignment join (keyed on the unique id) and the final
    * regroup on seq_id — the materialization shuffle any training-shard
    * writer pays. Per-row state is bounded by the PARAMETER everywhere: a
    * sequence row holds ≤ `capacity` ids and ≤ `capacity` collected parts,
    * so no key can go quadratic regardless of the corpus.
    */
  def packMaterialize(docs: DataFrame, idCol: String, idsCol: String,
                      capacity: Long, buckets: Int = 1024,
                      tokenCol: Option[String] = None): DataFrame = {
    require(capacity > 0, "packMaterialize: capacity must be positive")
    // Null-safe size: legacy (non-ANSI) Spark evaluates size(null) = -1,
    // which would sail through packSequences' null-contract check and
    // silently shift every later offset — mapping null ids to null n
    // fails fast with the contract error in BOTH modes.
    def sizeOf: Column =
      when(col(idsCol).isNotNull, size(col(idsCol)).cast(LongType))
    // The assignment path only needs SIZES. When the ids column is an
    // expensive expression (e.g. vocab_encode over text), a caller-supplied
    // count column keeps the assignment branches (bucket cumsum + totals)
    // AND the payload-side filter/bounds from evaluating the encoder: it
    // then runs exactly once, in the final slice projection (whose size
    // check shares the one evaluation via codegen subexpression
    // elimination). The tokenCol == size(ids) contract is asserted there,
    // row by row — a lying count fails the stage, never corrupts slices.
    def nExpr: Column = tokenCol.map(col(_).cast(LongType)).getOrElse(sizeOf)
    val assign = packSequences(
      docs.select(col(idCol), nExpr.as("__graft_n")),
      idCol, "__graft_n", capacity, buckets)
      .select(col(idCol), col("start_offset"))
    val sliced = slice(col(idsCol), col("__graft_ls").cast("int"),
      (col("__graft_le") - col("__graft_ls") + 1L).cast("int"))
    val partExpr = tokenCol match {
      case Some(n) => when(size(col(idsCol)).cast(LongType) === col("__graft_nn"),
          sliced)
        .otherwise(raise_error(lit(
          s"packMaterialize: '$n' must equal size('$idsCol') row by row")))
      case None => sliced
    }
    val parts = docs.select(col(idCol), col(idsCol), nExpr.as("__graft_nn"))
      .filter(col("__graft_nn") > 0)
      .join(assign, Seq(idCol))
      .withColumn("__graft_end",
        col("start_offset") + col("__graft_nn")) // exclusive
      .withColumn("seq_id", explode(sequence(
        expr(s"start_offset DIV ${capacity}L"),
        expr(s"(__graft_end - 1) DIV ${capacity}L"))))
      // this doc's ids that fall inside [seq_id*cap, (seq_id+1)*cap), as
      // 1-based local slice bounds (start/length for Spark's slice)
      .withColumn("__graft_ls",
        greatest(col("seq_id") * capacity - col("start_offset"), lit(0L)) + 1L)
      .withColumn("__graft_le",
        least((col("seq_id") + 1L) * capacity, col("__graft_end")) - col("start_offset"))
      .select(col("seq_id"), col("start_offset"), partExpr.as("__graft_part"))
    parts.groupBy(col("seq_id"))
      .agg(sort_array(collect_list(struct(col("start_offset"), col("__graft_part"))))
        .as("__graft_ps"))
      .select(col("seq_id"),
        flatten(transform(col("__graft_ps"), p => p.getField("__graft_part"))).as("ids"),
        size(col("__graft_ps")).cast(LongType).as("n_docs"))
      .withColumn("n_tokens", size(col("ids")).cast(LongType))
  }
}
