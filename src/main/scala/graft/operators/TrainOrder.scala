package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic training-order materialization ("epoch shuffle").
  *
  * Pre-training consumes the corpus in a pseudo-random order that must be
  * REPRODUCIBLE — the same (corpus, seed, epoch) must yield the same order
  * on every run, engine, retry and cluster size, or checkpoint resumption
  * and data-order ablations are impossible. An RNG-based `orderBy(rand())`
  * breaks that contract under task retry; the standard fix (same family as
  * [[Sampling]]) is a content-derived sort key: the 32-bit md5 prefix of
  * `"<seed>_<doc id>"`. Different seeds give independent permutations
  * (fresh order per epoch); ties (32-bit collisions) break on the id, so
  * the order is total and stable.
  *
  * Assigning the contiguous 0-based position in that order is an exact
  * global enumeration — the same scale cliff as [[Packing]]'s prefix sum
  * (a bare `row_number() OVER (ORDER BY h)` sorts the corpus through one
  * task) and the same two-phase cure, with one simplification: the sort
  * key is hash-UNIFORM on [0, 2^32) by construction, so order-aligned
  * buckets are fixed-width slices of the hash range — no min/max
  * pre-pass, no data-dependent boundaries, deterministic end to end.
  *
  *   1. bucket = hkey DIV (2^32 / buckets)  (monotone in hkey);
  *   2. rank WITHIN each bucket (parallel windows, one hash exchange);
  *   3. per-bucket counts prefix-summed on the driver (≤ `buckets` longs)
  *      and broadcast back as offsets.
  *
  * position = bucket_offset + local_rank − 1, exactly the global
  * `row_number` over (hkey, id) minus one.
  */
object TrainOrder {

  /** THE determinism contract of this family, in one place: the 32-bit
    * md5 prefix of `"<seed>_<id>"` as a long — the content-derived sort
    * key every operator here ([[epochShuffle]], [[tokenBudgetHead]],
    * [[tokenBudgetPerSource]], [[sourceInterleave]]) and every DuckDB
    * oracle re-derivation agrees on. `concat` (NOT `concat_ws`, which
    * skips nulls): a null id must propagate to a null hash so each
    * operator's contract check can see it.
    */
  private def seededHashKey(idCol: String, seed: Long) =
    conv(substring(
      md5(concat(lit(s"${seed}_"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast(LongType)

  /** Fixed-width slice of the 32-bit hash range per bucket (ceil, so the
    * max hash still lands in the last bucket) — order-aligned buckets
    * with no data-dependent boundaries.
    */
  private def bucketWidth(buckets: Int): Long =
    math.max(1L, 4294967296L / buckets + 1)

  /** Unsigned UTF-8 byte ordering — Spark's binary string sort order (and
    * DuckDB's default collation). Driver-side source indexing must use
    * THIS, not String's UTF-16 code-unit order, so both interleave paths
    * and the oracle agree beyond the ASCII range.
    */
  private[operators] val Utf8Ordering: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var r = 0
    while (r == 0 && i < x.length && i < y.length) {
      r = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (r != 0) r else java.lang.Integer.compare(x.length, y.length)
  }

  /** Every column of `docs` plus `shuffle_pos` — the document's 0-based
    * position in the seed-keyed pseudo-random order. `idCol` must be
    * unique and non-null (fails fast otherwise; a null id has no hash and
    * no deterministic place in the order). `docs` must not already contain
    * the injected working columns `__graft_hk` / `__graft_b` /
    * `__graft_rn` / `__graft_off`.
    *
    * SIZE-ADAPTIVE (the family-wide gate of [[Sampling.stratified]] /
    * [[Packing.packSequences]]): when Catalyst statistics bound the input
    * under `smallBytes`, the enumeration is the single-window definition
    * itself — one exchange, no driver offset round-trip — because the one
    * sort task moves < smallBytes by construction. The null contract is
    * enforced IN-PLAN (`raise_error` on the sort key, the
    * [[Packing.packSequences]] small-path pattern), so the small path adds
    * no eager probe job; the same named error then surfaces at the
    * caller's action rather than at construction. NOTE the exception TYPE
    * differs with the path: the two-phase path throws
    * `IllegalArgumentException` eagerly at construction, the small path a
    * `SparkRuntimeException` (from `raise_error`) lazily at the first
    * action — callers must match on the message, not the class. Unknown
    * stats or big inputs take the two-phase scan. Identical rows either
    * way; `smallBytes = 0` pins the two-phase path unconditionally
    * (strict `<` gate, [[AdaptiveGate]]; specs, plan audits).
    */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   buckets: Int = 1024,
                   smallBytes: Long = 256L << 20): DataFrame = {
    require(buckets > 0, "epochShuffle: buckets must be positive")
    val hkey = seededHashKey(idCol, seed)
    if (AdaptiveGate.isSmall(docs, smallBytes)) {
      // null contract enforced IN-PLAN on the sort key (the packSequences
      // small-path pattern): same named error, no extra eager probe job,
      // laziness preserved — it surfaces at the caller's action
      val guarded = when(col(idCol).isNull, raise_error(lit(
          s"epochShuffle: null '$idCol' row(s) — the id must be a unique " +
            "non-null key for a deterministic order")))
        .otherwise(hkey)
      return docs.withColumn("shuffle_pos",
        (row_number().over(Window.orderBy(guarded, col(idCol))) - 1).cast(LongType))
    }
    val width = bucketWidth(buckets)
    val keyed = docs
      .withColumn("__graft_hk", hkey)
      .withColumn("__graft_b", expr(s"__graft_hk DIV ${width}L"))
      .repartition(col("__graft_b"))
    val wIn = Window.partitionBy(col("__graft_b"))
      .orderBy(col("__graft_hk"), col(idCol))
    val local = keyed.withColumn("__graft_rn", row_number().over(wIn))

    // per-bucket counts: map-side-combining aggregate, ≤ `buckets` rows of
    // driver state. A null id surfaces here as a null bucket — fail fast
    // with the contract violation instead of a bare NPE.
    val totals = keyed.groupBy(col("__graft_b")).agg(count(lit(1)).as("__graft_n"))
      .collect()
    require(totals.forall(!_.isNullAt(0)),
      s"epochShuffle: null '$idCol' row(s) — the id must be a unique non-null " +
        "key for a deterministic order")
    val sorted = totals.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsetRows = sorted.map { case (b, n) =>
      val row = org.apache.spark.sql.Row(b, acc); acc += n; row
    }
    val offsets = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(StructField("__graft_b", LongType), StructField("__graft_off", LongType))))

    local.join(broadcast(offsets), Seq("__graft_b"))
      .withColumn("shuffle_pos", col("__graft_off") + col("__graft_rn") - 1)
      .drop("__graft_hk", "__graft_b", "__graft_rn", "__graft_off")
  }

  /** Deterministic shard materialization: every doc's target shard in a
    * `numShards`-way split, assigned round-robin along the
    * [[epochShuffle]] order — so shards have exactly-equal sizes (±1) AND
    * each is an unbiased slice of the shuffled order (a contiguous split
    * would correlate shard with hash range; round-robin by position does
    * not). Writing `partitionBy("shard")` materializes the layout.
    */
  def shardAssignments(docs: DataFrame, idCol: String, seed: Long,
                       numShards: Int, buckets: Int = 1024,
                       smallBytes: Long = 256L << 20): DataFrame = {
    require(numShards > 0, "shardAssignments: numShards must be positive")
    epochShuffle(docs, idCol, seed, buckets, smallBytes)
      .withColumn("shard", pmod(col("shuffle_pos"), lit(numShards.toLong)))
  }

  /** Token-budget head of the seeded shuffle: the documents a training run
    * with a fixed token budget actually consumes — every doc whose
    * cumulative token count, in [[epochShuffle]]'s (hash, id) order,
    * stays ≤ `budget` (a doc is kept iff it fits ENTIRELY within the
    * budget; the straddling doc and everything after it are cut). Returns
    * every column of `docs` plus `cum_tokens` (the running total
    * including the row itself).
    *
    * The prefix sum reuses the epoch shuffle's fixed-width hash buckets.
    * r13 REDESIGN — offsets are derived IN-PLAN, not collected: the r12
    * shape ran an EAGER driver collect of the per-bucket totals at
    * CONSTRUCTION (a full stats job before the caller ever acted — the
    * q13/IVF driver-side-construction lesson) to find the live-bucket
    * boundary. Now the totals are a map-side-combining aggregate (tiny
    * partial-row exchange), the offsets a ≤`buckets`-row running-sum
    * window, and the live set an inner BROADCAST join that drops dead
    * buckets (offset already > budget: cum ≥ offset > budget for every
    * row in them) in the scan stage, BEFORE the corpus exchange — the
    * same 99%-never-shuffles prune as before, now lazy, zero driver
    * actions. The stats pass remains a second scan of the wide input —
    * structural for an exact two-phase prefix sum without materializing
    * an intermediate (both engines pay it; the audit pins one corpus
    * exchange and the broadcast prune). `tokenCol` must be non-null and
    * `idCol` unique non-null — enforced IN-PLAN on both paths
    * (`raise_error`, surfacing at the first ACTION; match on the
    * message, not the exception class); `docs` must not already contain
    * the injected `__graft_*` working columns.
    */
  def tokenBudgetHead(docs: DataFrame, idCol: String, tokenCol: String,
                      seed: Long, budget: Long, buckets: Int = 1024,
                      smallBytes: Long = 256L << 20): DataFrame = {
    require(buckets > 0, "tokenBudgetHead: buckets must be positive")
    require(budget >= 0, "tokenBudgetHead: budget must be non-negative")
    val hkey = seededHashKey(idCol, seed)
    // null contract in-plan on the summed value (see epochShuffle)
    val guardedTok = when(col(idCol).isNull || col(tokenCol).isNull,
        raise_error(lit(
          s"tokenBudgetHead: null '$idCol' or '$tokenCol' row(s) — both must " +
            "be non-null (unique id, token count) for an exact budgeted prefix sum")))
      .otherwise(col(tokenCol).cast(LongType))
    // size-adaptive: the single running-sum window IS the definition (see
    // epochShuffle); the bucket machinery only matters when the data is
    // too big for one sort task anyway
    if (AdaptiveGate.isSmall(docs, smallBytes)) {
      val w = Window.orderBy(hkey, col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return docs.withColumn("cum_tokens", sum(guardedTok).over(w))
        .filter(col("cum_tokens") <= budget)
    }
    val width = bucketWidth(buckets)
    val base = docs
      .withColumn("__graft_t", guardedTok)
      .withColumn("__graft_hk", hkey)
      .withColumn("__graft_b", expr(s"__graft_hk DIV ${width}L"))
    // bucket offsets: map-side-combining totals aggregate (≤ buckets ×
    // tasks partial rows exchange — tiny), running-sum window over
    // ≤ `buckets` rows (single tiny task by construction), LIVE buckets
    // only. `>` not `≥` on the prune: a zero-token doc at offset ==
    // budget still qualifies.
    val wOff = Window.orderBy(col("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__graft_b"))
      .agg(sum(col("__graft_t")).as("__graft_bt"))
      .select(col("__graft_b"),
        coalesce(sum(col("__graft_bt")).over(wOff), lit(0L)).as("__graft_off"))
      .filter(col("__graft_off") <= budget)
    val wIn = Window.partitionBy(col("__graft_b"))
      .orderBy(col("__graft_hk"), col(idCol))
    // the inner broadcast join IS the scan-stage prune: dead buckets drop
    // BEFORE the corpus exchange, so for a tight budget over a 100 TB
    // corpus the bulk of the data never shuffles or sorts
    base.join(broadcast(offsets), Seq("__graft_b"))
      .repartition(col("__graft_b"))
      .withColumn("cum_tokens",
        col("__graft_off") + sum(col("__graft_t")).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .drop("__graft_hk", "__graft_b", "__graft_t", "__graft_off")
  }

  /** [[tokenBudgetHead]] with the token count given as an EXPRESSION to
    * evaluate, not a pre-materialized column — so the expensive per-row
    * kernel (a tokenizer over the full text) runs on the second pass only
    * AFTER the live-bucket broadcast prune. With a pre-computed column the
    * caller's projection sits under the prune join and Catalyst evaluates
    * the kernel for EVERY row on both passes (projections don't migrate
    * above joins); at x1000 that second full-corpus tokenCount was half of
    * `order_token_budget`'s 6.06 s — its "parquet-dictionary" annotation
    * was falsified (the scaled text is 99.8% distinct), leaving the
    * structural two-pass kernel as the real cost, and only the stats pass
    * is structural. For a tight budget over a 100 TB corpus this is the
    * difference between one tokenizer scan and two.
    *
    * Contract: `docs` must NOT already contain `tokenCol` (it is attached
    * as `tokenExpr`, which must be deterministic — it is evaluated
    * independently on the stats and budget passes and the two must
    * agree); output = `idCol` + `tokenCol` + `cum_tokens` ONLY — the wide
    * kernel inputs (the text) are internal and never outlive the
    * operator, so the small path's single sort task and the budget pass's
    * exchange move (id, token) rows, not payloads. Same null/uniqueness
    * contract, gate, and keep rule as [[tokenBudgetHead]] (TrainOrderSpec
    * pins the two row-identical with the budget path forced on both).
    */
  def tokenBudgetHeadExpr(docs: DataFrame, idCol: String, tokenCol: String,
                          tokenExpr: org.apache.spark.sql.Column,
                          seed: Long, budget: Long, buckets: Int = 1024,
                          smallBytes: Long = 256L << 20): DataFrame = {
    require(!docs.columns.contains(tokenCol),
      s"tokenBudgetHeadExpr: '$tokenCol' already exists in docs — pass the " +
        "pre-computed column through tokenBudgetHead instead")
    // small path: one window task IS the definition — project to
    // (id, token) FIRST so the single sort task never carries the kernel's
    // wide inputs, then the column-based window path applies as-is
    if (AdaptiveGate.isSmall(docs, smallBytes))
      return tokenBudgetHead(
        docs.select(col(idCol), tokenExpr.as(tokenCol)),
        idCol, tokenCol, seed, budget, buckets, smallBytes)
    require(buckets > 0, "tokenBudgetHeadExpr: buckets must be positive")
    require(budget >= 0, "tokenBudgetHeadExpr: budget must be non-negative")
    val hkey = seededHashKey(idCol, seed)
    def guarded(tok: org.apache.spark.sql.Column) =
      when(col(idCol).isNull || tok.isNull,
        raise_error(lit(
          s"tokenBudgetHead: null '$idCol' or '$tokenCol' row(s) — both must " +
            "be non-null (unique id, token count) for an exact budgeted prefix sum")))
        .otherwise(tok.cast(LongType))
    val width = bucketWidth(buckets)
    val keyed = docs
      .withColumn("__graft_hk", hkey)
      .withColumn("__graft_b", expr(s"__graft_hk DIV ${width}L"))
    // stats pass: the one structural full-kernel scan — per-bucket totals
    // via a map-side-combining aggregate, offsets over ≤ `buckets` rows
    val wOff = Window.orderBy(col("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed
      .withColumn("__graft_t", guarded(tokenExpr))
      .groupBy(col("__graft_b"))
      .agg(sum(col("__graft_t")).as("__graft_bt"))
      .select(col("__graft_b"),
        coalesce(sum(col("__graft_bt")).over(wOff), lit(0L)).as("__graft_off"))
      .filter(col("__graft_off") <= budget)
    // budget pass: the kernel is attached ABOVE the prune join, so dead
    // buckets (~the whole corpus under a tight budget) never tokenize
    val wIn = Window.partitionBy(col("__graft_b"))
      .orderBy(col("__graft_hk"), col(idCol))
    keyed.join(broadcast(offsets), Seq("__graft_b"))
      .repartition(col("__graft_b"))
      .withColumn(tokenCol, tokenExpr)
      .withColumn("cum_tokens",
        col("__graft_off") + sum(guarded(col(tokenCol))).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(tokenCol), col("cum_tokens"))
  }

  /** Per-SOURCE token budget — the domain-cap curation step (no single
    * domain may contribute more than `budget` tokens): within every
    * source, keep the seeded-hash-order head of documents whose running
    * total stays ≤ `budget`, exactly [[tokenBudgetHead]]'s keep rule
    * applied per source. Returns every column of `docs` plus `cum_tokens`
    * (the within-source running total including the row itself).
    *
    * Scale shape (r13 in-plan redesign — see [[tokenBudgetHead]]): the
    * within-source prefix sums run per (source, bucket) window — no
    * per-source single-task sort however skewed the domains. Per-source
    * bucket offsets are a running-sum window over the (source × bucket)
    * totals aggregate (map-side-combined, lazy — the r12 eager
    * construction collect is gone); only LIVE pairs (offset ≤ budget)
    * broadcast back, so the inner join prunes every dead bucket in the
    * scan stage, before the one corpus exchange the cumsum needs.
    * `maxGroups` bounds the offsets broadcast IN-PLAN (raise_error, at
    * the action). `idCol` unique non-null, `tokenCol` non-null,
    * `sourceCol` non-null — enforced in-plan on both paths (match on the
    * message, not the exception class); `docs` must not already contain
    * `__graft_*` columns.
    */
  def tokenBudgetPerSource(docs: DataFrame, idCol: String, tokenCol: String,
                           sourceCol: String, seed: Long, budget: Long,
                           buckets: Int = 1024,
                           maxGroups: Int = 1 << 20,
                           smallBytes: Long = 256L << 20): DataFrame = {
    require(buckets > 0, "tokenBudgetPerSource: buckets must be positive")
    require(budget >= 0, "tokenBudgetPerSource: budget must be non-negative")
    val hkey = seededHashKey(idCol, seed)
    // size-adaptive: per-source running-sum windows, one exchange on the
    // source key — the definition itself (see epochShuffle)
    if (AdaptiveGate.isSmall(docs, smallBytes)) {
      // null contract in-plan on the summed value (see epochShuffle).
      // A null source would otherwise form its own window partition and
      // silently pass — the guard covers it on the same expression
      val guardedTok = when(col(idCol).isNull || col(tokenCol).isNull ||
          col(sourceCol).isNull, raise_error(lit(
            s"tokenBudgetPerSource: null '$sourceCol', '$idCol' or '$tokenCol' " +
              "row(s) — all must be non-null for an exact per-source budget")))
        .otherwise(col(tokenCol).cast(LongType))
      val w = Window.partitionBy(col(sourceCol)).orderBy(hkey, col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return docs.withColumn("cum_tokens", sum(guardedTok).over(w))
        .filter(col("cum_tokens") <= budget)
    }
    // r13 REDESIGN (same as [[tokenBudgetHead]]): offsets IN-PLAN instead
    // of the eager construction-time stats collect. The per-source bucket
    // offsets are a running-sum window over the ≤ (source × bucket)
    // totals rows (map-side-combined — tiny exchange), partitioned by
    // source (distributed however skewed the domains); dead buckets
    // (offset > budget) are dropped by the inner BROADCAST join in the
    // scan stage, BEFORE the corpus exchange. The maxGroups guard moved
    // in-plan too: it bounds the offsets BROADCAST (the only
    // driver-adjacent state left), firing lazily at the action.
    val guardedTokL = when(col(idCol).isNull || col(tokenCol).isNull ||
        col(sourceCol).isNull, raise_error(lit(
          s"tokenBudgetPerSource: null '$sourceCol', '$idCol' or '$tokenCol' " +
            "row(s) — all must be non-null for an exact per-source budget")))
      .otherwise(col(tokenCol).cast(LongType))
    val width = bucketWidth(buckets)
    val base = docs
      .withColumn("__graft_t", guardedTokL)
      .withColumn("__graft_hk", hkey)
      .withColumn("__graft_b", expr(s"__graft_hk DIV ${width}L"))
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val offsets = base.groupBy(col(sourceCol), col("__graft_b"))
      .agg(sum(col("__graft_t")).as("__graft_bt"))
      .select(col(sourceCol), col("__graft_b"),
        coalesce(sum(col("__graft_bt")).over(wOff), lit(0L)).as("__graft_off"),
        count(lit(1)).over(wAll).as("__graft_ng"))
      .select(col(sourceCol), col("__graft_b"),
        when(col("__graft_ng") > maxGroups, raise_error(concat(
          lit("tokenBudgetPerSource: "), col("__graft_ng").cast("string"),
          lit(s" (source × bucket) groups exceed maxGroups=$maxGroups — " +
            "lower `buckets` or raise the guard"))))
          .otherwise(col("__graft_off")).as("__graft_off"))
      .filter(col("__graft_off") <= budget)
    val wIn = Window.partitionBy(col(sourceCol), col("__graft_b"))
      .orderBy(col("__graft_hk"), col(idCol))
    base.join(broadcast(offsets), Seq(sourceCol, "__graft_b")) // scan-stage prune
      .repartition(col(sourceCol), col("__graft_b"))
      .withColumn("cum_tokens",
        col("__graft_off") + sum(col("__graft_t")).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .drop("__graft_hk", "__graft_b", "__graft_t", "__graft_off")
  }

  /** Deterministic source-interleaved training order: every document gets
    * `source_rank` (its seeded within-source rank) and `interleave_pos` =
    * source_rank × #sources + source_index, so reading in `interleave_pos`
    * order cycles through sources round-robin — the domain-diversity
    * ordering a curriculum wants so no batch is a single-domain run.
    * Exact round-robin while every source still has documents; once a
    * source exhausts, its positions are simply absent (order preserved,
    * contiguity not — a training reader consumes by ORDER, not by index
    * arithmetic). Same determinism contract as [[epochShuffle]].
    *
    * Scale shape: within-source ranks come from the same fixed-width hash
    * buckets, windowed per (source, bucket) — no per-source single-task
    * sort however skewed the sources. Driver state is one (source, bucket)
    * count per occupied pair, guarded by `maxGroups`; source indexes come
    * from the same collect. Sources are ordered by UTF-8 byte order
    * ([[Utf8Ordering]] — Spark's binary string sort and DuckDB's default
    * collation), so both execution paths and the oracle agree on indexes
    * beyond ASCII.
    */
  def sourceInterleave(docs: DataFrame, idCol: String, sourceCol: String,
                       seed: Long, buckets: Int = 1024,
                       maxGroups: Int = 1 << 20,
                       smallBytes: Long = 256L << 20): DataFrame = {
    require(buckets > 0, "sourceInterleave: buckets must be positive")
    val hkey = seededHashKey(idCol, seed)
    // size-adaptive: within-source ranks from per-source windows; the
    // source index and source count come from two more in-plan windows
    // (dense_rank over the sorted source strings; a whole-frame
    // collect_set size) — zero driver round-trips (see epochShuffle)
    if (AdaptiveGate.isSmall(docs, smallBytes)) {
      // null contract in-plan on the rank sort key (see epochShuffle)
      val guarded = when(col(idCol).isNull || col(sourceCol).isNull,
          raise_error(lit(
            s"sourceInterleave: null '$sourceCol' or '$idCol' row(s) — both " +
              "must be non-null for a deterministic order")))
        .otherwise(hkey)
      val srcStr = col(sourceCol).cast("string")
      val wSrc = Window.partitionBy(col(sourceCol)).orderBy(guarded, col(idCol))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      return docs
        .withColumn("source_rank", (row_number().over(wSrc) - 1).cast(LongType))
        .withColumn("__graft_sx",
          (dense_rank().over(Window.orderBy(srcStr)) - 1).cast(LongType))
        .withColumn("__graft_ns", size(collect_set(srcStr).over(wAll)).cast(LongType))
        .withColumn("interleave_pos",
          col("source_rank") * col("__graft_ns") + col("__graft_sx"))
        .drop("__graft_sx", "__graft_ns")
    }
    val width = bucketWidth(buckets)
    val keyed = docs
      .withColumn("__graft_hk", hkey)
      .withColumn("__graft_b", expr(s"__graft_hk DIV ${width}L"))
      .repartition(col(sourceCol), col("__graft_b"))
    val wIn = Window.partitionBy(col(sourceCol), col("__graft_b"))
      .orderBy(col("__graft_hk"), col(idCol))
    val local = keyed.withColumn("__graft_rn", row_number().over(wIn))

    val totals = keyed.groupBy(col(sourceCol).cast("string").as("__graft_s"),
        col("__graft_b"))
      .agg(count(lit(1)).as("__graft_n")).collect()
    require(totals.length <= maxGroups,
      s"sourceInterleave: ${totals.length} (source × bucket) groups exceed " +
        s"maxGroups=$maxGroups — lower `buckets` or raise the guard")
    require(totals.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"sourceInterleave: null '$sourceCol' or '$idCol' row(s) — both must " +
        "be non-null for a deterministic order")
    // UTF-8 BYTE order, not Scala's UTF-16 code-unit String order: the
    // small path derives the index from a Spark string sort (binary UTF-8)
    // and the DuckDB oracle sorts by bytes too — for supplementary-plane
    // source names the two orders differ (surrogates sort low in UTF-16,
    // high in UTF-8), and the index must not depend on which path ran
    val srcs = totals.map(_.getString(0)).distinct.sorted(Utf8Ordering)
    val sIdx = srcs.zipWithIndex.toMap
    val nS = srcs.length.toLong
    val offsetRows = totals.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (s, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, b, n) =>
          val row = org.apache.spark.sql.Row(s, b, acc, sIdx(s).toLong)
          acc += n; row
        }
      }
    val offsets = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(StructField("__graft_s", org.apache.spark.sql.types.StringType),
        StructField("__graft_b", LongType), StructField("__graft_off", LongType),
        StructField("__graft_sx", LongType))))

    local
      .join(broadcast(offsets),
        col(sourceCol).cast("string") === col("__graft_s") &&
          local("__graft_b") === offsets("__graft_b"))
      .withColumn("source_rank", col("__graft_off") + col("__graft_rn") - 1)
      .withColumn("interleave_pos", col("source_rank") * nS + col("__graft_sx"))
      .drop("__graft_hk", "__graft_b", "__graft_rn", "__graft_off",
        "__graft_s", "__graft_sx")
  }

  /** Curriculum training order (Bengio et al. 2009): a global 0-based
    * `curriculum_pos` that stages documents by an ASCENDING integer
    * difficulty bin (shorter-first, quality-first — the caller derives the
    * bin) while shuffling deterministically WITHIN each bin with the same
    * seed-keyed hash as [[epochShuffle]] — so stage boundaries are exact
    * and intra-stage order carries no ingestion bias. `binCol` must be
    * integer-valued, non-null, and small-cardinality (stages, not row
    * keys); `idCol` unique and non-null. The stage key is the bin CAST to
    * long — one cast owns ranks, totals and offsets alike, so a
    * fractional-valued bin truncates CONSISTENTLY instead of ranking by
    * the raw value while joining offsets by the truncation.
    *
    * Scale shape: the [[epochShuffle]] two-phase scan with the bin
    * prepended to the bucket key — parallel per-(bin, bucket) windows, one
    * hash exchange, driver state ≤ bins × `buckets` longs (guarded by
    * `maxGroups`), never a single-task global sort.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, binCol: String,
                      seed: Long, buckets: Int = 1024,
                      maxGroups: Int = 1 << 20,
                      smallBytes: Long = 256L << 20): DataFrame = {
    require(buckets > 0, "curriculumOrder: buckets must be positive")
    val hkey = seededHashKey(idCol, seed)
    // size-adaptive: the single window over (bin, hash, id) is the staged
    // definition itself; the long cast stays the one owner of the stage
    // key (see epochShuffle for the gate)
    if (AdaptiveGate.isSmall(docs, smallBytes)) {
      // null contract in-plan on the stage sort key (see epochShuffle);
      // the cast-to-long stays the one owner of the stage key
      val guardedBin = when(col(idCol).isNull || col(binCol).isNull,
          raise_error(lit(
            s"curriculumOrder: null '$binCol' or '$idCol' row(s) — both must " +
              "be non-null for a deterministic order")))
        .otherwise(col(binCol).cast(LongType))
      return docs.withColumn("curriculum_pos",
        (row_number().over(Window.orderBy(guardedBin,
          hkey, col(idCol))) - 1).cast(LongType))
    }
    val width = bucketWidth(buckets)
    // ONE owner of the stage key: ranks, totals and the offset join all
    // use the same cast-to-long bin — partitioning the rank window by the
    // RAW bin while keying offsets on the cast would silently collide
    // positions for a fractional-valued binCol (2.2 and 2.7 rank apart
    // but share offset row 2)
    val keyed = docs
      .withColumn("__graft_bin", col(binCol).cast(LongType))
      .withColumn("__graft_hk", hkey)
      .withColumn("__graft_b", expr(s"__graft_hk DIV ${width}L"))
      .repartition(col("__graft_bin"), col("__graft_b"))
    val wIn = Window.partitionBy(col("__graft_bin"), col("__graft_b"))
      .orderBy(col("__graft_hk"), col(idCol))
    val local = keyed.withColumn("__graft_rn", row_number().over(wIn))

    val totals = keyed
      .groupBy(col("__graft_bin"), col("__graft_b"))
      .agg(count(lit(1)).as("__graft_n")).collect()
    require(totals.length <= maxGroups,
      s"curriculumOrder: ${totals.length} (bin × bucket) groups exceed " +
        s"maxGroups=$maxGroups — lower `buckets` or raise the guard")
    require(totals.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"curriculumOrder: null '$binCol' or '$idCol' row(s) — both must be " +
        "non-null for a deterministic order")
    var acc = 0L
    val offsetRows = totals.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
      .map { case (bin, b, n) =>
        val row = org.apache.spark.sql.Row(bin, b, acc); acc += n; row
      }
    val offsets = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(StructField("__graft_bin", LongType),
        StructField("__graft_b", LongType), StructField("__graft_off", LongType))))

    local
      .join(broadcast(offsets), Seq("__graft_bin", "__graft_b"))
      .withColumn("curriculum_pos", col("__graft_off") + col("__graft_rn") - 1)
      .drop("__graft_hk", "__graft_b", "__graft_rn", "__graft_off", "__graft_bin")
  }
}
