package graft.tools

import graft.{Bench, GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev lab: order-controlled A/B of `a6_sketch_agg` SMALL-path spellings
  * at sf0.1 (the governing bench's single most expensive line, 2.86 s on
  * the r11 host). Run variants in BOTH orders before believing a ratio
  * (GATES.md in-session order-bias note).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.A6Lab [variant ...]"
  */
object A6Lab {
  def variants(s: SparkSession, d: String): Map[String, () => DataFrame] = {
    def raw = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_orderkey"), col("l_extendedprice"))
    def price = Tables.lineitem(s, d).select(col("l_extendedprice"))
    Map(
      // current small path (r10 shape)
      "vA_current" -> (() => graft.SparkEntry.a6SketchAgg(s, d, smallBytes = Long.MaxValue)),
      // large path at sf0.1 for reference
      "vL_large" -> (() => graft.SparkEntry.a6SketchAgg(s, d, smallBytes = 0L)),
      // dedup-first HLLs + exact counts; price sketches in their own narrow job
      "vB_split" -> (() => {
        val parts = raw.select(col("l_partkey")).distinct()
          .agg(count(lit(1)).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
        val orders = raw.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("exact_orders"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        val med = price.repartition(s.sessionState.conf.numShufflePartitions)
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
            expr("percentile(l_extendedprice, 0.5)").as("em"))
        finish(parts.crossJoin(orders).crossJoin(med))
      }),
      // vB without the price repartition
      "vC_split_norepart" -> (() => {
        val parts = raw.select(col("l_partkey")).distinct()
          .agg(count(lit(1)).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
        val orders = raw.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("exact_orders"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        val med = price
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
            expr("percentile(l_extendedprice, 0.5)").as("em"))
        finish(parts.crossJoin(orders).crossJoin(med))
      }),
      // current small path minus the forced repartition
      "vD_norepart" -> (() => {
        val sketches = raw.agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
          expr("percentile(l_extendedprice, 0.5)").as("em"))
        val exacts = raw.agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        finish(sketches.crossJoin(exacts))
      }),
      // exact median from the sorted-price two-sided limit; sketches deduped
      "vE_sortmedian" -> (() => {
        val parts = raw.select(col("l_partkey")).distinct()
          .agg(count(lit(1)).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
        val orders = raw.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("exact_orders"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        val med = price.repartition(s.sessionState.conf.numShufflePartitions)
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
            expr("percentile(l_extendedprice, 0.5)").as("em"))
        finish(parts.crossJoin(orders).crossJoin(med))
      }),
      // r12: exact median via sort_array(collect_list) positional pick (the
      // a11 small-path lesson — Percentile's boxed value->count map dedups
      // nothing at 97% distinct prices); approx sketch unchanged
      "vF_collectmed" -> (() => {
        val parts = raw.select(col("l_partkey")).distinct()
          .agg(count(lit(1)).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
        val orders = raw.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("exact_orders"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        finish(parts.crossJoin(orders).crossJoin(collectMed(s, price)))
      }),
      // r12: ONE dedup job for both key sets (exploded (k,v) distinct),
      // HLLs over the survivors per k, 2 rows folded to 1 — halves the
      // exacts-branch scan+shuffle count; median as in vF
      "vG_fused" -> (() => {
        finish(fusedExacts(raw).crossJoin(collectMed(s, price)))
      }),
      // r12b: vG with the exacts branch repartitioned BEFORE the explode —
      // sf0.1 lineitem is few parquet files, so the explode+partial-dedup
      // otherwise runs inside a 1-3-task scan stage (Scratch: ~500 ms/task)
      "vJ_fanned" -> (() => {
        finish(fusedExacts(raw.repartition(s.sessionState.conf.numShufflePartitions))
          .crossJoin(collectMed(s, price)))
      }),
      // r12b: vG with the (k,v) dedup exchange PINNED at session width —
      // AQE coalesces the distinct's exchange to ~3 partitions at the 1m
      // advisory, serializing the post-shuffle HLL updates (Scratch:
      // 3 tasks x ~500 ms); a user repartition is not coalescible
      "vK_pinned" -> (() => {
        val exacts = raw.select(explode(array(
            struct(lit(0).as("k"), col("l_partkey").as("v")),
            struct(lit(1).as("k"), col("l_orderkey").as("v")))).as("kv"))
          .select(col("kv.k").as("k"), col("kv.v").as("v"))
          .repartition(s.sessionState.conf.numShufflePartitions,
            col("k"), col("v"))
          .distinct()
          .groupBy(col("k"))
          .agg(count(lit(1)).as("c"), approx_count_distinct(col("v"), 0.02).as("a"))
          .agg(
            max(when(col("k") === 0, col("c"))).as("exact_parts"),
            max(when(col("k") === 1, col("c"))).as("exact_orders"),
            max(when(col("k") === 0, col("a"))).as("ap"),
            max(when(col("k") === 1, col("a"))).as("ao"))
        finish(exacts.crossJoin(collectMed(s, price)))
      }),
      // r14: vG exacts folded straight to one row (no groupBy(k) level —
      // conditional sums + null-skipping HLLs over the distinct survivors)
      "vN_folded" -> (() => {
        val exacts = raw.select(explode(array(
            struct(lit(0).as("k"), col("l_partkey").as("v")),
            struct(lit(1).as("k"), col("l_orderkey").as("v")))).as("kv"))
          .select(col("kv.k").as("k"), col("kv.v").as("v"))
          .distinct()
          .agg(
            coalesce(sum(when(col("k") === 0, 1L)), lit(0L)).as("exact_parts"),
            coalesce(sum(when(col("k") === 1, 1L)), lit(0L)).as("exact_orders"),
            approx_count_distinct(when(col("k") === 0, col("v")), 0.02).as("ap"),
            approx_count_distinct(when(col("k") === 1, col("v")), 0.02).as("ao"))
        finish(exacts.crossJoin(collectMed(s, price)))
      }),
      // r14: vN with the dedup exchange pinned at session width (the vK
      // move) — isolates whether AQE's coalesce serializes the
      // post-distinct HLL/sum updates in the folded shape
      "vO_folded_pinned" -> (() => {
        val exacts = raw.select(explode(array(
            struct(lit(0).as("k"), col("l_partkey").as("v")),
            struct(lit(1).as("k"), col("l_orderkey").as("v")))).as("kv"))
          .select(col("kv.k").as("k"), col("kv.v").as("v"))
          .repartition(s.sessionState.conf.numShufflePartitions,
            col("k"), col("v"))
          .distinct()
          .agg(
            coalesce(sum(when(col("k") === 0, 1L)), lit(0L)).as("exact_parts"),
            coalesce(sum(when(col("k") === 1, 1L)), lit(0L)).as("exact_orders"),
            approx_count_distinct(when(col("k") === 0, col("v")), 0.02).as("ap"),
            approx_count_distinct(when(col("k") === 1, col("v")), 0.02).as("ao"))
        finish(exacts.crossJoin(collectMed(s, price)))
      }),
      // r14b: ONE plan, no crossJoins — a third exploded slice carries the
      // price, the codegen'd groupBy(k, v) counts it, and the single
      // global aggregate folds everything: conditional counts,
      // null-skipping HLLs, the exact median as percentile's FREQUENCY
      // form, and the approx median from the weighted GK sketch
      // (graft_wpercentile_approx) riding the SAME value-count rows.
      // 3 stages end-to-end vs the adopted shape's 6.
      "vP_trislice" -> (() => {
        val folded = raw.select(explode(array(
            struct(lit(0).as("k"), col("l_partkey").cast("double").as("v")),
            struct(lit(1).as("k"), col("l_orderkey").cast("double").as("v")),
            struct(lit(2).as("k"), col("l_extendedprice").as("v")))).as("kv"))
          .select(col("kv.k").as("k"), col("kv.v").as("v"))
          .groupBy(col("k"), col("v")).agg(count(lit(1)).as("__cnt"))
          .agg(
            coalesce(sum(when(col("k") === 0, 1L)), lit(0L)).as("exact_parts"),
            coalesce(sum(when(col("k") === 1, 1L)), lit(0L)).as("exact_orders"),
            approx_count_distinct(when(col("k") === 0, col("v")), 0.02).as("ap"),
            approx_count_distinct(when(col("k") === 1, col("v")), 0.02).as("ao"),
            expr("percentile(CASE WHEN k = 2 THEN v END, 0.5, __cnt)").as("em"),
            graft.functions.SketchFunctions.wpercentile_approx(
              when(col("k") === 2, col("v")), col("__cnt"), 0.5, 1000).as("am"))
        finish(folded)
      }),
      // r14b: vN exacts unchanged; the price branch reduces through a
      // codegen'd value-count pre-aggregate that feeds BOTH medians (exact
      // via percentile's frequency form, approx via the weighted sketch) —
      // isolates the weighted-sketch median from the tri-slice fusion
      "vQ_vcmed" -> (() => {
        val exacts = raw.select(explode(array(
            struct(lit(0).as("k"), col("l_partkey").as("v")),
            struct(lit(1).as("k"), col("l_orderkey").as("v")))).as("kv"))
          .select(col("kv.k").as("k"), col("kv.v").as("v"))
          .distinct()
          .agg(
            coalesce(sum(when(col("k") === 0, 1L)), lit(0L)).as("exact_parts"),
            coalesce(sum(when(col("k") === 1, 1L)), lit(0L)).as("exact_orders"),
            approx_count_distinct(when(col("k") === 0, col("v")), 0.02).as("ap"),
            approx_count_distinct(when(col("k") === 1, col("v")), 0.02).as("ao"))
        val med = price.groupBy(col("l_extendedprice")).agg(count(lit(1)).as("__cnt"))
          .agg(expr("percentile(l_extendedprice, 0.5, __cnt)").as("em"),
            graft.functions.SketchFunctions.wpercentile_approx(
              col("l_extendedprice"), col("__cnt"), 0.5, 1000).as("am"))
        finish(exacts.crossJoin(med))
      }),
      // r14b: the LARGE path with its separate raw-row percentile_approx
      // pass fused away — the value-count pre-aggregate that already
      // feeds the exact median (vc-freq form) now ALSO feeds the approx
      // median through the weighted GK sketch, so no aggregate pays an
      // interpreted update per raw row (x1000: the sketch sees ~133k
      // (value, cnt) rows instead of 600M prices). Exacts unchanged.
      "vM_large_wq" -> (() => {
        val med = raw.groupBy(col("l_extendedprice"))
          .agg(count(lit(1)).as("__cnt"))
          .agg(expr("percentile(l_extendedprice, 0.5, __cnt)").as("em"),
            graft.functions.SketchFunctions.wpercentile_approx(
              col("l_extendedprice"), col("__cnt"), 0.5, 1000).as("am"))
        val exacts = raw.select(col("l_partkey")).repartition(col("l_partkey"))
          .distinct()
          .agg(count(lit(1)).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
          .crossJoin(raw.select(col("l_orderkey")).distinct()
            .agg(count(lit(1)).as("exact_orders"),
              approx_count_distinct(col("l_orderkey"), 0.02).as("ao")))
        finish(med.crossJoin(exacts))
      }),
      // r12: vG exacts with the r10-shape median (isolates the two changes)
      "vH_fused_oldmed" -> (() => {
        val med = price.repartition(s.sessionState.conf.numShufflePartitions)
          .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
            expr("percentile(l_extendedprice, 0.5)").as("em"))
        finish(fusedExacts(raw).crossJoin(med))
      }))
  }

  private def collectMed(s: SparkSession, price: DataFrame): DataFrame = {
    val pos = lit(0.5) * (size(col("__v")) - 1).cast("double")
    val lo = floor(pos).cast("int")
    val loV = element_at(col("__v"), lo + 1)
    val hiV = element_at(col("__v"), ceil(pos).cast("int") + 1)
    price.repartition(s.sessionState.conf.numShufflePartitions)
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
        sort_array(collect_list(col("l_extendedprice"))).as("__v"))
      .select(col("am"), (loV + (hiV - loV) * (pos - lo.cast("double"))).as("em"))
  }

  private def fusedExacts(raw: DataFrame): DataFrame =
    raw.select(explode(array(
        struct(lit(0).as("k"), col("l_partkey").as("v")),
        struct(lit(1).as("k"), col("l_orderkey").as("v")))).as("kv"))
      .select(col("kv.k").as("k"), col("kv.v").as("v"))
      .distinct()
      .groupBy(col("k"))
      .agg(count(lit(1)).as("c"), approx_count_distinct(col("v"), 0.02).as("a"))
      .agg(
        max(when(col("k") === 0, col("c"))).as("exact_parts"),
        max(when(col("k") === 1, col("c"))).as("exact_orders"),
        max(when(col("k") === 0, col("a"))).as("ap"),
        max(when(col("k") === 1, col("a"))).as("ao"))

  private def finish(joined: DataFrame): DataFrame =
    joined.select(
      col("exact_parts"), col("exact_orders"),
      (floor(col("em") * 100 + 0.5) / 100).as("exact_median_price"),
      (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.06)
        .as("parts_within_3rsd"),
      (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.06)
        .as("orders_within_3rsd"),
      (abs(col("am") - col("em")) <= col("em") * 0.01)
        .as("median_within_1pct"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val vs = variants(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else vs.keys.toSeq.sorted
    // warm the scan + JIT once with the first variant
    Bench.evaluate(vs(names.head)())
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(vs(n)())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"A6LAB $n%-22s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
