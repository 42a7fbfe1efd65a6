package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AdaptiveGate, Dedup}

/** r15 lab: why does the pairStats posting exchange execute FOUR times
  * (PlanPeek: side a, side b, and each side's df-cut subtree — no
  * ReusedExchange anywhere), and which restructuring collapses it?
  *
  * Variants build the same pair-stats result; after evaluation the lab
  * prints the EXECUTED plan's posting-exchange count (Exchange nodes
  * hashing an h31 attr) + ReusedExchange/stage-reuse count, then times
  * each variant min-of-N interleaved.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.PairLab [passes]"
  */
object PairLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val cap = 1000000L

    def arrCached: DataFrame = Dedup.docShingleHashes(
        Tables.documents(spark, sfDir), k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def arrPlain: DataFrame =
      Dedup.docShingleHashes(Tables.documents(spark, sfDir), k = 5)

    // shipped shape (inlined from Dedup.pairStatsFromArr)
    def shipped(arr: DataFrame): DataFrame = {
      val postingRaw = arr.select(col("doc_id"), size(col("hs")).as("__n"),
        explode(col("hs")).as("h31"))
      val posting = postingRaw
        .repartition(AdaptiveGate.postingPartitions(postingRaw), col("h31"))
      val hot = posting.groupBy(col("h31")).agg(count(lit(1)).as("__hn"))
        .filter(col("__hn") > cap)
        .select(col("h31"))
      val pruned = AdaptiveGate.hashHinted(posting)
        .join(AdaptiveGate.hashHinted(hot), Seq("h31"), "left_anti")
      AdaptiveGate.hashHinted(pruned.as("a")).join(AdaptiveGate.hashHinted(pruned.as("b")),
          col("a.h31") === col("b.h31") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("__inter"),
          first(col("a.__n")).as("__na"), first(col("b.__n")).as("__nb"))
    }

    // hot derived WITHOUT column pruning divergence: the df-cut aggregate
    // carries dummy max() of the join columns so its exchange child stays
    // byte-identical to the join sides' — one candidate reuse unlock
    def blockedPruning(arr: DataFrame): DataFrame = {
      val postingRaw = arr.select(col("doc_id"), size(col("hs")).as("__n"),
        explode(col("hs")).as("h31"))
      val posting = postingRaw
        .repartition(AdaptiveGate.postingPartitions(postingRaw), col("h31"))
      val hot = posting.groupBy(col("h31"))
        .agg(count(lit(1)).as("__hn"),
          max(col("doc_id")).as("__d"), max(col("__n")).as("__m"))
        .filter(col("__hn") > cap)
        .select(col("h31"))
      val pruned = AdaptiveGate.hashHinted(posting)
        .join(AdaptiveGate.hashHinted(hot), Seq("h31"), "left_anti")
      AdaptiveGate.hashHinted(pruned.as("a")).join(AdaptiveGate.hashHinted(pruned.as("b")),
          col("a.h31") === col("b.h31") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("__inter"),
          first(col("a.__n")).as("__na"), first(col("b.__n")).as("__nb"))
    }

    // single-exchange gather shape: one posting exchange, pairs exploded
    // from per-key sorted lists (df-cut = size filter on the gathered
    // list, identical semantics: over-cap keys contribute no pairs)
    def gather(arr: DataFrame): DataFrame = {
      val postingRaw = arr.select(col("doc_id"), size(col("hs")).as("__n"),
        explode(col("hs")).as("h31"))
      val posting = postingRaw
        .repartition(AdaptiveGate.postingPartitions(postingRaw), col("h31"))
      val lists = posting.groupBy(col("h31"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("__n")))).as("l"))
        .filter(size(col("l")) > 1 && size(col("l")) <= cap)
      lists
        .select(explode(expr(
          """flatten(transform(l, (x, i) ->
             transform(slice(l, i + 2, size(l) - i - 1), y ->
               struct(x.doc_id as da, x.__n as na, y.doc_id as db, y.__n as nb))))"""))
          .as("p"))
        .groupBy(col("p.da").as("doc_a"), col("p.db").as("doc_b"))
        .agg(count(lit(1)).as("__inter"),
          first(col("p.na")).as("__na"), first(col("p.nb")).as("__nb"))
    }

    // df-cut via a count window over the SAME posting exchange (window
    // needs hashpartitioning(h31) — already satisfied, so the anti-join
    // and its second full posting exchange vanish; WindowExec's sorter
    // spills, so the per-task bound is unchanged). Self-join still reads
    // the subtree twice: 2 posting exchanges instead of 4.
    def windowed(arr: DataFrame, hinted: Boolean): DataFrame = {
      val postingRaw = arr.select(col("doc_id"), size(col("hs")).as("__n"),
        explode(col("hs")).as("h31"))
      val posting = postingRaw
        .repartition(AdaptiveGate.postingPartitions(postingRaw), col("h31"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h31"))
      val pruned = posting
        .withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= cap)
        .drop("__df")
      def h(df: DataFrame) = if (hinted) AdaptiveGate.hashHinted(df) else df
      h(pruned.as("a")).join(h(pruned.as("b")),
          col("a.h31") === col("b.h31") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("__inter"),
          first(col("a.__n")).as("__na"), first(col("b.__n")).as("__nb"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "v0_shipped_cache" -> (() => shipped(arrCached)),
      "v1_shipped_plain" -> (() => shipped(arrPlain)),
      "v2_blocked_cache" -> (() => blockedPruning(arrCached)),
      "v3_gather_cache" -> (() => gather(arrCached)),
      "v4_window_hint" -> (() => windowed(arrCached, hinted = true)),
      "v5_window_nohint" -> (() => windowed(arrCached, hinted = false)))

    if (sys.env.get("PAIR_DEBUG").contains("1")) {
      // replicate the spec fixture's session shape to debug pin failures
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      val df = Dedup.jaccardPairs(Tables.documents(spark, sfDir), k = 5,
        threshold = 0.5)
      df.collect()
      println("DEBUG executed plan:\n" + df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
    // plan census: evaluate once, count posting exchanges actually planned
    for ((name, fn) <- variants) {
      val df = fn()
      Bench.evaluate(df)
      val s = df.queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning\\(h31".r.findAllIn(s).size
      val reused = "ReusedExchange|ReusedQueryStage|reuses".r.findAllIn(s).size
      println(s"PAIRPLAN $name posting_exchanges=$ex reuse_markers=$reused")
      spark.catalog.clearCache()
    }
    // sanity: identical results across variants (count + sum of inters)
    val ref = shipped(arrCached).agg(count(lit(1)), sum(col("__inter")))
      .collect()(0).toString
    spark.catalog.clearCache()
    for ((name, fn) <- variants.drop(1)) {
      val got = fn().agg(count(lit(1)), sum(col("__inter"))).collect()(0).toString
      println(s"PAIRCHK $name ${if (got == ref) "OK" else s"MISMATCH $got vs $ref"}")
      spark.catalog.clearCache()
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (p <- 1 to passes; (name, fn) <- (if (p % 2 == 1) variants else variants.reverse)) {
      val t0 = System.nanoTime()
      Bench.evaluate(fn())
      best(name) = math.min(best.getOrElse(name, Double.MaxValue),
        (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
    }
    variants.foreach { case (name, _) =>
      println(f"PAIRLAB $name%-18s ${best(name)}%.3f s (min-of-$passes)")
    }
    spark.stop()
  }
}
