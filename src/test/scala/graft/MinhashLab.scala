package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AdaptiveGate, Dedup}

/** r15 lab: dedup_minhash_lsh's candidate pipeline plans the FULL
  * signature+banding subtree THREE times (PlanPeek: the small array_pairs
  * branch plus BOTH sides of the hinted mid-bucket self-join — three
  * independent `Exchange hashpartitioning(band, bh)`, zero ReusedExchange),
  * so every evaluation pays the minhash_sig_array scan three times. Same
  * disease pairStats had; which restructuring collapses it here?
  *
  * Variants produce the IDENTICAL candidate set (checked by count +
  * pair-hash sum before timing):
  *   v0 shipped      small ∪ SHUFFLE_HASH-hinted self-join
  *   v1 nohint       v0 without the hints (does reuse alone fix it?)
  *   v2 bigexplode   mid buckets via explode(ids)×2 instead of the
  *                   self-join — pairs stream through two Generates, no
  *                   join, no second/third banding subtree
  *   v3 onepath      ALL buckets via explode(ids)×2 — no union at all,
  *                   one banding subtree, at the cost of generating m² rows
  *                   filtered to m(m-1)/2 (array_pairs emits pairs
  *                   directly)
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.MinhashLab [passes]"
  */
object MinhashLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    val numPerm = 16
    val bands = 4
    val maxBucket = Dedup.DefaultMaxBucket
    val gatherLimit = 2048L

    def arr: DataFrame = Dedup.docShingleHashes(
        Tables.documents(spark, sfDir), k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def buckets(a: DataFrame): DataFrame =
      Dedup.lshBands(Dedup.minhashSignatures(a, numPerm), numPerm, bands)
        .groupBy(col("band"), col("bh"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)

    def smallPath(b: DataFrame): DataFrame =
      b.filter(size(col("ids")) <= gatherLimit)
        .select(explode(graft.functions.TextFunctions.array_pairs(col("ids"))).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))

    // explode twice: first Generate streams one row per id (still carrying
    // ids), second streams the m² combinations, filtered to a < b — never
    // materializes more than one ids array per task
    def doubleExplode(b: DataFrame): DataFrame =
      b.select(col("ids"), explode(col("ids")).as("doc_a"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))

    def v0(a: DataFrame): DataFrame = {
      val b = buckets(a)
      val big = b.filter(size(col("ids")) > gatherLimit)
        .select(col("band"), col("bh"), explode(col("ids")).as("id"))
      val bigPairs = AdaptiveGate.hashHinted(big.as("a"))
        .join(AdaptiveGate.hashHinted(big.as("b")),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      smallPath(b).unionByName(bigPairs).distinct()
    }

    def v1(a: DataFrame): DataFrame = {
      val b = buckets(a)
      val big = b.filter(size(col("ids")) > gatherLimit)
        .select(col("band"), col("bh"), explode(col("ids")).as("id"))
      val bigPairs = big.as("a").join(big.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      smallPath(b).unionByName(bigPairs).distinct()
    }

    def v2(a: DataFrame): DataFrame = {
      val b = buckets(a)
      smallPath(b)
        .unionByName(doubleExplode(b.filter(size(col("ids")) > gatherLimit)))
        .distinct()
    }

    def v3(a: DataFrame): DataFrame =
      doubleExplode(buckets(a)).distinct()

    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "v0_shipped" -> v0, "v1_nohint" -> v1,
      "v2_bigexplode" -> v2, "v3_onepath" -> v3)

    // plan census: sig-subtree evaluations + reuse markers in the FINAL plan
    for ((name, fn) <- variants) {
      val df = fn(arr)
      Bench.evaluate(df)
      val s = df.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==") match {
        case -1 => s
        case i => s.substring(0, i)
      }
      val sig = "minhash_sig_array".r.findAllIn(cut).size
      val ex = "Exchange hashpartitioning\\(band".r.findAllIn(cut).size
      val reused = "ReusedExchange".r.findAllIn(cut).size
      println(s"MHPLAN $name sig_evals=$sig band_exchanges=$ex reused=$reused")
      spark.catalog.clearCache()
    }
    // identical candidate sets (count + order-free pair checksum)
    def sig(df: DataFrame): String =
      df.agg(count(lit(1)),
          sum(xxhash64(col("doc_a"), col("doc_b")).cast("decimal(38,0)")))
        .collect()(0).toString
    val ref = sig(v0(arr)); spark.catalog.clearCache()
    for ((name, fn) <- variants.drop(1)) {
      val got = sig(fn(arr))
      println(s"MHCHK $name ${if (got == ref) "OK" else s"MISMATCH $got vs $ref"}")
      spark.catalog.clearCache()
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (p <- 1 to passes; (name, fn) <- (if (p % 2 == 1) variants else variants.reverse)) {
      val t0 = System.nanoTime()
      Bench.evaluate(fn(arr))
      best(name) = math.min(best.getOrElse(name, Double.MaxValue),
        (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
    }
    variants.foreach { case (name, _) =>
      println(f"MHLAB $name%-14s ${best(name)}%.3f s (min-of-$passes)")
    }
    spark.stop()
  }
}
