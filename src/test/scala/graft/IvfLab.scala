package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** r15 lab: ann_ivf's candidate re-rank. The pre-r15 shape (kept as
  * [[Similarity.ivfTopKPlan]]) materializes EVERY candidate pair of the
  * broadcast probe join, pays the half-up rounding (one BigDecimal per
  * pair) for all of them, and shuffles the full candidate set
  * (|Q| × nprobe × cell population rows) into the per-query window.
  * Candidate ([[Similarity.ivfTopK]], r15): the bruteForceTopK/lshTopK
  * kernel shape — probe map broadcast as cell → query indices, each
  * corpus partition keeps a running top-k per query (rounding only
  * candidates that can still rank), the window merges only the
  * |partitions| × |Q| × k survivors.
  *
  * Both variants share the memoized centroid set (ivfCentroids cache), so
  * the timed region isolates the re-rank path — the index build is paid
  * once in the untimed warm pass, exactly as in a TimeOne steady number.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft-x1000 sbt "Test/runMain graft.IvfLab [passes] [refineSteps]"
  */
object IvfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-x1000")
    val passes = args.headOption.map(_.toInt).getOrElse(4)
    val steps = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))

    val nlist = Similarity.suggestNlist(Tables.rowCount(spark, sfDir, "embeddings"))
    println(s"IVFLAB nlist=$nlist refineSteps=$steps sfDir=$sfDir")
    def emb = Tables.embeddings(spark, sfDir)
    def qs = emb.filter(col("vec_id") % 100 === 0)
    def vPlan(): DataFrame =
      Similarity.ivfTopKPlan(emb, qs, k = 10, nlist = nlist, refineSteps = steps)
    def vKernel(): DataFrame =
      Similarity.ivfTopK(emb, qs, k = 10, nlist = nlist, refineSteps = steps)
    val variants: Seq[(String, () => DataFrame)] =
      Seq("plan_join_window" -> (() => vPlan()), "kernel_localtopk" -> (() => vKernel()))

    // identical outputs (count + order-free row checksum over all columns)
    def sig(df: DataFrame): String =
      df.agg(count(lit(1)),
          sum(xxhash64(col("query_id"), col("neighbor_id"), col("rnk"))
            .cast("decimal(38,0)")))
        .collect()(0).toString
    val ref = sig(vPlan()); spark.catalog.clearCache()
    val got = sig(vKernel()); spark.catalog.clearCache()
    println(s"IVFCHK ${if (got == ref) s"OK $got" else s"MISMATCH $got vs $ref"}")

    // formatted plans of both spellings (the before/after evidence files)
    import org.apache.spark.sql.execution.ExplainMode
    println("IVFPLAN before >>>")
    println(vPlan().queryExecution.explainString(ExplainMode.fromString("formatted")))
    println("IVFPLAN <<<")
    println("IVFPLAN after >>>")
    println(vKernel().queryExecution.explainString(ExplainMode.fromString("formatted")))
    println("IVFPLAN <<<")

    val best = scala.collection.mutable.Map.empty[String, Double]
    for (p <- 1 to passes; (name, fn) <- (if (p % 2 == 1) variants else variants.reverse)) {
      val t0 = System.nanoTime()
      Bench.evaluate(fn())
      best(name) = math.min(best.getOrElse(name, Double.MaxValue),
        (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
    }
    variants.foreach { case (name, _) =>
      println(f"IVFLAB $name%-20s ${best(name)}%.3f s (min-of-$passes)")
    }
    spark.stop()
  }
}
