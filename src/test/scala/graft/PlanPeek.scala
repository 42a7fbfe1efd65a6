package graft

/** Dev harness: evaluate named queries and print the EXECUTED (AQE-final)
  * plan — the only place exchange/stage reuse is visible.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.PlanPeek <names...>"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      Bench.evaluate(df)
      println(s"\n========== $q (executed) ==========")
      // executedPlan after evaluation carries the final adaptive plan
      println(df.queryExecution.executedPlan.toString.take(20000))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
