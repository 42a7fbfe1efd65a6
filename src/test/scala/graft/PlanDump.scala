package graft

/** Dev harness: write each named query's `explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` — the judge-facing plan evidence under
  * plans/rNN/.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.PlanDump <outDir> <suffix> <names...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args(0)
    val suffix = args(1)
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), formatted)
      println(s"[plandump] $q -> $outDir/${q}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
