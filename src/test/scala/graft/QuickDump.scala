package graft

/** Dev harness: dump ONLY the named queries to `outDir/<name>.parquet`
  * (same layout as [[Verify]]) so a subset can be oracle-checked at a
  * non-gate scale without paying the full 125-query dump.
  *
  *   sbt "Test/runMain graft.QuickDump <sfDir> <outDir> <query...>"
  */
object QuickDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = GraftSession.create(identity)
    for (name <- args.drop(2)) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[quickdump] $name written")
    }
    spark.stop()
  }
}
