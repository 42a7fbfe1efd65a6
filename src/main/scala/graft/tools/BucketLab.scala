package graft.tools

import graft.{Bench, GraftSession, SparkEntry}

/** Dev lab: `layout_bucketed_join` floor decomposition at sf0.1 — does the
  * per-query Sort (Spark distrusts bucket sortedness unless the legacy
  * 1-file-per-bucket ordering conf is on) or the catalog re-resolution
  * dominate the 0.80 s paired line?
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BucketLab"
  */
object BucketLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(_
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.locality.wait", "0ms"))
    def time(label: String): Unit = {
      Bench.evaluate(SparkEntry.queries("layout_bucketed_join")(spark, sfDir))
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.evaluate(SparkEntry.queries("layout_bucketed_join")(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BUCKETLAB $label%-16s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("sorted_off")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    time("sorted_on")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    time("sorted_off2")
    if (sys.env.getOrElse("SPARK_GRAFT_EXPLAIN", "0") == "1") {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      SparkEntry.queries("layout_bucketed_join")(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
