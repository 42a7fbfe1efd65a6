package graft

/** Throwaway dev main: dump the executed plan of the named queries.
  * Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
